"""Export a RANDOM-INIT gpt-oss checkpoint in HF format (safetensors).

The golden criterion (scripts/golden_gpt_oss.py, mirroring the reference's
/root/reference/tests/test_gpt_oss_model.py) needs a real HF checkpoint on
disk: `transformers` eager is the oracle and our `hf_loader` is under test.
This environment has no network egress, so the released openai/gpt-oss-20b
weights cannot be downloaded — this script writes a random-init checkpoint
at the SAME geometry instead, so the entire protocol (HF-format load →
transformers eager on CPU → kernel vs full-causal ablation) runs end to end
as a dress rehearsal. Drop in the real weights and the same command line
produces the real numbers.

Weights are bf16, layer-sharded (one safetensors file per layer + one for
embed/head, with a standard model.safetensors.index.json), so peak memory
during export is one layer (~1.6 GB), not the full ~42 GB model.

Init: N(0, 0.02) matmul weights, zero biases, unit layernorms, N(0, 1)
attention sinks (s_aux must carry real mass for the ablation gap to be
meaningful), N(0, 0.02) router.

Usage:
  python scripts/export_random_hf_checkpoint.py --out /tmp/gpt-oss-20b-rand
  python scripts/export_random_hf_checkpoint.py --out /tmp/tiny --tiny
"""

import argparse
import json
import os

import ml_dtypes
import numpy as np
from safetensors.numpy import save_file

GEOMETRIES = {
    # the real gpt-oss-20b geometry (reference README.md:90-104 model)
    "20b": dict(vocab_size=201088, hidden_size=2880, num_hidden_layers=24,
                num_attention_heads=64, num_key_value_heads=8, head_dim=64,
                intermediate_size=2880, num_local_experts=32,
                num_experts_per_tok=4, sliding_window=128),
    # tiny variant for the protocol test (tests/test_golden_gpt_oss.py)
    "tiny": dict(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                 num_attention_heads=4, num_key_value_heads=2, head_dim=16,
                 intermediate_size=32, num_local_experts=4,
                 num_experts_per_tok=2, sliding_window=16),
}


def hf_config(g: dict) -> dict:
    n = g["num_hidden_layers"]
    return {
        "architectures": ["GptOssForCausalLM"],
        "model_type": "gpt_oss",
        "attention_bias": True,
        "attention_dropout": 0.0,
        "eos_token_id": 200002,
        "pad_token_id": 199999,
        "hidden_act": "silu",
        "initializer_range": 0.02,
        "layer_types": ["sliding_attention" if i % 2 == 0
                        else "full_attention" for i in range(n)],
        "max_position_embeddings": 131072,
        "rms_norm_eps": 1e-5,
        "rope_theta": 150000.0,
        "rope_scaling": {
            "rope_type": "yarn", "factor": 32.0,
            "beta_fast": 32.0, "beta_slow": 1.0, "truncate": False,
            "original_max_position_embeddings": 4096,
        },
        "tie_word_embeddings": False,
        "torch_dtype": "bfloat16",
        "transformers_version": "4.55.0",
        "router_aux_loss_coef": 0.9,
        "output_router_logits": False,
        "swiglu_limit": 7.0,
        **g,
    }


def export(out_dir: str, g: dict, seed: int = 0):
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    H, D = g["hidden_size"], g["head_dim"]
    HQ, HKV = g["num_attention_heads"], g["num_key_value_heads"]
    I, E = g["intermediate_size"], g["num_local_experts"]
    V, L = g["vocab_size"], g["num_hidden_layers"]

    def w(*shape, scale=0.02):
        return (rng.standard_normal(shape, np.float32) * scale).astype(
            ml_dtypes.bfloat16)

    def zeros(*shape):
        return np.zeros(shape, ml_dtypes.bfloat16)

    def ones(*shape):
        return np.ones(shape, ml_dtypes.bfloat16)

    index = {"metadata": {"total_size": 0}, "weight_map": {}}

    def shard(fname: str, tensors: dict):
        save_file(tensors, os.path.join(out_dir, fname))
        for name, t in tensors.items():
            index["weight_map"][name] = fname
            index["metadata"]["total_size"] += t.nbytes

    for i in range(L):
        pre = f"model.layers.{i}."
        tensors = {
            # HF Linear stores [out, in]
            pre + "self_attn.q_proj.weight": w(HQ * D, H),
            pre + "self_attn.q_proj.bias": zeros(HQ * D),
            pre + "self_attn.k_proj.weight": w(HKV * D, H),
            pre + "self_attn.k_proj.bias": zeros(HKV * D),
            pre + "self_attn.v_proj.weight": w(HKV * D, H),
            pre + "self_attn.v_proj.bias": zeros(HKV * D),
            pre + "self_attn.o_proj.weight": w(H, HQ * D),
            pre + "self_attn.o_proj.bias": zeros(H),
            pre + "self_attn.sinks": w(HQ, scale=1.0),
            pre + "mlp.router.weight": w(E, H),
            pre + "mlp.router.bias": zeros(E),
            # dequantized-dense expert format: [E, in, out]
            pre + "mlp.experts.gate_up_proj": w(E, H, 2 * I),
            pre + "mlp.experts.gate_up_proj_bias": zeros(E, 2 * I),
            pre + "mlp.experts.down_proj": w(E, I, H),
            pre + "mlp.experts.down_proj_bias": zeros(E, H),
            pre + "input_layernorm.weight": ones(H),
            pre + "post_attention_layernorm.weight": ones(H),
        }
        shard(f"model-layer-{i:05d}.safetensors", tensors)
        print(f"[export] layer {i + 1}/{L}", flush=True)

    shard("model-embed.safetensors", {
        "model.embed_tokens.weight": w(V, H),
        "model.norm.weight": ones(H),
        "lm_head.weight": w(V, H),
    })

    with open(os.path.join(out_dir, "model.safetensors.index.json"),
              "w") as f:
        json.dump(index, f)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_config(g), f, indent=2)
    gb = index["metadata"]["total_size"] / 1e9
    print(f"[export] wrote {out_dir} ({gb:.1f} GB, {L} layers)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--layers", type=int, default=None,
                    help="override layer count (geometry otherwise real)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    g = dict(GEOMETRIES["tiny" if args.tiny else "20b"])
    if args.layers:
        g["num_hidden_layers"] = args.layers
    export(args.out, g, seed=args.seed)


if __name__ == "__main__":
    main()
