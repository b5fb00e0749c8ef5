"""Load HF GptOss checkpoints into the functional parameter pytree.

Maps ``GptOssForCausalLM`` parameter names (see
transformers/models/gpt_oss/modeling_gpt_oss.py) to our pytree layout.
Works from an in-memory state dict (tests use a randomly-initialized HF
model) or a local checkpoint directory of safetensors shards.

Handles both storage formats of the MoE expert weights:

* dequantized in-memory names (``mlp.experts.gate_up_proj`` as a dense
  ``[E, in, out]`` tensor — what a transformers model object holds after
  ``from_pretrained`` with dequantization), and
* the released **MXFP4** checkpoint format
  (``mlp.experts.gate_up_proj_blocks`` uint8 ``[E, out, in/32, 16]`` —
  two OCP e2m1 fp4 values per byte, low nibble first — plus
  ``..._scales`` uint8 ``[E, out, in/32]`` e8m0 block exponents biased
  by 127; the on-disk layout of openai/gpt-oss-20b/120b, decoded the
  same way as transformers.integrations.mxfp4.convert_moe_packed_tensors
  — verified bit-exact in tests/test_hf_mxfp4.py).

For checkpoints larger than device memory, ``quant='int8'`` / ``'int4'``
converts each weight into the serving quantized forms (models.quant)
tensor-by-tensor, never materializing the full dense model (~42 GB bf16
for gpt-oss-20b vs ~16 GB on one v5e).

Reference parity: /root/reference/tests/test_gpt_oss_model.py:16-164
loads the real gpt-oss-20b for its golden logits test; this module is
what makes the same checkpoint loadable here.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from .config import ModelConfig

__all__ = ["params_from_hf_state_dict", "load_hf_checkpoint",
           "dequantize_mxfp4"]

# OCP MX e2m1 code points (sign x {0, 0.5, 1, 1.5, 2, 3, 4, 6}); nibble
# value indexes this table, codes 8..15 are the negative mirror.
_FP4_VALUES = np.array(
    [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
     -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0], dtype=np.float32)


def dequantize_mxfp4(blocks: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Decode MXFP4 blocks/scales to fp32.

    ``blocks``: uint8 ``[..., G, 16]`` — each byte packs two e2m1 values,
    low nibble first, so one 16-byte block holds 32 consecutive values.
    ``scales``: uint8 ``[..., G]`` — e8m0 exponent, bias 127 (the shared
    power-of-two scale of each 32-value block).
    Returns fp32 ``[..., G*32]``. Exact (every representable value is a
    small integer multiple of a power of two).
    """
    blocks = np.asarray(blocks)
    scales = np.asarray(scales)
    assert blocks.dtype == np.uint8 and blocks.shape[-1] == 16, blocks.shape
    assert scales.shape == blocks.shape[:-1], (scales.shape, blocks.shape)
    lo = _FP4_VALUES[blocks & 0x0F]
    hi = _FP4_VALUES[blocks >> 4]
    # byte j of a block yields values (2j, 2j+1) = (lo_j, hi_j)
    vals = np.stack([lo, hi], axis=-1).reshape(*blocks.shape[:-1], 32)
    exp = (scales.astype(np.int32) - 127)[..., None]
    return np.ldexp(vals, exp).reshape(*blocks.shape[:-2], -1)


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor
        t = t.detach()
        if t.dtype.__str__() == "torch.bfloat16":
            t = t.float()
        return t.cpu().numpy()
    return np.asarray(t)


def params_from_hf_state_dict(sd: Dict[str, Any], cfg: ModelConfig,
                              dtype: Any = jnp.float32,
                              quant: Optional[str] = None) -> dict:
    """Convert a GptOssForCausalLM state dict to our parameter pytree.

    CONSUMES ``sd`` (entries are popped as they convert): the state-dict
    copy must free while the param pytree builds, or an fp32 20B load
    peaks at stored + converted (~126 GB) and trips the host OOM killer.
    Pass a throwaway dict (``dict(sd)`` is a cheap shallow copy, but note
    a caller-held original still pins the arrays).

    ``quant``: None (dense, in ``dtype``), ``'int8'`` (all big weights
    int8 per-channel, models.quant form), or ``'int4'`` (attention + MoE
    experts packed-int4; embedding/lm_head stay int8 — the int4 unpack is
    VPU-bound and the lm_head is the hottest decode matmul). With quant
    set, ``dtype`` becomes the scale/compute dtype.
    """
    assert quant in (None, "int8", "int4"), quant
    if quant is not None:
        from .quant import quantize_weight, quantize_weight_int4

    def _maybe_q(x_np: np.ndarray, contract_axis: int, allow_int4: bool):
        x = jnp.asarray(x_np, dtype if quant is None else jnp.float32)
        if quant is None:
            return x
        if quant == "int4" and allow_int4:
            return quantize_weight_int4(x, contract_axis=contract_axis,
                                        scale_dtype=dtype)
        return quantize_weight(x, contract_axis=contract_axis,
                               scale_dtype=dtype)

    def take(name):
        # Destructive read: each tensor is consumed exactly once, so the
        # state-dict copy frees as the param pytree builds. Matters at
        # fp32 x 20B: keeping sd (42 GB stored) alive under the growing
        # 84 GB params peaked past the 125 GB host and tripped the OOM
        # killer. The tied-embedding tensor is the one legal double read.
        if name == "model.embed_tokens.weight":
            return sd[name]
        return sd.pop(name)

    def get(name, transpose=False):
        x = _np(take(name)).astype(np.float32)
        if transpose:
            x = x.T
        return jnp.asarray(x, dtype)

    def get_big(name, transpose=False, contract_axis=-2, allow_int4=True):
        """A large matmul weight: quantized on the fly when requested."""
        x = _np(take(name)).astype(np.float32)
        if transpose:
            x = x.T
        return _maybe_q(x, contract_axis, allow_int4)

    def get_experts(name):
        """Stacked expert weights [E, in, out]: dense or MXFP4 on disk."""
        if name + "_blocks" in sd:
            w = dequantize_mxfp4(_np(take(name + "_blocks")),
                                 _np(take(name + "_scales")))  # [E, out, in]
            w = np.swapaxes(w, 1, 2)                         # [E, in, out]
        else:
            w = _np(take(name)).astype(np.float32)
        return _maybe_q(w, contract_axis=-2, allow_int4=True)

    def zeros(shape):
        return jnp.zeros(shape, dtype)

    o_bias = cfg.o_bias
    layers = []
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        attn = {
            # HF Linear stores [out, in]; we store [in, out]
            "wq": get_big(pre + "self_attn.q_proj.weight", transpose=True),
            "wk": get_big(pre + "self_attn.k_proj.weight", transpose=True),
            "wv": get_big(pre + "self_attn.v_proj.weight", transpose=True),
            "wo": get_big(pre + "self_attn.o_proj.weight", transpose=True),
        }
        if cfg.attention_bias:
            attn["bq"] = get(pre + "self_attn.q_proj.bias")
            attn["bk"] = get(pre + "self_attn.k_proj.bias")
            attn["bv"] = get(pre + "self_attn.v_proj.bias")
        else:
            attn["bq"] = zeros((cfg.num_heads * cfg.head_dim,))
            attn["bk"] = zeros((cfg.num_kv_heads * cfg.head_dim,))
            attn["bv"] = zeros((cfg.num_kv_heads * cfg.head_dim,))
        attn["bo"] = (get(pre + "self_attn.o_proj.bias") if o_bias
                      else zeros((cfg.hidden_size,)))
        if cfg.use_s_aux:
            attn["sinks"] = get(pre + "self_attn.sinks")
        if cfg.mlp_type == "dense":
            # Qwen2/Llama gated-SiLU MLP (no biases)
            mlp = {
                "gate": get_big(pre + "mlp.gate_proj.weight", transpose=True),
                "up": get_big(pre + "mlp.up_proj.weight", transpose=True),
                "down": get_big(pre + "mlp.down_proj.weight", transpose=True),
            }
        else:
            mlp = {
                "router_w": get(pre + "mlp.router.weight", transpose=True),
                "router_b": get(pre + "mlp.router.bias"),
                # HF experts store [E, in, out] dense / [E, out, ...] MXFP4
                "gate_up": get_experts(pre + "mlp.experts.gate_up_proj"),
                "gate_up_b": get(pre + "mlp.experts.gate_up_proj_bias"),
                "down": get_experts(pre + "mlp.experts.down_proj"),
                "down_b": get(pre + "mlp.experts.down_proj_bias"),
            }
        layers.append({
            "attn": attn,
            "mlp": mlp,
            "ln1": get(pre + "input_layernorm.weight"),
            "ln2": get(pre + "post_attention_layernorm.weight"),
        })

    lm_head_name = ("lm_head.weight" if "lm_head.weight" in sd
                    else "model.embed_tokens.weight")  # tied embeddings
    return {
        # the embedding is gathered, never contracted: per-row int8 scales,
        # and int4's packed-contraction layout does not apply (keep int8)
        "embed": get_big("model.embed_tokens.weight", contract_axis=-1,
                         allow_int4=False),
        "layers": layers,
        "final_norm": get("model.norm.weight"),
        "lm_head": get_big(lm_head_name, transpose=True, allow_int4=False),
    }


def load_hf_checkpoint(path: str, dtype: Any = jnp.bfloat16,
                       quant: Optional[str] = None):
    """Load (cfg, params) from a local HF checkpoint directory.

    Reads config.json + *.safetensors shards (including the released
    MXFP4-quantized gpt-oss checkpoints). No network access. With
    ``quant='int8'``/``'int4'`` each weight is converted to the serving
    quantized form as it streams in, so peak memory stays near the
    quantized total plus one tensor.
    """
    with open(os.path.join(path, "config.json")) as f:
        cfg = ModelConfig.from_hf_config(json.load(f))

    from safetensors import safe_open  # ships with transformers deps

    sd = {}
    shards = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    assert shards, f"no safetensors shards under {path}"
    for shard in sorted(shards):
        with safe_open(os.path.join(path, shard), framework="np") as f:
            for name in f.keys():
                sd[name] = f.get_tensor(name)
    return cfg, params_from_hf_state_dict(sd, cfg, dtype, quant=quant)
