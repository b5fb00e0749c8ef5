"""Load HF GptOss checkpoints into the functional parameter pytree.

Maps ``GptOssForCausalLM`` parameter names (see
transformers/models/gpt_oss/modeling_gpt_oss.py) to our pytree layout.
Works from an in-memory state dict (tests use a randomly-initialized HF
model) or a local checkpoint directory of safetensors shards.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from .config import ModelConfig

__all__ = ["params_from_hf_state_dict", "load_hf_checkpoint"]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor
        t = t.detach()
        if t.dtype.__str__() == "torch.bfloat16":
            t = t.float()
        return t.cpu().numpy()
    return np.asarray(t)


def params_from_hf_state_dict(sd: Dict[str, Any], cfg: ModelConfig,
                              dtype: Any = jnp.float32) -> dict:
    """Convert a GptOssForCausalLM state dict to our parameter pytree."""

    def get(name, transpose=False):
        x = _np(sd[name]).astype(np.float32)
        if transpose:
            x = x.T
        return jnp.asarray(x, dtype)

    layers = []
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        attn = {
            # HF Linear stores [out, in]; we store [in, out]
            "wq": get(pre + "self_attn.q_proj.weight", transpose=True),
            "bq": get(pre + "self_attn.q_proj.bias"),
            "wk": get(pre + "self_attn.k_proj.weight", transpose=True),
            "bk": get(pre + "self_attn.k_proj.bias"),
            "wv": get(pre + "self_attn.v_proj.weight", transpose=True),
            "bv": get(pre + "self_attn.v_proj.bias"),
            "wo": get(pre + "self_attn.o_proj.weight", transpose=True),
            "bo": get(pre + "self_attn.o_proj.bias"),
            "sinks": get(pre + "self_attn.sinks"),
        }
        mlp = {
            "router_w": get(pre + "mlp.router.weight", transpose=True),
            "router_b": get(pre + "mlp.router.bias"),
            # HF experts already store [E, in, out]
            "gate_up": get(pre + "mlp.experts.gate_up_proj"),
            "gate_up_b": get(pre + "mlp.experts.gate_up_proj_bias"),
            "down": get(pre + "mlp.experts.down_proj"),
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
        "embed": get("model.embed_tokens.weight"),
        "layers": layers,
        "final_norm": get("model.norm.weight"),
        "lm_head": get(lm_head_name, transpose=True),
    }


def load_hf_checkpoint(path: str, dtype: Any = jnp.bfloat16):
    """Load (cfg, params) from a local HF checkpoint directory.

    Reads config.json + *.safetensors shards. No network access.
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
    return cfg, params_from_hf_state_dict(sd, cfg, dtype)
