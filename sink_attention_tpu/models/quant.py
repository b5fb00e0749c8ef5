"""Weight-only INT8 quantization for serving.

Decode at small batch is HBM-bandwidth-bound on *weights* (the KV cache is
already small thanks to the sink/window pattern — see cache.sink_cache for
KV quantization). Storing the big projection matrices as int8 with
per-output-channel fp32 scales halves weight traffic, which is a direct
~2x on the decode-step roofline.

Representation: a quantized weight is the dict ``{"q": int8 array,
"s": fp32 per-output-channel scale}`` in place of the plain array.
``model._mm`` dispatches on the form, computing ``(x @ q.astype(bf16)) *
s`` — XLA fuses the int8->bf16 convert into the matmul's operand read, so
only int8 bytes cross HBM. (The reference package has no weight
quantization at all; this is TPU-build-only capability, motivated by the
BASELINE north-star configs.)

Quantized (per layer): wq/wk/wv/wo, MoE gate_up/down (per-expert,
per-output-channel scales), lm_head, embedding (per-row scales). Kept in
full precision: biases, norms, router (tiny), sinks.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["quantize_weight", "quantize_params", "is_quantized",
           "is_quantized4", "quantize_weight_int4",
           "init_quantized_params"]


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def quantize_weight(w: jax.Array, contract_axis: int = -2,
                    scale_dtype: Any = jnp.float32) -> dict:
    """Symmetric int8 quantization, one scale per non-contracted channel.

    ``contract_axis`` is the axis the matmul sums over (the input-feature
    axis); every other axis keeps independent scales — so a 2D [in, out]
    weight gets per-output-column scales [1, out], and stacked expert
    weights [E, in, out] get per-(expert, column) scales [E, 1, out].
    ``scale_dtype`` doubles as the model compute dtype: the embedding
    lookup produces activations in the scale's dtype.
    """
    contract_axis = contract_axis % w.ndim
    # fp32 temporaries of near-HBM-size tensors overflow a 16 GB chip
    # during on-device init/quantization; bf16 inputs stay in bf16
    # (int8 rounding error dwarfs bf16 division error).
    cdt = jnp.float32 if w.dtype.itemsize >= 4 else w.dtype
    wf = w.astype(cdt)
    amax = jnp.max(jnp.abs(wf), axis=contract_axis,
                   keepdims=True).astype(jnp.float32)
    scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(wf / scale.astype(cdt)),
                 -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.astype(scale_dtype)}


def _quantize_rowwise(w: jax.Array, scale_dtype: Any) -> dict:
    """Per-row scales (for the embedding table: rows are gathered, and the
    row axis is never contracted)."""
    return quantize_weight(w, contract_axis=-1, scale_dtype=scale_dtype)


def quantize_params(params: dict, cfg=None,
                    compute_dtype: Any = jnp.bfloat16,
                    inplace: bool = False) -> dict:
    """Quantize a model parameter pytree for serving.

    Returns a new pytree with the large weights replaced by
    ``{"q", "s"}`` dicts; all model forward functions accept either form.
    Scales are stored in ``compute_dtype``, which also sets the
    activation dtype of the quantized model's forward pass.

    ``inplace=True`` overwrites entries of ``params`` one tensor at a
    time, dropping each source array's last reference before quantizing
    the next — peak device memory stays near max(original, int8) + one
    tensor, instead of original + int8 + transients (which overflows a
    16 GB chip for gpt-oss-geometry models). The mutated ``params`` IS
    the returned tree.
    """
    qw = lambda w, **kw: quantize_weight(w, scale_dtype=compute_dtype, **kw)
    # MoE layers quantize gate_up/down [E, in, out]; dense (Qwen/Llama)
    # layers quantize gate/up/down [in, out] — detected per layer by key.
    mlp_big = lambda mlp: (("gate", "up", "down") if "gate" in mlp
                           else ("gate_up", "down"))
    if inplace:
        params["embed"] = _quantize_rowwise(params["embed"], compute_dtype)
        for lp in params["layers"]:
            for name in ("wq", "wk", "wv", "wo"):
                lp["attn"][name] = qw(lp["attn"][name])
            for name in mlp_big(lp["mlp"]):
                lp["mlp"][name] = qw(lp["mlp"][name])
        params["lm_head"] = qw(params["lm_head"])
        return params
    out = {
        "embed": _quantize_rowwise(params["embed"], compute_dtype),
        "final_norm": params["final_norm"],
        "lm_head": qw(params["lm_head"]),
        "layers": [],
    }
    for lp in params["layers"]:
        attn = dict(lp["attn"])
        for name in ("wq", "wk", "wv", "wo"):
            attn[name] = qw(attn[name])
        mlp = dict(lp["mlp"])
        for name in mlp_big(mlp):
            mlp[name] = qw(mlp[name])
        out["layers"].append({
            "attn": attn,
            "mlp": mlp,
            "ln1": lp["ln1"],
            "ln2": lp["ln2"],
        })
    return out


def init_quantized_params(cfg, key, compute_dtype: Any = jnp.bfloat16,
                          init_dtype: Any = jnp.bfloat16,
                          bits: int = 8,
                          int4_group_size: Any = None) -> dict:
    """Random-init a model directly in int8 form, one tensor at a time.

    For models whose full-precision parameters exceed device memory (the
    full 24-layer gpt-oss-20b geometry is ~42 GB bf16 vs 16 GB on a v5e,
    but ~6 GB int8), initialize each weight, quantize it, and drop the
    source before creating the next — peak memory stays near the int8
    total plus one tensor. Mirrors ``model.init_params`` (same shapes,
    same per-key RNG stream) followed by ``quantize_params``.
    ``int4_group_size``: group-wise int4 scales (see
    ``quantize_weight_int4``); None keeps per-output-channel.
    """
    import jax as _jax
    import jax.numpy as _jnp

    H, D = cfg.hidden_size, cfg.head_dim
    HQ, HKV = cfg.num_heads, cfg.num_kv_heads
    I, E = cfg.intermediate_size, cfg.num_experts
    keys = iter(_jax.random.split(key, 8 + 12 * cfg.num_layers))

    def w(shape, scale=0.02):
        return (_jax.random.normal(next(keys), shape, _jnp.float32) *
                scale).astype(init_dtype)

    assert bits in (4, 8), bits

    def qw(shape, contract_axis=-2, scale=0.02):
        full = w(shape, scale)
        if bits == 4:
            out = quantize_weight_int4(full, contract_axis=contract_axis,
                                       scale_dtype=compute_dtype,
                                       group_size=int4_group_size)
        else:
            out = quantize_weight(full, contract_axis=contract_axis,
                                  scale_dtype=compute_dtype)
        del full
        return out

    def qw8(shape, contract_axis=-2, scale=0.02):
        # the embedding is gathered (never contracted): keep int8 rows
        full = w(shape, scale)
        out = quantize_weight(full, contract_axis=contract_axis,
                              scale_dtype=compute_dtype)
        del full
        return out

    def zeros(shape):
        return _jnp.zeros(shape, init_dtype)

    # embed/lm_head first: their init transients (vocab x H) are the
    # largest, so create them while accumulated memory is still small.
    # The embedding stays int8 at bits=4 (it is gathered, never
    # contracted — the packed-halves layout has no gather story); the
    # lm_head uses the requested bit width (the XLA-fused nibble decode
    # beats even the int8 fused dot at decode shapes — ops/int4.py).
    embed = qw8((cfg.vocab_size, H), contract_axis=-1)
    lm_head = qw((H, cfg.vocab_size))

    layers = []
    for _ in range(cfg.num_layers):
        attn = {
            "wq": qw((H, HQ * D)), "bq": zeros((HQ * D,)),
            "wk": qw((H, HKV * D)), "bk": zeros((HKV * D,)),
            "wv": qw((H, HKV * D)), "bv": zeros((HKV * D,)),
            "wo": qw((HQ * D, H)), "bo": zeros((H,)),
        }
        if cfg.use_s_aux:
            attn["sinks"] = w((HQ,), scale=1.0)
        if cfg.mlp_type == "dense":
            mlp = {
                "gate": qw((H, I)), "up": qw((H, I)), "down": qw((I, H)),
            }
        else:
            mlp = {
                "router_w": w((H, E)), "router_b": zeros((E,)),
                "gate_up": qw((E, H, 2 * I)),
                "gate_up_b": zeros((E, 2 * I)),
                "down": qw((E, I, H)), "down_b": zeros((E, H)),
            }
        layers.append({
            "attn": attn,
            "mlp": mlp,
            "ln1": _jnp.ones((H,), init_dtype),
            "ln2": _jnp.ones((H,), init_dtype),
        })
    return {
        "embed": embed,
        "layers": layers,
        "lm_head": lm_head,
        "final_norm": _jnp.ones((H,), init_dtype),
    }


def is_quantized4(w: Any) -> bool:
    return isinstance(w, dict) and "q4" in w and "s" in w


def quantize_weight_int4(w: jax.Array, contract_axis: int = -2,
                         scale_dtype: Any = jnp.float32,
                         group_size: Any = None) -> dict:
    """INT4 quantize+pack (ops.int4.pack_int4 nibble format): ``{"q4":
    packed int8 [.., K/2, ..], "s": scales}`` — per-output-channel, or
    per-(``group_size`` rows x channel) when set (accuracy headroom: each
    K-slab quantizes against its own range instead of the column's single
    largest outlier). Consumed by the XLA-fused int4 matmuls via
    ``model._mm``/``_expert_mm``."""
    from ..ops.int4 import pack_int4

    packed, scale = pack_int4(w, contract_axis, group_size=group_size)
    return {"q4": packed, "s": scale.astype(scale_dtype)}
