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

__all__ = ["quantize_weight", "quantize_params", "is_quantized"]


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
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=contract_axis, keepdims=True)
    scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
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
    if inplace:
        params["embed"] = _quantize_rowwise(params["embed"], compute_dtype)
        for lp in params["layers"]:
            for name in ("wq", "wk", "wv", "wo"):
                lp["attn"][name] = qw(lp["attn"][name])
            lp["mlp"]["gate_up"] = qw(lp["mlp"]["gate_up"])
            lp["mlp"]["down"] = qw(lp["mlp"]["down"])
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
        mlp["gate_up"] = qw(mlp["gate_up"])  # [E, H, 2I]
        mlp["down"] = qw(mlp["down"])        # [E, I, H]
        out["layers"].append({
            "attn": attn,
            "mlp": mlp,
            "ln1": lp["ln1"],
            "ln2": lp["ln2"],
        })
    return out
