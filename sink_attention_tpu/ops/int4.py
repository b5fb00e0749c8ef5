"""Packed-INT4 weight-only matmul (XLA-fused nibble decode).

Full gpt-oss-20b is ~21 GB even in int8 — over a 16 GB v5e chip — but
~10.5 GB in int4. int4 arrays cannot cross the jit boundary on this
platform and XLA has no packed-int4 dot, so these ops own the format:
two int4 values per int8 byte, decoded to bf16 on the fly and fed to
two MXU dots against the two halves of ``x``.

**Packing** (``pack_int4``): the contract dimension K is split in
halves, not interleaved — packed byte ``p[k, n]`` holds ``w[k, n]`` in
its low nibble and ``w[K/2 + k, n]`` in its high nibble. Unpacking is
then two sign-extends and **two matmuls against the two halves of x**
with no sublane interleave/relayout at all.

**Decode is pure XLA, not Pallas — a measured decision.** On the
gpt-oss-20b lm_head shape (K=2880, N=201216, bf16 x) on a v5e chip,
chained-scan timing gives:

====================  ========  =========  ==========
variant               T=8       T=256      roofline@T=8
====================  ========  =========  ==========
Pallas kernel          1.901 ms  3.003 ms   18.6%
XLA signed-sum float   1.248 ms  2.060 ms   28.3%
XLA nibble shifts      0.779 ms  1.762 ms   45.4%   <- this file
int8 fused dot (2x B)  0.868 ms  1.748 ms   81.5%
====================  ========  =========  ==========

(``scripts/bench_int4_variants.py``.) Mosaic lowers int8->int32 shift
chains and int8->bf16 converts through many VPU passes, so a Pallas
kernel pays ~7 int32 passes per packed byte; XLA fuses the identical
``(w32 << 28) >> 28`` sign-extend into the dot's operand read far
better. At decode shapes the nibble path now beats even the int8 path
in wall-clock while moving half the HBM bytes — int4 is a speed win at
decode, not just a capacity feature. At prefill (T=256) it ties int8.

No reference counterpart (the reference has no quantization at all).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["pack_int4", "int4_matmul", "int4_matmul_experts"]


def pack_int4(w: jax.Array, contract_axis: int = -2,
              group_size: Optional[int] = None):
    """Quantize + pack a weight to int4 along ``contract_axis``.

    Returns ``(packed int8 [..., K/2, ...], scales)``. With
    ``group_size=None`` scales have the weight's shape with the contract
    axis reduced to 1 (one scale per output channel, like
    ``quantize_weight``); with ``group_size=g`` the contract axis becomes
    ``K/g`` — one scale per g-row group per output channel, the accuracy
    headroom knob (a single per-column max-abs over K=2880 rows is
    hostage to its one largest outlier; per-32 groups quantize each slab
    against its own range). K must be even; g must divide K/2 so the
    lo/hi packing halves stay group-aligned.
    """
    contract_axis = contract_axis % w.ndim
    K = w.shape[contract_axis]
    assert K % 2 == 0, K
    if group_size is not None:
        assert (K // 2) % group_size == 0, (K, group_size)
    # bf16 inputs quantize in bf16: int4 rounding error (+-0.5 steps)
    # dwarfs bf16 division error, and fp32 temporaries of a near-HBM-size
    # tensor are exactly what overflows a 16 GB chip during model init.
    cdt = jnp.float32 if w.dtype.itemsize >= 4 else w.dtype
    wf = w.astype(cdt)
    if group_size is None:
        amax = jnp.max(jnp.abs(wf), axis=contract_axis,
                       keepdims=True).astype(jnp.float32)
    else:
        shp = list(wf.shape)
        shp[contract_axis:contract_axis + 1] = [K // group_size,
                                                group_size]
        amax = jnp.max(jnp.abs(wf.reshape(shp)), axis=contract_axis + 1
                       ).astype(jnp.float32)  # [..., K/g, ...]
    scale = jnp.where(amax == 0.0, 1.0, amax / 7.0)
    if group_size is None:
        s_full = scale
    else:
        s_full = jnp.repeat(scale, group_size, axis=contract_axis)
    q = jnp.clip(jnp.round(wf / s_full.astype(cdt)), -7, 7).astype(jnp.int8)
    lo, hi = jnp.split(q, 2, axis=contract_axis)
    packed = jnp.bitwise_or(
        jnp.bitwise_and(lo, jnp.int8(0x0F)),
        jnp.left_shift(hi, 4)).astype(jnp.int8)
    return packed, scale


def _unpack_bf16(packed: jax.Array):
    """Decode nibble-packed bytes to bf16 (lo, hi) halves.

    ``(w32 << 28) >> 28`` sign-extends the low nibble; ``w32 >> 4`` the
    high one. XLA fuses this chain into the consuming dot's operand read
    (measured 45% of HBM roofline on the 20b lm_head — see module doc);
    Mosaic inside a Pallas kernel lowers the same ops ~2.4x slower.
    """
    w32 = packed.astype(jnp.int32)
    lo = (jnp.left_shift(w32, 28) >> 28).astype(jnp.bfloat16)
    hi = (w32 >> 4).astype(jnp.bfloat16)
    return lo, hi


def _grouped_halves(lo, hi, scale, K2):
    """Apply per-group scales to the decoded halves. ``scale``:
    [..., K/g, N]; row k's group is k//g, and the hi half holds original
    rows K/2 + k. Returns scaled bf16 halves — the repeat+multiply fuses
    into the dot's operand read like the nibble decode does (no [K, N]
    bf16 tensor is materialized in HBM; see the grouped-vs-per-channel
    row in scripts/bench_int4_variants.py). Scales are applied in bf16:
    int4 rounding error (±0.5 quant steps) dwarfs the ~0.4% bf16 scale
    rounding, and a bf16 multiplicand is what keeps the operand-read
    fusion on the MXU path."""
    G = scale.shape[-2]
    g = 2 * K2 // G
    s_full = jnp.repeat(scale.astype(jnp.bfloat16), g, axis=-2)
    return (lo * s_full[..., :K2, :], hi * s_full[..., K2:, :])


def int4_matmul(x: jax.Array, packed: jax.Array, scale: jax.Array,
                interpret: Optional[bool] = None) -> jax.Array:
    """``x [T, K] @ unpack(packed [K/2, N]) * scale -> [T, N]``.

    ``scale``: [1, N] (or [N]) per-output-channel scales, or [K/g, N]
    group-wise scales from ``pack_int4(group_size=g)``. Output dtype
    follows x. ``interpret`` is accepted for API compatibility with the
    Pallas ops and ignored (this is pure XLA).
    """
    del interpret
    out_dtype = x.dtype
    T, K = x.shape
    K2, N = packed.shape
    assert K == 2 * K2, (K, K2)
    lo, hi = _unpack_bf16(packed)
    xb = x.astype(jnp.bfloat16)
    grouped = scale.ndim == 2 and scale.shape[0] > 1
    if grouped:
        lo, hi = _grouped_halves(lo, hi, scale, K2)
    acc = jnp.dot(xb[:, :K2], lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(xb[:, K2:], hi, preferred_element_type=jnp.float32)
    if not grouped:
        acc = acc * scale.reshape(1, N)
    return acc.astype(out_dtype)


def int4_matmul_experts(x: jax.Array, packed: jax.Array, scale: jax.Array,
                        interpret: Optional[bool] = None) -> jax.Array:
    """Batched-experts variant against packed ``[E, K/2, N]`` weights with
    scales ``[E, 1, N]`` (per-output-channel) or ``[E, K/g, N]``
    (group-wise). ``x`` is either [T, K] (shared across experts — the
    dense-MoE ``th,ehi->eti``) or [E, T, K] (per-expert activations — the
    ``eti,eih->eth`` down projection). Returns [E, T, N]."""
    del interpret
    out_dtype = x.dtype
    E, K2, N = packed.shape
    K = 2 * K2
    assert x.shape[-1] == K, (x.shape, K)
    lo, hi = _unpack_bf16(packed)
    xb = x.astype(jnp.bfloat16)
    grouped = scale.ndim == 3 and scale.shape[1] > 1
    if grouped:
        lo, hi = _grouped_halves(lo, hi, scale, K2)
    if x.ndim == 3:
        acc = jnp.einsum("etk,ekn->etn", xb[..., :K2], lo,
                         preferred_element_type=jnp.float32)
        acc += jnp.einsum("etk,ekn->etn", xb[..., K2:], hi,
                          preferred_element_type=jnp.float32)
    else:
        acc = jnp.einsum("tk,ekn->etn", xb[:, :K2], lo,
                         preferred_element_type=jnp.float32)
        acc += jnp.einsum("tk,ekn->etn", xb[:, K2:], hi,
                          preferred_element_type=jnp.float32)
    if not grouped:
        acc = acc * scale.reshape(E, 1, N)
    return acc.astype(out_dtype)
