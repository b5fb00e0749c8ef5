"""Pallas TPU INT4 weight-only matmul (packed nibbles, fused dequant).

Full gpt-oss-20b is ~21 GB even in int8 — over a 16 GB v5e chip — but
~10.5 GB in int4. XLA fuses int8->bf16 converts into dot reads (measured
~0.85 ms for a 0.58 GB int8 lm_head, 83% of roofline), but int4 arrays
cannot cross the jit boundary on this platform and XLA has no packed-int4
dot; this kernel owns the format instead:

* **Packing**: the contract dimension K is split in halves, not
  interleaved — packed byte ``p[k, n]`` holds ``w[k, n]`` in its low
  nibble and ``w[K/2 + k, n]`` in its high nibble. Unpacking a tile is
  then two sign-extends and **two matmuls against the two halves of x**,
  with no sublane interleave/relayout at all.
* **Fused dequant**: nibbles are sign-extended on the VPU per tile
  (``(w << 28) >> 28`` and ``w >> 4`` in int32) and fed straight to the
  MXU; only packed int4 bytes cross HBM. Per-output-channel scales apply
  at the flush.
* Grid ``(T tiles, N tiles, K/2 tiles)`` with an fp32 VMEM accumulator;
  the same kernel serves decode (T=1..8, padded) and prefill (T large).

Performance: int4 is a CAPACITY feature, not a speed feature. The
nibble unpack is VPU-bound (~7 int32 passes per packed byte — Mosaic
compiles neither int8 shifts nor direct int8->bf16 converts), so this
kernel moves ~2x fewer HBM bytes than int8 but lands slower than the
XLA-fused int8 path on bandwidth-bound shapes. Use it for weights that
otherwise don't fit (models.quant.init_quantized_params(bits=4) keeps
the hot lm_head in int8 for exactly this reason).

No reference counterpart (the reference has no quantization at all).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash import (
    LANES,
    SUBLANES,
    _cdiv,
    _compiler_params,
    _default_interpret,
    _round_up,
)

__all__ = ["pack_int4", "int4_matmul", "int4_matmul_experts"]


def pack_int4(w: jax.Array, contract_axis: int = -2):
    """Quantize + pack a weight to int4 along ``contract_axis``.

    Returns ``(packed int8 [..., K/2, ...], scales)`` where scales have
    the weight's shape with the contract axis reduced to 1 (one scale per
    output channel, like ``quantize_weight``). K must be even.
    """
    contract_axis = contract_axis % w.ndim
    K = w.shape[contract_axis]
    assert K % 2 == 0, K
    # bf16 inputs quantize in bf16: int4 rounding error (+-0.5 steps)
    # dwarfs bf16 division error, and fp32 temporaries of a near-HBM-size
    # tensor are exactly what overflows a 16 GB chip during model init.
    cdt = jnp.float32 if w.dtype.itemsize >= 4 else w.dtype
    wf = w.astype(cdt)
    amax = jnp.max(jnp.abs(wf), axis=contract_axis,
                   keepdims=True).astype(jnp.float32)
    scale = jnp.where(amax == 0.0, 1.0, amax / 7.0)
    q = jnp.clip(jnp.round(wf / scale.astype(cdt)), -7, 7).astype(jnp.int8)
    lo, hi = jnp.split(q, 2, axis=contract_axis)
    packed = jnp.bitwise_or(
        jnp.bitwise_and(lo, jnp.int8(0x0F)),
        jnp.left_shift(hi, 4)).astype(jnp.int8)
    return packed, scale


def _int4_mm_kernel(x_lo_ref, x_hi_ref, wp_ref, s_ref, o_ref, acc_ref, *,
                    k_steps, out_dtype):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w32 = wp_ref[...].astype(jnp.int32)
    lo = (jnp.left_shift(w32, 28) >> 28).astype(jnp.bfloat16)
    hi = (w32 >> 4).astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        x_lo_ref[...], lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot_general(
        x_hi_ref[...], hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == k_steps - 1)
    def _flush():
        s = s_ref[0:1, :].astype(jnp.float32)  # [1, bn]
        o_ref[...] = (acc_ref[...] * s).astype(out_dtype)


def int4_matmul(x: jax.Array, packed: jax.Array, scale: jax.Array,
                block_t: int = 256, block_n: int = 512,
                block_k2: int = 720,
                interpret: Optional[bool] = None) -> jax.Array:
    """``x [T, K] @ unpack(packed [K/2, N]) * scale -> [T, N]``.

    ``scale``: [1, N] (or [N]) per-output-channel scales. Output dtype
    follows x.
    """
    if interpret is None:
        interpret = _default_interpret()
    out_dtype = x.dtype
    T, K = x.shape
    K2, N = packed.shape
    assert K == 2 * K2, (K, K2)
    scale = scale.reshape(1, N)

    bt = min(block_t, _round_up(T, SUBLANES * 2))
    bn = min(block_n, _round_up(N, LANES))
    # bk2 is simultaneously the lane dim of the x tiles (multiple of 128)
    # and the sublane dim of the int8 weight tiles (multiple of 32) ->
    # align to 128 and pick the largest block dividing the padded K2.
    k2_pad = _round_up(K2, 128)
    bk2 = min(_round_up(block_k2, 128), k2_pad)
    while k2_pad % bk2 or bk2 % 128:
        bk2 -= 128
    t_pad = _round_up(T, bt)
    n_pad = _round_up(N, bn)

    # Re-lay x as [lo half | hi half], each padded to k2_pad, so the two
    # kernel views sit at a static k_steps offset (padded packed rows are
    # zero nibbles -> zero contribution).
    x = x.astype(jnp.bfloat16)
    x_lo = jnp.pad(x[:, :K2], ((0, t_pad - T), (0, k2_pad - K2)))
    x_hi = jnp.pad(x[:, K2:], ((0, t_pad - T), (0, k2_pad - K2)))
    xs = jnp.concatenate([x_lo, x_hi], axis=1)  # [t_pad, 2*k2_pad]
    if k2_pad > K2 or n_pad > N:
        packed = jnp.pad(packed, ((0, k2_pad - K2), (0, n_pad - N)))
    if n_pad > N:
        scale = jnp.pad(scale, ((0, 0), (0, n_pad - N)))
    s_bcast = jnp.broadcast_to(scale.astype(jnp.float32),
                               (SUBLANES, n_pad))
    k_steps = k2_pad // bk2

    grid = (t_pad // bt, n_pad // bn, k_steps)
    kernel = functools.partial(_int4_mm_kernel, k_steps=k_steps,
                               out_dtype=out_dtype)
    params = dict(
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, bk2), lambda t, n, k: (t, k)),
            pl.BlockSpec((bt, bk2),
                         lambda t, n, k, ks=k_steps: (t, k + ks)),
            pl.BlockSpec((bk2, bn), lambda t, n, k: (k, n)),
            pl.BlockSpec((SUBLANES, bn), lambda t, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda t, n, k: (t, n)),
        out_shape=jax.ShapeDtypeStruct((t_pad, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
        interpret=interpret,
    )
    cp = _compiler_params(("parallel", "parallel", "arbitrary"))
    if cp is not None:
        params["compiler_params"] = cp
    out = pl.pallas_call(kernel, **params)(xs, xs, packed, s_bcast)
    return out[:T, :N]


def _int4_emm_kernel(x_lo_ref, x_hi_ref, wp_ref, s_ref, o_ref, acc_ref, *,
                     k_steps, out_dtype, batched_x=False):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w32 = wp_ref[0].astype(jnp.int32)
    lo = (jnp.left_shift(w32, 28) >> 28).astype(jnp.bfloat16)
    hi = (w32 >> 4).astype(jnp.bfloat16)
    x_lo = x_lo_ref[0] if batched_x else x_lo_ref[...]
    x_hi = x_hi_ref[0] if batched_x else x_hi_ref[...]
    acc_ref[...] += jax.lax.dot_general(
        x_lo, lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot_general(
        x_hi, hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == k_steps - 1)
    def _flush():
        s = s_ref[0, 0:1, :].astype(jnp.float32)  # [1, bn]
        o_ref[0] = (acc_ref[...] * s).astype(out_dtype)


def int4_matmul_experts(x: jax.Array, packed: jax.Array, scale: jax.Array,
                        block_t: int = 256, block_n: int = 1024,
                        block_k2: int = 480,
                        interpret: Optional[bool] = None) -> jax.Array:
    """Batched-experts variant against packed ``[E, K/2, N]`` weights with
    scales ``[E, 1, N]``. ``x`` is either [T, K] (shared across experts —
    the dense-MoE ``th,ehi->eti``) or [E, T, K] (per-expert activations —
    the ``eti,eih->eth`` down projection). Returns [E, T, N]."""
    if interpret is None:
        interpret = _default_interpret()
    out_dtype = x.dtype
    batched_x = x.ndim == 3
    if batched_x:
        _, T, K = x.shape
    else:
        T, K = x.shape
    E, K2, N = packed.shape
    assert K == 2 * K2, (K, K2)
    scale = scale.reshape(E, 1, N)

    bt = min(block_t, _round_up(T, SUBLANES * 2))
    bn = min(block_n, _round_up(N, LANES))
    k2_pad = _round_up(K2, 128)
    bk2 = min(_round_up(block_k2, 128), k2_pad)
    while k2_pad % bk2 or bk2 % 128:
        bk2 -= 128
    t_pad = _round_up(T, bt)
    n_pad = _round_up(N, bn)

    k_steps = k2_pad // bk2
    x = x.astype(jnp.bfloat16)
    if batched_x:
        pad = ((0, 0), (0, t_pad - T), (0, k2_pad - K2))
        x_lo = jnp.pad(x[..., :K2], pad)
        x_hi = jnp.pad(x[..., K2:], pad)
        xs = jnp.concatenate([x_lo, x_hi], axis=-1)
        x_specs = [
            pl.BlockSpec((1, bt, bk2), lambda e, t, n, k: (e, t, k)),
            pl.BlockSpec((1, bt, bk2),
                         lambda e, t, n, k, ks=k_steps: (e, t, k + ks)),
        ]
    else:
        pad = ((0, t_pad - T), (0, k2_pad - K2))
        x_lo = jnp.pad(x[:, :K2], pad)
        x_hi = jnp.pad(x[:, K2:], pad)
        xs = jnp.concatenate([x_lo, x_hi], axis=-1)
        x_specs = [
            pl.BlockSpec((bt, bk2), lambda e, t, n, k: (t, k)),
            pl.BlockSpec((bt, bk2),
                         lambda e, t, n, k, ks=k_steps: (t, k + ks)),
        ]
    if k2_pad > K2 or n_pad > N:
        packed = jnp.pad(packed,
                         ((0, 0), (0, k2_pad - K2), (0, n_pad - N)))
    if n_pad > N:
        scale = jnp.pad(scale, ((0, 0), (0, 0), (0, n_pad - N)))
    s_bcast = jnp.broadcast_to(scale.astype(jnp.float32),
                               (E, SUBLANES, n_pad))

    grid = (E, t_pad // bt, n_pad // bn, k_steps)
    kernel = functools.partial(_int4_emm_kernel, k_steps=k_steps,
                               out_dtype=out_dtype,
                               batched_x=batched_x)
    params = dict(
        grid=grid,
        in_specs=x_specs + [
            pl.BlockSpec((1, bk2, bn), lambda e, t, n, k: (e, k, n)),
            pl.BlockSpec((1, SUBLANES, bn), lambda e, t, n, k: (e, 0, n)),
        ],
        out_specs=pl.BlockSpec((1, bt, bn), lambda e, t, n, k: (e, t, n)),
        out_shape=jax.ShapeDtypeStruct((E, t_pad, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
        interpret=interpret,
    )
    cp = _compiler_params(("parallel", "parallel", "parallel", "arbitrary"))
    if cp is not None:
        params["compiler_params"] = cp
    out = pl.pallas_call(kernel, **params)(xs, xs, packed, s_bcast)
    return out[:, :T, :N]
