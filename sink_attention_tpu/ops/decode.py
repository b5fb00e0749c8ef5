"""Pallas TPU single-token decode attention over the rolling sink KV cache.

Replaces the reference's FlashDecoding split-KV Triton kernel + PyTorch
Phase-2 reduction (/root/reference/sink_attention/decode_kernel.py:28-226)
with one Pallas kernel, redesigned for TPU:

* No split-KV two-phase scheme: TPU has no SM-occupancy problem to solve.
  The kernel tiles the KV slot dimension through the grid and carries the
  online-softmax state (m, l, acc) in VMEM scratch — one pass, no partial
  buffers, no host-side reduction.
* ``s_aux`` initializes the softmax state (m = s_aux, l = 1, acc = 0),
  exactly like the prefill kernel — instead of the reference's "virtual KV
  split" concatenation (decode_kernel.py:205-215).
* The circular window buffer is attended **in place**: softmax is
  permutation-invariant over the KV set, so only a per-slot validity mask is
  needed — no chronological linearization copies (reference cache.py:185-216).
  Window-slot validity is the circular-age test
  ``(write_pos - 1 - slot) mod window_size < window_len``, which subsumes
  both the prefix layout (pre-wrap) and fully-wrapped layout, and lets
  continuous batching park sequences at arbitrary ring phases.
* Cache state is **per sequence**: the scalar-prefetch operand carries
  [B, 4] = (sink_len, window_len, write_pos, high-water-mark) rows, so a
  ragged batch (continuous batching) decodes in one kernel launch. The
  reference shares cache state across the batch and requires equal lengths
  (cache.py:11-13).
* INT8/FP8 KV dequantization is fused: per-token scales multiply the score
  and probability rows (cheap [G, S]-shaped VPU work), so the matmuls read
  quantized data straight from the cache and HBM traffic is halved/quartered.
* GQA is handled by shaping the query as [B * H_kv, group, D] so each grid
  step computes all query heads of one KV head on the MXU together.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cache.sink_cache import SinkKVCache
from .flash import LANES, NEG_INF, _cdiv, _default_interpret, _round_up

__all__ = ["sink_decode_attention", "sink_decode_attention_cached",
           "sink_decode_attention_cached_multi",
           "sink_decode_attention_ragged",
           "sink_decode_attention_ragged_multi"]


def _dequant_block(x, quant):
    """In-kernel decode of a stored KV tile to bf16.

    int8: one convert pass. fp8: the int8 tile holds float8_e4m3fn bit
    patterns (cache.sink_cache.QUANT_DTYPE; fp8-dtype buffers themselves
    are avoided because pre-v6 TPUs have no native fp8 path — an
    fp8-dtype cache measured 4.1x slower than bf16 on v5e). The e4m3
    decode is integer shift-add, NOT a float convert: Mosaic lowers
    fp8->bf16 `astype` through a slow scalarized path on v5e (measured
    3x the whole decode step, round-4 bench `decode` rows), while
    bf16 bits are constructible exactly from e4m3 bits:

        bf16_bits = sign<<15 | (e4m3_exp + (127-7))<<7 | e4m3_mant<<4
                  = ((bits & 0x7F) << 4) + 0x3C00  |  (bits & 0x80) << 8

    valid for every NORMAL e4m3 value (the +0x3C00 re-bias never
    carries into the sign bit since mant<<4 < 128). Subnormals
    (magnitude bits < 8) do not satisfy the formula — the quantizer
    flushes them to zero at encode (cache.sink_cache.quantize), so the
    in-kernel select maps them to 0 exactly. This shift-add decode is
    ~3x faster than the astype it replaced, but it is still a full
    [block_s, d] VPU pass per tile — the int8 path avoids dequant
    entirely (native s8 MXU matmuls, see the kernel body), which fp8
    cannot: its bit patterns are not linear in the stored value. fp8
    decode therefore runs ~2x the bf16 step (committed numbers in
    bench_results.json `decode`).
    """
    if quant == "fp8":
        u = x.astype(jnp.int32) & 0xFF
        mag = u & 0x7F
        bits = jnp.where(mag >= 8,
                         ((mag << 4) + 0x3C00) | ((u & 0x80) << 8), 0)
        return jax.lax.bitcast_convert_type(bits.astype(jnp.uint16),
                                            jnp.bfloat16)
    return x.astype(jnp.bfloat16)


def _decode_kernel(lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, aux_ref,
                   o_ref, acc_ref, m_ref, l_ref, *, scale, sink_cap, block_s,
                   steps, use_aux, quantized, window_size, h_kv):
    b = pl.program_id(0) // h_kv
    step = pl.program_id(1)
    sink_len = lens_ref[b, 0]
    window_len = lens_ref[b, 1]
    write_pos = lens_ref[b, 2]

    @pl.when(step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        if use_aux:
            m_ref[...] = jnp.broadcast_to(aux_ref[0][:, :1], m_ref.shape)
            l_ref[...] = jnp.ones_like(l_ref)
        else:
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

    step_valid = step * block_s < lens_ref[b, 3]

    @pl.when(step_valid)
    def _body():
        q = q_ref[0]  # [g_pad, d_pad]
        k = k_ref[0]  # [block_s, d_pad] (possibly quantized storage)
        g_pad = q.shape[0]
        if quantized == "int8":
            # Native s8xs8 MXU path: quantize q per row in-kernel (a tiny
            # [g_pad, d] tensor, symmetric, one scale per query head) and
            # contract directly against the stored int8 K tile — no
            # [block_s, d] dequant pass at all. That convert pass was the
            # dominant VPU cost of the quantized decode step (int8 read
            # half the bytes of bf16 yet ran slower; bench_results.json
            # `decode` rows). q's 8-bit rounding adds <=0.4% relative
            # error on top of the cache's own per-token quantization —
            # well inside the int8 path's test budget. The fp32 detour
            # before the int8 cast matters: Mosaic crashes on a direct
            # bf16->int8 round-convert (compile-helper abort, v5e).
            qf = q.astype(jnp.float32)
            q_s = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True),
                              1e-6) * (1.0 / 127.0)
            qi = jnp.round(qf / q_s).astype(jnp.int8)
            s32 = jax.lax.dot_general(
                qi, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            s = (s32.astype(jnp.float32) * (q_s * scale) *
                 ks_ref[0, 0][None, :])  # [g_pad, block_s]
        else:
            kc = _dequant_block(k, quantized) if quantized else k
            # precision pinned per operand dtype, NOT inherited from the
            # caller's jax.default_matmul_precision context: Mosaic rejects
            # a HIGHEST-precision contract on bf16 operands ("Bad lhs
            # type"), so a quantized decode under
            # default_matmul_precision("highest") would fail to compile.
            # bf16 operands already use the MXU's full bf16 path; fp32
            # operands keep HIGHEST for exactness.
            prec = (jax.lax.Precision.DEFAULT if kc.dtype == jnp.bfloat16
                    else jax.lax.Precision.HIGHEST)
            s = jax.lax.dot_general(
                q.astype(kc.dtype), kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec) * scale  # [g_pad, block_s]
            if quantized:
                s = s * ks_ref[0, 0][None, :]

        slots = step * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (g_pad, block_s), 1)
        # Circular-age validity: a window slot is live iff it is one of the
        # newest ``window_len`` positions behind write_pos on the ring.
        sw = slots - sink_cap
        age = jnp.where(sw < write_pos, write_pos - 1 - sw,
                        write_pos - 1 - sw + window_size)
        valid = (slots < sink_len) | ((sw >= 0) & (sw < window_size) &
                                      (age < window_len))
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        row_max = jnp.max(s, axis=1, keepdims=True)
        has_valid = row_max > NEG_INF
        m_new = jnp.where(has_valid, jnp.maximum(m_prev, row_max), m_prev)
        m_safe = jnp.where(m_new > NEG_INF, m_new, 0.0)
        alpha = jnp.where(m_prev > NEG_INF, jnp.exp(m_prev - m_safe), 0.0)
        p = jnp.exp(s - m_safe)

        l_ref[...] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

        if quantized == "int8":
            # Same trick on the PV side: fold V's per-token scale into p
            # (as the dequant path does), then quantize the [g_pad,
            # block_s] probability tile per row and contract s8xs8 against
            # the stored int8 V — replacing the [block_s, d] V dequant
            # pass with VPU work on a tensor d/g_pad times smaller. p >= 0
            # and is bounded by its row max, so one unsigned-range scale
            # per row loses <1/254 of the row's mass resolution; the
            # 1e-20 floor covers fully-masked steps (pw all zero).
            pw = p * vs_ref[0, 0][None, :]
            p_s = jnp.maximum(jnp.max(pw, axis=1, keepdims=True),
                              1e-20) * (1.0 / 127.0)
            pi = jnp.round(pw / p_s).astype(jnp.int8)
            pv32 = jax.lax.dot_general(
                pi, v_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            pv = pv32.astype(jnp.float32) * p_s
        else:
            v = v_ref[0]
            vc = _dequant_block(v, quantized) if quantized else v
            if quantized:
                p = p * vs_ref[0, 0][None, :]
            pv = jax.lax.dot_general(
                p.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.DEFAULT
                           if vc.dtype == jnp.bfloat16
                           else jax.lax.Precision.HIGHEST))
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(step == steps - 1)
    def _fin():
        l = l_ref[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)


def _decode_call(q, k_buf, v_buf, k_scale, v_scale, lens, s_aux, *,
                 sink_cap: int, window_size: int, scale: float,
                 quantized, block_s: Optional[int],
                 interpret: Optional[bool]):
    """q: [B, H_q, 1, D]; k_buf/v_buf: [B, H_kv, S_total, D_pad];
    lens: [B, 4] int32 rows (sink_len, window_len, write_pos, hwm)."""
    if interpret is None:
        interpret = _default_interpret()
    B, H_q, n_q, D = q.shape
    assert n_q == 1, "decode kernel handles a single query token"
    _, H_kv, s_total, d_pad = k_buf.shape
    assert H_q % H_kv == 0
    group = H_q // H_kv
    g_pad = _round_up(group, 16)

    if block_s is None:
        # Fewest grid steps whose double-buffered K+V blocks fit an 8 MiB
        # VMEM budget: per-grid-step overhead dominates this kernel, so
        # bigger blocks win monotonically. Measured at the headline
        # 4224-slot cache (B=1, GQA 32/8): block_s=128 (33 steps) 0.11 ms;
        # 384 (11) 0.054; 1408 (3) 0.018/0.022/0.028 bf16/int8/fp8;
        # 4224 (single step) 0.010/0.012/0.023 — the old fixed 4096 cap
        # (4 MiB budget at bf16) forced the 3-step split and nearly
        # doubled the step. The budget is per-dtype: int8 storage halves
        # the block bytes, so quantized caches keep the single step out
        # to twice the window. Short ragged slots trade some dead read
        # (one full block instead of hwm-truncated steps) for the same
        # per-step saving, a net win at these block sizes.
        cap = (8 * 1024 * 1024) // (4 * d_pad * k_buf.dtype.itemsize)
        cap = max(LANES, min(cap, s_total) // LANES * LANES)
        block_s = LANES
        for cand in range(cap, LANES - 1, -LANES):
            if s_total % cand == 0:
                block_s = cand
                break
    assert s_total % block_s == 0, (s_total, block_s)
    steps = s_total // block_s

    # [B, H_q, 1, D] -> [B*H_kv, g_pad, d_pad]
    qg = q.reshape(B, H_kv, group, D)
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - group), (0, d_pad - D)))
    qg = qg.reshape(B * H_kv, g_pad, d_pad)

    kb = k_buf.reshape(B * H_kv, s_total, d_pad)
    vb = v_buf.reshape(B * H_kv, s_total, d_pad)

    def pack_scale(sc):
        # a single sublane row per (b, kv-head): a materialized
        # SUBLANES-high broadcast here cost ~4 MB of dead write+read
        # traffic per decode call — comparable to the int8 KV bytes
        # themselves (the reason int8 decode initially timed SLOWER than
        # bf16 at half the stored bytes)
        return sc.reshape(B * H_kv, 1, s_total).astype(jnp.float32)

    if quantized:
        ks = pack_scale(k_scale)
        vs = pack_scale(v_scale)
    else:
        # the kernel never reads scales when unquantized: pass one dummy
        # block with a constant index map so no per-step scale DMAs are
        # pipelined (the decode step is HBM-bound; all-ones scale tiles
        # were ~12% dead traffic)
        ks = vs = jnp.ones((1, 1, block_s), jnp.float32)

    use_aux = s_aux is not None
    if use_aux:
        aux = s_aux.astype(jnp.float32).reshape(H_kv, group, 1)
        aux = jnp.pad(aux, ((0, 0), (0, g_pad - group), (0, 0)))
        aux = jnp.broadcast_to(aux, (H_kv, g_pad, LANES))
    else:
        aux = jnp.zeros((1, g_pad, LANES), jnp.float32)

    lens = jnp.asarray(lens, jnp.int32)
    assert lens.ndim == 2 and lens.shape[1] == 4, lens.shape

    def kv_index(bh, s, lens_ref):
        max_step = jnp.maximum(_cdiv(lens_ref[bh // H_kv, 3], block_s) - 1, 0)
        return (bh, jnp.minimum(s, max_step), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H_kv, steps),
        in_specs=[
            pl.BlockSpec((1, g_pad, d_pad), lambda bh, s, lens: (bh, 0, 0)),
            pl.BlockSpec((1, block_s, d_pad), kv_index),
            pl.BlockSpec((1, block_s, d_pad), kv_index),
            pl.BlockSpec((1, 1, block_s),
                         (lambda bh, s, lens: kv_index(bh, s, lens)[:1] +
                          (0, kv_index(bh, s, lens)[1])) if quantized
                         else (lambda bh, s, lens: (0, 0, 0))),
            pl.BlockSpec((1, 1, block_s),
                         (lambda bh, s, lens: kv_index(bh, s, lens)[:1] +
                          (0, kv_index(bh, s, lens)[1])) if quantized
                         else (lambda bh, s, lens: (0, 0, 0))),
            pl.BlockSpec((1, g_pad, LANES),
                         (lambda bh, s, lens: (bh % H_kv, 0, 0)) if use_aux
                         else (lambda bh, s, lens: (0, 0, 0))),
        ],
        out_specs=pl.BlockSpec((1, g_pad, d_pad),
                               lambda bh, s, lens: (bh, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((g_pad, d_pad), jnp.float32),
            pltpu.VMEM((g_pad, LANES), jnp.float32),
            pltpu.VMEM((g_pad, LANES), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel, scale=scale, sink_cap=sink_cap, block_s=block_s,
        steps=steps, use_aux=use_aux, quantized=quantized,
        window_size=window_size, h_kv=H_kv)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H_kv, g_pad, d_pad), q.dtype),
        interpret=interpret,
    )(lens, qg, kb, vb, ks, vs, aux)

    out = out.reshape(B, H_kv, g_pad, d_pad)[:, :, :group, :D]
    return out.reshape(B, H_q, 1, D)


def _uniform_lens(sink_len, window_len, write_pos, window_size: int,
                  sink_cap: int, batch: int):
    """[B, 4] lens rows from batch-shared scalar cache state."""
    hwm = sink_cap + jnp.where(window_len >= window_size,
                               jnp.int32(window_size), window_len)
    row = jnp.stack([jnp.int32(sink_len), jnp.int32(window_len),
                     jnp.int32(write_pos), hwm])
    return jnp.broadcast_to(row[None, :], (batch, 4))


def sink_decode_attention(q, k, v, s_aux=None, block_s: Optional[int] = None,
                          interpret: Optional[bool] = None):
    """Single-token decode attention over plain (already-evicted) KV.

    API-parity with the reference ``sink_decode_attention``
    (decode_kernel.py:120-149): all provided KV positions are attended (the
    cache already evicted out-of-window tokens; no causal mask needed).

    Args:
        q: [B, H_q, 1, D]; k, v: [B, H_kv, N_kv, D]; s_aux: optional [H_q].
    """
    B, H_kv, n_kv, D = k.shape
    d_pad = _round_up(D, LANES)
    n_pad = _round_up(n_kv, LANES)
    pad = ((0, 0), (0, 0), (0, n_pad - n_kv), (0, d_pad - D))
    kb = jnp.pad(k, pad)
    vb = jnp.pad(v, pad)
    ones = jnp.ones((B, H_kv, n_pad), jnp.float32)
    # sink_len = 0; whole KV is a not-yet-wrapped window prefix.
    lens = _uniform_lens(0, n_kv, n_kv, n_pad, 0, B)
    return _decode_call(
        q, kb, vb, ones, ones, lens, s_aux, sink_cap=0, window_size=n_pad,
        scale=1.0 / (D**0.5), quantized=False, block_s=block_s,
        interpret=interpret)


def sink_decode_attention_cached(q, cache: SinkKVCache, s_aux=None,
                                 block_s: Optional[int] = None,
                                 interpret: Optional[bool] = None):
    """Single-token decode attention directly over a ``SinkKVCache``.

    Reads the sink + circular window buffer in place (quantized or not);
    no linearization, no copies.

    Args:
        q: [B, H_q, 1, D] query for the token being decoded (its KV must
           already be appended to ``cache``).
    """
    B, D = q.shape[0], q.shape[-1]
    lens = _uniform_lens(cache.sink_len, cache.window_len, cache.write_pos,
                         cache.window_size, cache.sink_cap, B)
    return _decode_call(
        q, cache.k, cache.v, cache.k_scale, cache.v_scale, lens, s_aux,
        sink_cap=cache.sink_cap, window_size=cache.window_size,
        scale=1.0 / (D**0.5), quantized=cache.quant,
        block_s=block_s, interpret=interpret)


def sink_decode_attention_ragged(q, cache, s_aux=None,
                                 block_s: Optional[int] = None,
                                 interpret: Optional[bool] = None):
    """Single-token decode over a ``RaggedSinkKVCache`` (per-sequence state).

    Every batch slot attends its own (sink_len[b], window_len[b],
    write_pos[b]) view of the shared ring buffers — the continuous-batching
    decode path. Inactive slots (window_len == sink_len == 0) produce zeros.
    """
    D = q.shape[-1]
    hwm = cache.sink_cap + jnp.where(
        cache.window_len > 0, jnp.int32(cache.window_size),
        jnp.zeros_like(cache.window_len))
    lens = jnp.stack([cache.sink_len, cache.window_len, cache.write_pos,
                      hwm], axis=1).astype(jnp.int32)
    return _decode_call(
        q, cache.k, cache.v, cache.k_scale, cache.v_scale, lens, s_aux,
        sink_cap=cache.sink_cap, window_size=cache.window_size,
        scale=1.0 / (D**0.5), quantized=cache.quant,
        block_s=block_s, interpret=interpret)


def sink_decode_attention_ragged_multi(q, k_new, v_new, cache, s_aux=None):
    """Multi-token decode attention over a ``RaggedSinkKVCache`` — the
    per-slot speculative-verification op (engine spec-decode path).

    Same math as :func:`sink_decode_attention_cached_multi`, but every
    scalar of ring state (``sink_len``, ``window_len``, ``write_pos``,
    ``seen``) is a per-slot [B] vector, so each batch slot verifies its T
    draft tokens against its OWN pre-append ring view. The cache is NOT
    advanced — the caller commits each slot's accepted prefix via
    ``RaggedSinkKVCache.append_many_counted`` with per-slot counts.

    ``q``/``k_new``/``v_new``: [B, H, T, D]. Returns out [B, H_q, T, D].
    Inactive slots (no valid cached columns) attend only the T new tokens
    causally — finite junk the engine's active mask discards.
    """
    B, H_q, T, D = q.shape
    H_kv = cache.k.shape[1]
    assert H_q % H_kv == 0, (H_q, H_kv)
    assert T <= cache.window_size, (T, cache.window_size)
    group = H_q // H_kv
    sc, W = cache.sink_cap, cache.window_size
    ns = cache.num_sink

    kf, vf = cache.dequant_kv()
    kf = kf[:, :, :sc + W, :D].astype(jnp.float32)
    vf = vf[:, :, :sc + W, :D].astype(jnp.float32)
    kf = jnp.concatenate([kf, k_new.astype(jnp.float32)], axis=2)
    vf = jnp.concatenate([vf, v_new.astype(jnp.float32)], axis=2)

    # per-slot global positions + validity (the single-token kernel's
    # circular-age test, vectorized over the batch)
    sink_idx = jnp.arange(sc, dtype=jnp.int32)
    sink_valid = sink_idx[None, :] < cache.sink_len[:, None]      # [B,sc]
    w_idx = jnp.arange(W, dtype=jnp.int32)
    age = (cache.write_pos[:, None] - 1 - w_idx[None, :]) % W     # [B,W]
    win_pos = cache.seen[:, None] - 1 - age
    win_valid = age < cache.window_len[:, None]
    new_pos = cache.seen[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    col_pos = jnp.concatenate(
        [jnp.broadcast_to(sink_idx[None], (B, sc)), win_pos, new_pos],
        axis=1)                                                   # [B,S]
    col_valid = jnp.concatenate(
        [sink_valid, win_valid, jnp.ones((B, T), bool)], axis=1)

    q_pos = new_pos                                               # [B,T]
    causal = col_pos[:, None, :] <= q_pos[:, :, None]             # [B,T,S]
    # always-attended sink term only for columns living in the sink region
    # (same rationale as the shared-state variant below)
    sink = jnp.concatenate(
        [jnp.broadcast_to((sink_idx < ns)[None], (B, sc)),
         jnp.zeros((B, W + T), bool)], axis=1)[:, None, :]
    win = col_pos[:, None, :] >= q_pos[:, :, None] - W + 1
    mask = col_valid[:, None, :] & causal & (sink | win)          # [B,T,S]

    scale = 1.0 / (D ** 0.5)
    qf = q.astype(jnp.float32).reshape(B, H_kv, group, T, D) * scale
    scores = jnp.einsum("bhgtd,bhsd->bhgts", qf, kf)
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)

    if s_aux is not None:
        aux = s_aux.astype(jnp.float32).reshape(1, H_kv, group, 1, 1)
        aux = jnp.broadcast_to(aux, (B, H_kv, group, T, 1))
        logits = jnp.concatenate([scores, aux], axis=-1)
    else:
        logits = scores
    m = jnp.max(logits, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.where(jnp.isfinite(logits), jnp.exp(logits - m), 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    w = p[..., :kf.shape[2]] / denom
    out = jnp.einsum("bhgts,bhsd->bhgtd", w, vf)
    return out.reshape(B, H_q, T, D).astype(q.dtype)


def sink_decode_attention_cached_multi(q, k_new, v_new,
                                       cache: SinkKVCache, s_aux=None):
    """Multi-token decode attention (speculative-decoding verification).

    ``q``/``k_new``/``v_new``: [B, H, T, D] — the T draft tokens. ``cache``
    is the state BEFORE the draft tokens are appended: draft token t
    (global position ``seen + t``) attends the sinks, the cached window
    tokens still inside *its own* causal window, and draft tokens 0..t.
    This matches sequential single-token decode exactly — including the
    window tokens that appending all T drafts would have evicted from the
    ring, which is why the pre-append cache is required. Returns
    ``(out [B, H_q, T, D], cache_after)`` with the drafts appended, so
    accepted-prefix rollback is the caller reverting to ``cache``.

    The reference reaches the same state by looping single-token updates
    (cache.py:176-183); here the whole verification batch is one fused XLA
    call (T is small, so this is KV-bandwidth-bound — no Pallas needed).
    Quantized caches are dequantized on read. Requires T <= window_size.
    """
    B, H_q, T, D = q.shape
    H_kv = cache.k.shape[1]
    assert H_q % H_kv == 0, (H_q, H_kv)
    assert T <= cache.window_size, (T, cache.window_size)
    group = H_q // H_kv
    sc, W = cache.sink_cap, cache.window_size
    ns = cache.num_sink

    kf, vf = cache.dequant_kv()
    kf = kf[:, :, :sc + W, :D].astype(jnp.float32)
    vf = vf[:, :, :sc + W, :D].astype(jnp.float32)
    kf = jnp.concatenate([kf, k_new.astype(jnp.float32)], axis=2)
    vf = jnp.concatenate([vf, v_new.astype(jnp.float32)], axis=2)

    # per-slot global positions + validity (same circular-age test as the
    # single-token kernel), for the PRE-append ring state
    sink_idx = jnp.arange(sc, dtype=jnp.int32)
    sink_valid = sink_idx < cache.sink_len
    w_idx = jnp.arange(W, dtype=jnp.int32)
    age = (cache.write_pos - 1 - w_idx) % W  # 0 => most recent
    win_pos = cache.seen - 1 - age
    win_valid = age < cache.window_len
    new_pos = cache.seen + jnp.arange(T, dtype=jnp.int32)
    col_pos = jnp.concatenate([sink_idx, win_pos, new_pos])   # [sc + W + T]
    col_valid = jnp.concatenate(
        [sink_valid, win_valid, jnp.ones((T,), bool)])

    q_pos = new_pos                                           # [T]
    causal = col_pos[None, :] <= q_pos[:, None]
    # The always-attended sink term applies only to columns LIVING in the
    # sink region: a ring-resident token whose global position happens to
    # be < num_sink (short prompt) is evicted by age in sequential decode,
    # so keeping it via position would diverge from the single-token path
    # (caught by code review with a concrete repro).
    sink = jnp.concatenate(
        [sink_idx < ns, jnp.zeros((W + T,), bool)])[None, :]
    win = col_pos[None, :] >= q_pos[:, None] - W + 1
    mask = col_valid[None, :] & causal & (sink | win)         # [T, S]

    scale = 1.0 / (D ** 0.5)
    qf = q.astype(jnp.float32).reshape(B, H_kv, group, T, D) * scale
    scores = jnp.einsum("bhgtd,bhsd->bhgts", qf, kf)
    scores = jnp.where(mask[None, None, None], scores, NEG_INF)

    if s_aux is not None:
        aux = s_aux.astype(jnp.float32).reshape(1, H_kv, group, 1, 1)
        aux = jnp.broadcast_to(aux, (B, H_kv, group, T, 1))
        logits = jnp.concatenate([scores, aux], axis=-1)
    else:
        logits = scores
    m = jnp.max(logits, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.where(jnp.isfinite(logits), jnp.exp(logits - m), 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    w = p[..., :kf.shape[2]] / denom
    out = jnp.einsum("bhgts,bhsd->bhgtd", w, vf)
    out = out.reshape(B, H_q, T, D).astype(q.dtype)
    return out, cache.append_many(k_new, v_new)
