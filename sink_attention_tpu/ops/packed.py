"""Pallas TPU sink flash attention over PACKED (multi-segment) batches.

The reference package has no packed/varlen support: its verl patch detects
packed batches via position-id resets and *falls back to stock flash
attention* (/root/reference/sink_attention/verl_patch.py:73-93, 182-193),
so packed training never gets sink attention. This module supports it
natively, which matters because sequence packing is the standard way RL/
SFT frameworks batch variable-length prompts.

Semantics (see ``ops.reference.packed_sink_window_mask``): each segment
gets its own sinks (its first ``num_sink`` tokens) and its own causal
sliding window; no cross-segment attention. With per-token segment starts
``s_i = i - positions_i`` the mask needs only *row-side* segment starts:

    valid(i, j) = (j <= i) AND (j >= s_i)
                  AND (j < s_i + num_sink OR j >= i - window_size + 1)

because ``j >= s_i`` + causality already implies same-segment membership,
and then ``s_j == s_i``.

TPU-native structure (mirrors ``ops.flash``):

* Forward/dQ grid ``(B*H_q, n_q_blocks, steps)``: a sink phase aimed at the
  *first row's* segment start (a scalar-prefetch per-(batch, q-block) value
  — later segments starting inside the block have ``pos < bm`` so their
  sinks always fall inside the window phase's column range), then a window
  phase covering ``[r0 - W + 1, r0 + bm)`` that skips the sink phase's
  static block range to keep visits disjoint.
* dK/dV grid ``(B*H_kv, n_kv_blocks, group, steps)`` with a window pass
  (bounded q span) and a sink pass whose per-KV-block q-bound — the last
  q block of any segment whose sink tokens live in this KV block — is
  scalar-prefetched (computed on host from ``positions``).
* Per-tile mask branches (fast / causal / window / general) classified from
  two prefetched scalars (segment start of the tile's first and last row);
  only tiles straddling a segment boundary pay the general mask, which
  loads the ``[bm]`` row-segment-start vector (same layout as LSE/delta).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash import (
    LOG2E,
    LN2,
    NEG_INF,
    SUBLANES,
    _block_sizes,
    _cdiv,
    _compiler_params,
    _default_interpret,
    _prep,
)

__all__ = ["sink_flash_attention_packed"]


# ---------------------------------------------------------------------------
# Block-range arithmetic (shared by index_maps and kernel bodies).
# ---------------------------------------------------------------------------


def _pkv_step(qi, step, sfb, *, bm, bn, nsb, window, n_q, n_kv_blocks):
    """KV-block index + validity for forward/dQ step ``step``.

    ``sfb`` is the (traced) KV block holding the q-block's first-row segment
    start. Phase 1: ``nsb`` blocks from ``sfb`` (that segment's sinks).
    Phase 2: window blocks of ``[r0 - W + 1, r0 + bm)``, skipping phase 1's
    static range so every block is visited at most once.
    """
    in_sink = step < nsb
    r0 = qi * bm
    if nsb > 0:
        sink_block = sfb + step
        sink_valid = jnp.bool_(True)
    else:
        sink_block = jnp.int32(0)
        sink_valid = jnp.bool_(False)

    j = step - nsb
    win_glo = jnp.maximum(r0 - window + 1, 0)
    win_ghi = jnp.minimum(r0 + bm, n_q)
    win_b0 = win_glo // bn
    win_b1 = -(-win_ghi // bn)
    win_block = win_b0 + j
    win_valid = win_block < win_b1
    if nsb > 0:
        win_valid &= (win_block < sfb) | (win_block >= sfb + nsb)

    block = jnp.where(in_sink, sink_block, win_block)
    valid = jnp.where(in_sink, sink_valid, win_valid)
    valid &= (block >= 0) & (block < n_kv_blocks)
    return jnp.clip(block, 0, n_kv_blocks - 1), valid


def _pdkdv_q_step(ni, step, qb_sink_end, *, bm, bn, window, n_q_blocks,
                  q_steps_win):
    """Q-block index + validity for dK/dV step ``step`` at KV block ``ni``.

    Window pass: q blocks in the causal+window span of this KV block.
    Sink pass: q blocks strictly after the window span, bounded by the
    prefetched ``qb_sink_end`` (last q block of any segment whose sinks are
    in this KV block; 0 when the block holds no sink tokens).
    """
    c0 = ni * bn
    qb0 = c0 // bm
    qb_win_end = (c0 + bn - 1 + window - 1) // bm + 1
    win_end = jnp.minimum(qb_win_end, n_q_blocks)
    sink_end = jnp.minimum(qb_sink_end, n_q_blocks)
    in_win = step < q_steps_win
    j = step - q_steps_win
    win_valid = qb0 + step < win_end
    sink_valid = qb_win_end + j < sink_end
    # Freeze the index at the pass's last VALID block once past it: the
    # index map is what drives Mosaic's DMA pipeline, so an incrementing
    # index on invalid steps streams a fresh (discarded) q/do/lse/delta
    # fetch per step — O(n_q_blocks x n_kv_blocks) wasted HBM traffic on
    # the sink pass (which spans ALL later q blocks). A frozen index
    # re-requests the same block, which costs nothing.
    win_q = qb0 + jnp.minimum(step, jnp.maximum(win_end - qb0 - 1, 0))
    sink_q = qb_win_end + jnp.clip(
        j, 0, jnp.maximum(sink_end - qb_win_end - 1, 0))
    q_block = jnp.where(in_win, win_q, sink_q)
    valid = jnp.where(in_win, win_valid, sink_valid)
    valid &= (q_block >= 0) & (q_block < n_q_blocks)
    return jnp.clip(q_block, 0, n_q_blocks - 1), valid


def _packed_branch_masks(row_block, col_block, sf, sl, srow_fn, *, bm, bn,
                         num_sink, window, n_q, n_kv):
    """Mask-branch classification for a packed tile.

    ``sf``/``sl``: prefetched segment starts of the q-tile's first/last row.
    Single-segment tiles (sf == sl) use cheap scalar-condition branches;
    only multi-segment tiles (and edges) build the general mask from the
    ``[bm]`` row-segment-start vector supplied by ``srow_fn``.
    """
    r0 = row_block * bm
    c0 = col_block * bn
    single = sf == sl
    needs_causal = c0 + bn - 1 > r0
    col_ge_s = c0 >= sf
    all_sink = col_ge_s & (c0 + bn <= sf + num_sink)
    needs_win = c0 < r0 + bm - 1 - window + 1
    oob = (r0 + bm > n_q) | (c0 + bn > n_kv)
    ok = single & col_ge_s & jnp.logical_not(oob)
    fast = ok & jnp.logical_not(needs_causal) & (
        all_sink | jnp.logical_not(needs_win))
    causal_only = ok & needs_causal & (all_sink | jnp.logical_not(needs_win))
    window_only = (ok & jnp.logical_not(needs_causal) & needs_win &
                   jnp.logical_not(all_sink))
    general = jnp.logical_not(fast | causal_only | window_only)

    def iotas():
        rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
        cols = c0 + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
        return rows, cols

    def causal_mask():
        rows, cols = iotas()
        return cols <= rows

    def window_mask():
        # single-segment tile, cols >= sf for the whole tile: window term
        # plus this segment's sink columns (scalar sf, no vector load).
        rows, cols = iotas()
        return (cols >= rows - window + 1) | (cols < sf + num_sink)

    def general_mask():
        rows, cols = iotas()
        s_i = srow_fn()[:, None]  # [bm, 1] per-row segment start
        mask = (cols <= rows) & (cols >= s_i)
        mask &= (cols < s_i + num_sink) | (cols >= rows - window + 1)
        return mask & (rows < n_q) & (cols < n_kv)

    return [(fast, None), (causal_only, causal_mask),
            (window_only, window_mask), (general, general_mask)]


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _pfwd_kernel(sfirst_ref, slast_ref, qbe_ref, q_ref, k_ref, v_ref,
                 aux_ref, srow_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref, *,
                 scale, num_sink, window, n_q, n_kv, bm, bn, nsb, steps,
                 use_s_aux, h_q):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    step = pl.program_id(2)
    b = bh // h_q
    sf = sfirst_ref[b, qi]
    sl = slast_ref[b, qi]
    n_kv_blocks = _cdiv(n_kv, bn)
    aux_val = aux_ref[bh % aux_ref.shape[0], 0] if use_s_aux else None

    def q_scaled():
        return (q_ref[0] * (scale * LOG2E)).astype(q_ref.dtype)

    def softmax_update(s, v, guarded):
        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        row_max = jnp.max(s, axis=1, keepdims=True)
        if guarded:
            has_valid = row_max > NEG_INF
            m_new = jnp.where(has_valid, jnp.maximum(m_prev, row_max),
                              m_prev)
            m_safe = jnp.where(m_new > NEG_INF, m_new, 0.0)
            alpha = jnp.where(m_prev > NEG_INF,
                              jnp.exp2(m_prev - m_safe), 0.0)
        else:
            m_new = jnp.maximum(m_prev, row_max)
            m_safe = m_new
            alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_safe)
        l_ref[...] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        if use_s_aux:
            m_ref[...] = jnp.full_like(m_ref, aux_val * LOG2E)
            l_ref[...] = jnp.ones_like(l_ref)
        else:
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

    block, valid = _pkv_step(qi, step, sf // bn, bm=bm, bn=bn, nsb=nsb,
                             window=window, n_q=n_q,
                             n_kv_blocks=n_kv_blocks)

    for cond, mask_fn in _packed_branch_masks(
            qi, block, sf, sl, lambda: srow_ref[0, 0], bm=bm, bn=bn,
            num_sink=num_sink, window=window, n_q=n_q, n_kv=n_kv):
        @pl.when(valid & cond)
        def _body(mask_fn=mask_fn):
            s = jax.lax.dot_general(
                q_scaled(), k_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if mask_fn is not None:
                s = jnp.where(mask_fn(), s, NEG_INF)
            softmax_update(s, v_ref[0], guarded=mask_fn is not None)

    @pl.when(step == steps - 1)
    def _finalize():
        l = l_ref[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        lse = m_ref[:, 0] * LN2 + jnp.log(l_safe[:, 0])
        lse_ref[0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[1:])


def _pdq_kernel(sfirst_ref, slast_ref, qbe_ref, q_ref, k_ref, v_ref, do_ref,
                lse_ref, delta_ref, srow_ref, dq_ref, acc_ref, *, scale,
                num_sink, window, n_q, n_kv, bm, bn, nsb, steps, h_q):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    step = pl.program_id(2)
    b = bh // h_q
    sf = sfirst_ref[b, qi]
    sl = slast_ref[b, qi]
    n_kv_blocks = _cdiv(n_kv, bn)

    @pl.when(step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    block, valid = _pkv_step(qi, step, sf // bn, bm=bm, bn=bn, nsb=nsb,
                             window=window, n_q=n_q,
                             n_kv_blocks=n_kv_blocks)

    for cond, mask_fn in _packed_branch_masks(
            qi, block, sf, sl, lambda: srow_ref[0, 0], bm=bm, bn=bn,
            num_sink=num_sink, window=window, n_q=n_q, n_kv=n_kv):
        @pl.when(valid & cond)
        def _body(mask_fn=mask_fn):
            k = k_ref[0]
            v = v_ref[0]
            do = do_ref[0]
            lse = lse_ref[0, 0].astype(jnp.float32) * LOG2E
            delta = delta_ref[0, 0].astype(jnp.float32)
            s = jax.lax.dot_general(
                (q_ref[0] * (scale * LOG2E)).astype(q_ref.dtype), k,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = jnp.exp2(s - lse[:, None])
            if mask_fn is not None:
                p = jnp.where(mask_fn(), p, 0.0)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - delta[:, None])
            acc_ref[...] += jax.lax.dot_general(
                ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(step == steps - 1)
    def _finalize():
        dq_ref[0] = (acc_ref[...] * scale).astype(dq_ref.dtype)


def _pdkdv_kernel(sfirst_ref, slast_ref, qbe_ref, q_ref, k_ref, v_ref,
                  do_ref, lse_ref, delta_ref, srow_ref, dk_ref, dv_ref,
                  dk_acc, dv_acc, *, scale, num_sink, window, n_q, n_kv, bm,
                  bn, q_steps_win, steps, group, h_kv):
    bkh = pl.program_id(0)
    ni = pl.program_id(1)
    g = pl.program_id(2)
    step = pl.program_id(3)
    b = bkh // h_kv
    n_q_blocks = _cdiv(n_q, bm)

    @pl.when((g == 0) & (step == 0))
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q_block, valid = _pdkdv_q_step(
        ni, step, qbe_ref[b, ni], bm=bm, bn=bn, window=window,
        n_q_blocks=n_q_blocks, q_steps_win=q_steps_win)
    sf = sfirst_ref[b, q_block]
    sl = slast_ref[b, q_block]

    for cond, mask_fn in _packed_branch_masks(
            q_block, ni, sf, sl, lambda: srow_ref[0, 0], bm=bm, bn=bn,
            num_sink=num_sink, window=window, n_q=n_q, n_kv=n_kv):
        @pl.when(valid & cond)
        def _body(mask_fn=mask_fn):
            q = q_ref[0]
            k = k_ref[0]
            v = v_ref[0]
            do = do_ref[0]
            lse = lse_ref[0, 0].astype(jnp.float32) * LOG2E
            delta = delta_ref[0, 0].astype(jnp.float32)
            s = jax.lax.dot_general(
                (q * (scale * LOG2E)).astype(q.dtype), k,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = jnp.exp2(s - lse[:, None])
            if mask_fn is not None:
                p = jnp.where(mask_fn(), p, 0.0)
            dv_acc[...] += jax.lax.dot_general(
                p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - delta[:, None])
            dk_acc[...] += jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when((g == group - 1) & (step == steps - 1))
    def _finalize():
        dk_ref[0] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


def _packed_meta(positions, n, nq_pad, nk_pad, bm, bn, num_sink):
    """Host-side (jnp) preprocessing of the positions array.

    Returns scalar-prefetch operands:
      sfirst/slast [B, n_q_blocks]: segment start of each q block's
        first/last row (padded rows get their own index -> empty masks);
      srow [B, SUBLANES, nq_pad] int32: per-row segment starts (general
        mask operand, same broadcast-tile layout as LSE/delta);
      qbe [B, n_kv_blocks]: exclusive q-block bound of the dK/dV sink pass.
    """
    B = positions.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sstart = idx[None] - positions.astype(jnp.int32)  # [B, n]
    if nq_pad > n:
        tail = jnp.broadcast_to(
            jnp.arange(n, nq_pad, dtype=jnp.int32)[None], (B, nq_pad - n))
        sfull = jnp.concatenate([sstart, tail], axis=1)
    else:
        sfull = sstart
    sfirst = sfull[:, ::bm]
    slast = sfull[:, bm - 1::bm]
    srow = jnp.broadcast_to(sfull[:, None, :], (B, SUBLANES, nq_pad))

    nkb = nk_pad // bn
    if num_sink > 0:
        # Tokens before the first position reset (a pack not starting at a
        # segment start) get seg_id -1; route them to a discarded overflow
        # bucket — .at[-1] would WRAP to the last segment and silently
        # inflate its length (and thus the dK/dV sink-pass bound qbe).
        seg_id = jnp.cumsum((positions == 0).astype(jnp.int32), axis=1) - 1
        sid_safe = jnp.where(seg_id < 0, n, seg_id)
        seg_len = jax.vmap(
            lambda sid: jnp.zeros(n + 1, jnp.int32).at[sid].add(1)[:n]
        )(sid_safe)
        seg_end = sstart + jnp.take_along_axis(
            seg_len, jnp.minimum(sid_safe, n - 1), axis=1)
        # leading (pre-reset) tokens belong to a segment starting outside
        # this pack: no in-pack sink pass for them
        sink_end = jnp.where((positions < num_sink) & (seg_id >= 0),
                             seg_end, 0)
        if nk_pad > n:
            sink_end = jnp.pad(sink_end, ((0, 0), (0, nk_pad - n)))
        qbe = -(-sink_end.reshape(B, nkb, bn).max(axis=-1) // bm)
    else:
        qbe = jnp.zeros((B, nkb), jnp.int32)
    return (sfirst.astype(jnp.int32), slast.astype(jnp.int32),
            srow.astype(jnp.int32), qbe.astype(jnp.int32))


def _pstep_counts(num_sink, window, bm, bn, n_kv_blocks):
    """Forward/dQ static step counts: sink phase + window phase (+1 slack
    each for arbitrary segment-start / window-start alignment)."""
    nsb = (min(_cdiv(num_sink, bn) + 1, n_kv_blocks)
           if num_sink > 0 else 0)
    mwb = min(_cdiv(window + bm, bn) + 1, n_kv_blocks)
    return nsb, max(nsb + mwb, 1)


def _pfwd_impl(q, k, v, s_aux, positions, num_sink, window, bm, bn,
               interpret):
    if interpret is None:
        interpret = _default_interpret()
    qp, kp, vp, dims = _prep(q, k, v, bm, bn)
    B, H_q, H_kv, N_q, N_kv, D, nq_pad, nk_pad, d_pad = dims
    group = H_q // H_kv
    scale = 1.0 / (D**0.5)
    n_q_blocks = nq_pad // bm
    n_kv_blocks = nk_pad // bn
    nsb, steps = _pstep_counts(num_sink, window, bm, bn, n_kv_blocks)
    sfirst, slast, srow, qbe = _packed_meta(
        positions, N_q, nq_pad, nk_pad, bm, bn, num_sink)

    use_s_aux = s_aux is not None
    aux = (s_aux.astype(jnp.float32).reshape(H_q, 1) if use_s_aux
           else jnp.zeros((1, 1), jnp.float32))

    def kv_bh(bh):
        return (bh // H_q) * H_kv + (bh % H_q) // group

    def kv_index(bh, qi, s, sfirst, slast, qbe):
        block, _ = _pkv_step(
            qi, s, sfirst[bh // H_q, qi] // bn, bm=bm, bn=bn, nsb=nsb,
            window=window, n_q=N_q, n_kv_blocks=n_kv_blocks)
        return (kv_bh(bh), block, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B * H_q, n_q_blocks, steps),
        in_specs=[
            pl.BlockSpec((1, bm, d_pad),
                         lambda bh, qi, s, *_: (bh, qi, 0)),
            pl.BlockSpec((1, bn, d_pad), kv_index),
            pl.BlockSpec((1, bn, d_pad), kv_index),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # s_aux
            pl.BlockSpec((1, SUBLANES, bm),
                         lambda bh, qi, s, *_: (bh // H_q, 0, qi)),
        ],
        out_specs=[
            pl.BlockSpec((1, bm, d_pad), lambda bh, qi, s, *_: (bh, qi, 0)),
            pl.BlockSpec((1, SUBLANES, bm),
                         lambda bh, qi, s, *_: (bh, 0, qi)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bm, d_pad), jnp.float32),
            pltpu.VMEM((bm, 128), jnp.float32),
            pltpu.VMEM((bm, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _pfwd_kernel, scale=scale, num_sink=num_sink, window=window,
        n_q=N_q, n_kv=N_kv, bm=bm, bn=bn, nsb=nsb, steps=steps,
        use_s_aux=use_s_aux, h_q=H_q)
    flops = 4 * B * H_q * N_q * min(num_sink + window, N_kv) * d_pad
    params = dict(
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * H_q, nq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((B * H_q, SUBLANES, nq_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=B * H_q * N_q * min(
                num_sink + window, N_kv), bytes_accessed=0),
        interpret=interpret,
    )
    cp = _compiler_params(("parallel", "parallel", "arbitrary"))
    if cp is not None:
        params["compiler_params"] = cp
    o_p, lse_p = pl.pallas_call(kernel, **params)(
        sfirst, slast, qbe, qp, kp, vp, aux, srow)
    o = o_p.reshape(B, H_q, nq_pad, d_pad)[:, :, :N_q, :D]
    lse = lse_p[:, 0].reshape(B, H_q, nq_pad)[:, :, :N_q]
    return o, lse


def _pbwd_impl(q, k, v, s_aux, positions, o, lse, do, num_sink, window, bm,
               bn, interpret):
    if interpret is None:
        interpret = _default_interpret()
    qp, kp, vp, dims = _prep(q, k, v, bm, bn)
    B, H_q, H_kv, N_q, N_kv, D, nq_pad, nk_pad, d_pad = dims
    group = H_q // H_kv
    scale = 1.0 / (D**0.5)
    n_q_blocks = nq_pad // bm
    n_kv_blocks = nk_pad // bn
    nsb, steps = _pstep_counts(num_sink, window, bm, bn, n_kv_blocks)
    sfirst, slast, srow, qbe = _packed_meta(
        positions, N_q, nq_pad, nk_pad, bm, bn, num_sink)

    dop = jnp.pad(do, ((0, 0), (0, 0), (0, nq_pad - N_q),
                       (0, d_pad - D))).reshape(B * H_q, nq_pad, d_pad)

    def pack_rowvec(x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, nq_pad - N_q))).reshape(
            B * H_q, 1, nq_pad)
        return jnp.broadcast_to(x, (B * H_q, SUBLANES, nq_pad))

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta_p = pack_rowvec(delta)
    lse_p = pack_rowvec(lse)

    def kv_bh(bh):
        return (bh // H_q) * H_kv + (bh % H_q) // group

    # ---- dQ ----
    def kv_index(bh, qi, s, sfirst, slast, qbe):
        block, _ = _pkv_step(
            qi, s, sfirst[bh // H_q, qi] // bn, bm=bm, bn=bn, nsb=nsb,
            window=window, n_q=N_q, n_kv_blocks=n_kv_blocks)
        return (kv_bh(bh), block, 0)

    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B * H_q, n_q_blocks, steps),
        in_specs=[
            pl.BlockSpec((1, bm, d_pad), lambda bh, qi, s, *_: (bh, qi, 0)),
            pl.BlockSpec((1, bn, d_pad), kv_index),
            pl.BlockSpec((1, bn, d_pad), kv_index),
            pl.BlockSpec((1, bm, d_pad), lambda bh, qi, s, *_: (bh, qi, 0)),
            pl.BlockSpec((1, SUBLANES, bm),
                         lambda bh, qi, s, *_: (bh, 0, qi)),
            pl.BlockSpec((1, SUBLANES, bm),
                         lambda bh, qi, s, *_: (bh, 0, qi)),
            pl.BlockSpec((1, SUBLANES, bm),
                         lambda bh, qi, s, *_: (bh // H_q, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, bm, d_pad),
                               lambda bh, qi, s, *_: (bh, qi, 0)),
        scratch_shapes=[pltpu.VMEM((bm, d_pad), jnp.float32)],
    )
    dq_kernel = functools.partial(
        _pdq_kernel, scale=scale, num_sink=num_sink, window=window, n_q=N_q,
        n_kv=N_kv, bm=bm, bn=bn, nsb=nsb, steps=steps, h_q=H_q)
    dq_params = dict(
        grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct((B * H_q, nq_pad, d_pad), q.dtype),
        interpret=interpret,
    )
    cp = _compiler_params(("parallel", "parallel", "arbitrary"))
    if cp is not None:
        dq_params["compiler_params"] = cp
    dq_p = pl.pallas_call(dq_kernel, **dq_params)(
        sfirst, slast, qbe, qp, kp, vp, dop, lse_p, delta_p, srow)
    dq = dq_p.reshape(B, H_q, nq_pad, d_pad)[:, :, :N_q, :D]

    # ---- dK/dV: one kernel, window pass + sink pass over the step dim ----
    q_steps_win = max(1, min(_cdiv(window + bn + bm, bm) + 1, n_q_blocks))
    dkdv_steps = q_steps_win + (n_q_blocks if num_sink > 0 else 0)

    def q_index_of(bkh, ni, s, qbe):
        q_block, _ = _pdkdv_q_step(
            ni, s, qbe[bkh // H_kv, ni], bm=bm, bn=bn, window=window,
            n_q_blocks=n_q_blocks, q_steps_win=q_steps_win)
        return q_block

    def q_side(bkh, ni, g, s, sfirst, slast, qbe):
        return (bkh // H_kv * H_q + (bkh % H_kv) * group + g,
                q_index_of(bkh, ni, s, qbe), 0)

    def rowvec_side(bkh, ni, g, s, sfirst, slast, qbe):
        return (bkh // H_kv * H_q + (bkh % H_kv) * group + g,
                0, q_index_of(bkh, ni, s, qbe))

    dkdv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B * H_kv, n_kv_blocks, group, dkdv_steps),
        in_specs=[
            pl.BlockSpec((1, bm, d_pad), q_side),
            pl.BlockSpec((1, bn, d_pad),
                         lambda bkh, ni, g, s, *_: (bkh, ni, 0)),
            pl.BlockSpec((1, bn, d_pad),
                         lambda bkh, ni, g, s, *_: (bkh, ni, 0)),
            pl.BlockSpec((1, bm, d_pad), q_side),
            pl.BlockSpec((1, SUBLANES, bm), rowvec_side),
            pl.BlockSpec((1, SUBLANES, bm), rowvec_side),
            pl.BlockSpec(
                (1, SUBLANES, bm),
                lambda bkh, ni, g, s, sfirst, slast, qbe:
                    (bkh // H_kv, 0, q_index_of(bkh, ni, s, qbe))),
        ],
        out_specs=[
            pl.BlockSpec((1, bn, d_pad),
                         lambda bkh, ni, g, s, *_: (bkh, ni, 0)),
            pl.BlockSpec((1, bn, d_pad),
                         lambda bkh, ni, g, s, *_: (bkh, ni, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, d_pad), jnp.float32),
            pltpu.VMEM((bn, d_pad), jnp.float32),
        ],
    )
    dkdv_kernel = functools.partial(
        _pdkdv_kernel, scale=scale, num_sink=num_sink, window=window,
        n_q=N_q, n_kv=N_kv, bm=bm, bn=bn, q_steps_win=q_steps_win,
        steps=dkdv_steps, group=group, h_kv=H_kv)
    dkdv_params = dict(
        grid_spec=dkdv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * H_kv, nk_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((B * H_kv, nk_pad, d_pad), v.dtype),
        ],
        interpret=interpret,
    )
    cpb = _compiler_params(("parallel", "parallel", "arbitrary", "arbitrary"))
    if cpb is not None:
        dkdv_params["compiler_params"] = cpb
    dk_p, dv_p = pl.pallas_call(dkdv_kernel, **dkdv_params)(
        sfirst, slast, qbe, qp, kp, vp, dop, lse_p, delta_p, srow)
    dk = dk_p.reshape(B, H_kv, nk_pad, d_pad)[:, :, :N_kv, :D]
    dv = dv_p.reshape(B, H_kv, nk_pad, d_pad)[:, :, :N_kv, :D]

    ds_aux = None
    if s_aux is not None:
        sink_prob = jnp.exp(s_aux.astype(jnp.float32)[None, :, None] - lse)
        ds_aux = -(sink_prob * delta).sum(axis=(0, 2)).astype(s_aux.dtype)

    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), ds_aux


# ---------------------------------------------------------------------------
# Public API (custom_vjp)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _packed_attn(q, k, v, s_aux, positions, num_sink, window, bm, bn,
                 interpret):
    o, _ = _pfwd_impl(q, k, v, s_aux, positions, num_sink, window, bm, bn,
                      interpret)
    return o


def _packed_attn_fwd(q, k, v, s_aux, positions, num_sink, window, bm, bn,
                     interpret):
    o, lse = _pfwd_impl(q, k, v, s_aux, positions, num_sink, window, bm, bn,
                        interpret)
    return o, (q, k, v, s_aux, positions, o, lse)


def _packed_attn_bwd(num_sink, window, bm, bn, interpret, res, g):
    q, k, v, s_aux, positions, o, lse = res
    dq, dk, dv, ds_aux = _pbwd_impl(
        q, k, v, s_aux, positions, o, lse, g, num_sink, window, bm, bn,
        interpret)
    return dq, dk, dv, ds_aux, None


_packed_attn.defvjp(_packed_attn_fwd, _packed_attn_bwd)


def sink_flash_attention_packed(q, k, v, positions, num_sink: int = 4,
                                window_size: int = 512, s_aux=None,
                                block_q: int | None = None,
                                block_kv: int | None = None,
                                interpret: bool | None = None):
    """Sink flash attention over a packed (multi-segment) batch.

    Each segment attends its own first ``num_sink`` tokens plus its own
    causal sliding window; no cross-segment attention. Differentiable
    (dQ/dK/dV/ds_aux). The reference package falls back to stock flash
    attention for packed batches (verl_patch.py:73-93); this kernel is the
    native TPU replacement for that missing capability.

    Args:
        q: [B, H_q, N, D]; k, v: [B, H_kv, N, D] (same packed layout).
        positions: [B, N] int32 segment-local token positions (0 at each
            segment start — i.e. the position_ids a packed training loop
            already feeds the model).
        num_sink / window_size / s_aux / block sizes / interpret: as in
            ``sink_flash_attention``.

    Returns:
        [B, H_q, N, D] attention output in q.dtype.
    """
    assert q.shape[2] == k.shape[2], (
        "packed attention requires N_q == N_kv", q.shape, k.shape)
    assert positions.shape == (q.shape[0], q.shape[2]), positions.shape
    bm, bn = _block_sizes(q.shape[2], k.shape[2], block_q, block_kv,
                          q.shape[3], q.dtype)
    return _packed_attn(q, k, v, s_aux, jnp.asarray(positions, jnp.int32),
                        num_sink, window_size, bm, bn, interpret)
