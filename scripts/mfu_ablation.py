"""Prefill-kernel MFU ablation / roofline decomposition (VERDICT item 5).

Times a family of stripped-down forward kernels over the SAME grid /
BlockSpec structure as the production kernel at the headline config
(B=1, GQA 32/8, D=128, sink=4, W=4096, bf16, 1024x1024 tiles), adding the
online-softmax stages back one at a time:

  mxu_floor   QK^T matmul + astype(bf16) + PV matmul only (no softmax)
  +rowmax     ... plus the running-max reduce + m bookkeeping
  +exp2       ... plus p = exp2(s - m) (the transcendental pass)
  +sum        ... plus the l row-sum accumulation  == unmasked softmax
  full        the production kernel (branch-specialized masks, sink tile)
  general     production kernel with branch specialization disabled
              (every tile pays the full 5-term mask) — shows what the
              specialized branches buy

Candidate-optimization stages (correct-softmax variants with work moved
off the VPU; measured here before any production-kernel surgery):

  sum_mxu     like `sum` but the l row-sum rides the MXU — an extra
              dot(p, ones[bn, 128]) instead of the whole-tile VPU reduce
              (trades +bm*bn*128 MXU FLOPs for -1 VPU pass)
  nomax       VFA-style: softmax against a precomputed global bound
              instead of a running max (arXiv 2604.12798) — drops the
              rowmax reduce, m bookkeeping AND the acc rescale
  nomax_summxu  both of the above — the full vector-op-relief endgame
  bf16exp     exp2 evaluated on a bf16 argument producing bf16 p — the
              transcendental runs at 2-per-lane packed width and the
              separate p astype pass disappears (p error ~1e-3 relative
              where p ~ 1; bf16 output rounding dominates anyway)

Mask-cost stages (round-3: the r2 ablation showed masking costs MORE than
the whole softmax — sum 4.35ms vs full 5.66ms — so these measure constant
-pattern masking: with bm == bn and aligned offsets the diagonal causal
mask is the fixed pattern i >= j and the window-start mask is its exact
complement j >= i+1, so both come from ONE precomputed tile):

  maskadd     correct masking via two precomputed fp32 {0,-inf} bias
              tiles passed as constant-index_map inputs; canonical tiles
              pay ONE add pass (s + bias) instead of iota+compare+select
  masksel     one precomputed int8 0/1 mask tile; canonical tiles pay a
              compare + select (2 passes), window-start swaps select args

The gap between `mxu_floor` and the 100%-MFU analytic time is the
MXU/DMA/grid floor on this silicon; the per-stage deltas show where the
rest of the time goes. Run: python scripts/mfu_ablation.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sink_attention_tpu.ops.flash import (
    LOG2E,
    NEG_INF,
    _compiler_params,
    _fwd_kv_step,
    _norm_offsets,
    _prep,
    _step_counts,
)
from sink_attention_tpu.ops import sink_flash_attention
from sink_attention_tpu.utils import (
    V5E_PEAK_BF16,
    sink_attention_flops,
    time_chained,
)

B, HQ, HKV, D, NS, W = 1, 32, 8, 128, 4, 4096
BM = BN = 1024


def _ablation_kernel(off_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref,
                     l_ref, *, scale, stage, bm, bn, nsb, steps, n_q, n_kv,
                     num_sink, window):
    """Stripped forward kernel; `stage` selects how much softmax runs."""
    qi = pl.program_id(1)
    step = pl.program_id(2)
    n_kv_blocks = -(-n_kv // bn)

    @pl.when(step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    block, valid = _fwd_kv_step(
        qi, step, off_ref[0], off_ref[1], bm=bm, bn=bn, nsb=nsb,
        num_sink=num_sink, window=window, n_q=n_q, n_kv_blocks=n_kv_blocks)

    def body(mask_fn):
        s = jax.lax.dot_general(
            (q_ref[0] * (scale * LOG2E)).astype(q_ref.dtype), k_ref[0],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if mask_fn is not None:
            s = jnp.where(mask_fn(), s, NEG_INF)
        if stage == "mxu_floor":
            p = s
        elif stage in ("nomax", "nomax_summxu"):
            # VFA-style: a precomputed global bound M replaces the running
            # max — no rowmax reduce, no m bookkeeping, no acc rescale.
            # (Here M is a constant; production would derive a per-row
            # bound from a prepass. exp2(s - M) merely scales p and l by a
            # common factor that the final acc/l normalization cancels.)
            p = jnp.exp2(s - 16.0)
            if stage == "nomax_summxu":
                ones = jnp.ones((bn, 128), jnp.bfloat16)
                lsum = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                l_ref[...] = l_ref[...] + lsum
            else:
                l_ref[...] = jnp.broadcast_to(
                    l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True),
                    l_ref.shape)
        else:
            m_prev = m_ref[:, :1]
            row_max = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, row_max)
            alpha = jnp.exp2(m_prev - m_new)
            m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
            if stage == "rowmax":
                p = s
            elif stage == "bf16exp":
                p = jnp.exp2((s - m_new).astype(jnp.bfloat16))
                l_ref[...] = jnp.broadcast_to(
                    l_ref[:, :1] * alpha +
                    jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32),
                    l_ref.shape)
            else:
                p = jnp.exp2(s - m_new)
                if stage == "sum_mxu":
                    # l row-sum on the MXU: dot(p, ones) — every output
                    # lane holds the row sum; one extra matmul replaces
                    # the whole-tile VPU reduce.
                    ones = jnp.ones((bn, 128), jnp.bfloat16)
                    lsum = jax.lax.dot_general(
                        p.astype(jnp.bfloat16), ones,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    l_ref[...] = l_ref[...] * alpha + lsum
                elif stage != "exp2":  # "sum" and beyond
                    l_ref[...] = jnp.broadcast_to(
                        l_ref[:, :1] * alpha +
                        jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
            acc_ref[...] *= alpha
    # NOTE: for ablation purposes the PV matmul always runs (it is part of
    # the MXU floor); masked-out correctness does not matter here.
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] + pv

    if stage == "general":
        # every tile pays the full combined mask
        @pl.when(valid)
        def _b():
            body(lambda: _general_mask(qi, block, off_ref, bm, bn, num_sink,
                                       window, n_q, n_kv))
    else:
        @pl.when(valid)
        def _b():
            body(None)

    @pl.when(step == steps - 1)
    def _fin():
        l = l_ref[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)


def _mask_stage_kernel(off_ref, q_ref, k_ref, v_ref, mask_ref, o_ref,
                       acc_ref, m_ref, l_ref, *, scale, stage, bm, bn, nsb,
                       steps, n_q, n_kv, num_sink, window):
    """Correct (for aligned shapes) kernel using constant-pattern masks.

    Tile classification mirrors production _branch_masks, but diagonal
    (r0 == c0) and window-start (r0 - c0 == window) tiles read the
    precomputed mask tile instead of building iotas.
    """
    qi = pl.program_id(1)
    step = pl.program_id(2)
    n_kv_blocks = -(-n_kv // bn)

    @pl.when(step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    block, valid = _fwd_kv_step(
        qi, step, off_ref[0], off_ref[1], bm=bm, bn=bn, nsb=nsb,
        num_sink=num_sink, window=window, n_q=n_q, n_kv_blocks=n_kv_blocks)

    r0 = qi * bm + off_ref[0]
    c0 = block * bn + off_ref[1]
    needs_causal = c0 + bn - 1 > r0
    needs_win = c0 < r0 + bm - 1 - window + 1
    diag = needs_causal & (r0 == c0) & jnp.logical_not(needs_win)
    winstart = (needs_win & (r0 - c0 == window) & (c0 >= num_sink) &
                jnp.logical_not(needs_causal))
    fast = jnp.logical_not(needs_causal | needs_win)
    general = jnp.logical_not(fast | diag | winstart)

    def softmax_update(s, guarded):
        m_prev = m_ref[:, :1]
        row_max = jnp.max(s, axis=1, keepdims=True)
        if guarded:
            has_valid = row_max > NEG_INF
            m_new = jnp.where(has_valid, jnp.maximum(m_prev, row_max), m_prev)
            m_safe = jnp.where(m_new > NEG_INF, m_new, 0.0)
            alpha = jnp.where(m_prev > NEG_INF, jnp.exp2(m_prev - m_safe), 0.0)
        else:
            m_new = jnp.maximum(m_prev, row_max)
            m_safe = m_new
            alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_safe)
        l_ref[...] = jnp.broadcast_to(
            l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True),
            l_ref.shape)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + pv

    def scores():
        return jax.lax.dot_general(
            (q_ref[0] * (scale * LOG2E)).astype(q_ref.dtype), k_ref[0],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(valid & fast)
    def _fast():
        softmax_update(scores(), guarded=False)

    if stage == "maskadd":
        @pl.when(valid & diag)
        def _diag():
            softmax_update(scores() + mask_ref[0].astype(jnp.float32),
                           guarded=True)

        @pl.when(valid & winstart)
        def _win():
            softmax_update(scores() + mask_ref[1].astype(jnp.float32),
                           guarded=True)
    else:  # masksel
        @pl.when(valid & diag)
        def _diag():
            keep = mask_ref[0] != 0
            softmax_update(jnp.where(keep, scores(), NEG_INF), guarded=True)

        @pl.when(valid & winstart)
        def _win():
            keep = mask_ref[0] != 0
            softmax_update(jnp.where(keep, NEG_INF, scores()), guarded=True)

    @pl.when(valid & general)
    def _general():
        mask = _general_mask(qi, block, off_ref, bm, bn, num_sink, window,
                             n_q, n_kv)
        softmax_update(jnp.where(mask, scores(), NEG_INF), guarded=True)

    @pl.when(step == steps - 1)
    def _fin():
        l = l_ref[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)


def _general_mask(qi, block, off_ref, bm, bn, num_sink, window, n_q, n_kv):
    rows_g = (qi * bm + off_ref[0] +
              jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0))
    cols_g = (block * bn + off_ref[1] +
              jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1))
    causal = cols_g <= rows_g
    sink = cols_g < num_sink
    win = cols_g >= rows_g - window + 1
    return (causal & (sink | win) & (cols_g >= 0) &
            (cols_g < off_ref[2]) & (rows_g - off_ref[0] < n_q))


def run_ablation(q, k, v, stage):
    qp, kp, vp, dims = _prep(q, k, v, BM, BN)
    Bx, H_q, H_kv, N_q, N_kv, Dx, nq_pad, nk_pad, d_pad = dims
    group = H_q // H_kv
    nsb, steps = _step_counts(NS, W, BM, BN, nk_pad // BN, False)
    offsets = _norm_offsets(jnp.zeros((2,), jnp.int32))
    mask_stage = stage in ("maskadd", "masksel")

    def kv_index(bh, qi, s, off):
        block, _ = _fwd_kv_step(
            qi, s, off[0], off[1], bm=BM, bn=BN, nsb=nsb, num_sink=NS,
            window=W, n_q=N_q, n_kv_blocks=nk_pad // BN)
        return ((bh // H_q) * H_kv + (bh % H_q) // group, block, 0)

    in_specs = [
        pl.BlockSpec((1, BM, d_pad), lambda bh, qi, s, off: (bh, qi, 0)),
        pl.BlockSpec((1, BN, d_pad), kv_index),
        pl.BlockSpec((1, BN, d_pad), kv_index),
    ]
    extra = []
    if mask_stage:
        ii = jax.lax.broadcasted_iota(jnp.int32, (BM, BN), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (BM, BN), 1)
        if stage == "maskadd":
            # bf16 bias tiles (fp32 pair OOMs the 16M VMEM at 1024x1024)
            bias_c = jnp.where(ii >= jj, 0.0, NEG_INF).astype(jnp.bfloat16)
            bias_w = jnp.where(ii >= jj, NEG_INF, 0.0).astype(jnp.bfloat16)
            extra = [jnp.stack([bias_c, bias_w])]
            in_specs.append(pl.BlockSpec((2, BM, BN),
                                         lambda bh, qi, s, off: (0, 0, 0)))
        else:
            extra = [(ii >= jj).astype(jnp.int8)[None]]
            in_specs.append(pl.BlockSpec((1, BM, BN),
                                         lambda bh, qi, s, off: (0, 0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bx * H_q, nq_pad // BM, steps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BM, d_pad),
                               lambda bh, qi, s, off: (bh, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((BM, d_pad), jnp.float32),
            pltpu.VMEM((BM, 128), jnp.float32),
            pltpu.VMEM((BM, 128), jnp.float32),
        ],
    )
    kern_fn = _mask_stage_kernel if mask_stage else _ablation_kernel
    kernel = functools.partial(
        kern_fn, scale=1.0 / (Dx ** 0.5), stage=stage, bm=BM, bn=BN,
        nsb=nsb, steps=steps, n_q=N_q, n_kv=N_kv, num_sink=NS, window=W)
    params = dict(
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bx * H_q, nq_pad, d_pad), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )
    cp = _compiler_params(("parallel", "parallel", "arbitrary"))
    if cp is not None:
        params["compiler_params"] = cp

    def fn(qp, kp, vp):
        return pl.pallas_call(kernel, **params)(offsets, qp, kp, vp, *extra)

    return fn, (qp, kp, vp)


def main():
    print(f"backend: {jax.default_backend()} {jax.devices()[0].device_kind}")
    N = int(os.environ.get("ABL_N", 8192))
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, HQ, N, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, N, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, N, D), jnp.bfloat16)
    fl = sink_attention_flops(B, HQ, N, D, NS, W)
    print(f"N={N}; analytic 100%-MFU time "
          f"{fl / V5E_PEAK_BF16 * 1e3:.2f} ms; useful TFLOP {fl/1e12:.2f}")
    print(f"{'variant':<12} {'ms':>8} {'eff-MFU%':>9}")
    rows = []
    default_stages = ["mxu_floor", "rowmax", "exp2", "sum", "general",
                      "sum_mxu", "nomax", "nomax_summxu", "bf16exp",
                      "maskadd", "masksel"]
    stages = os.environ.get("ABL_STAGES", ",".join(default_stages)).split(",")
    ref = None
    for stage in stages:
        fn, ops = run_ablation(q, k, v, stage)
        qp = ops[0]
        if stage in ("maskadd", "masksel"):
            # these are meant to be CORRECT kernels — verify vs production
            if ref is None:
                ref = sink_flash_attention(q, k, v, NS, W)
            got = fn(*ops).reshape(B, HQ, -1, 128)[:, :, :N]
            import numpy as np
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32))))
            assert err < 2e-2, (stage, err)
        dt = time_chained(lambda x, kp, vp: fn(x, kp, vp).astype(x.dtype),
                          qp, ops[1], ops[2])
        mfu = fl / dt / V5E_PEAK_BF16
        rows.append((stage, dt * 1e3, mfu * 100))
        print(f"{stage:<12} {dt*1e3:>8.2f} {mfu*100:>9.1f}")
    # production kernel
    dt = time_chained(lambda q, k, v: sink_flash_attention(q, k, v, NS, W),
                      q, k, v)
    print(f"{'full':<12} {dt*1e3:>8.2f} {fl/dt/V5E_PEAK_BF16*100:>9.1f}")


if __name__ == "__main__":
    main()
