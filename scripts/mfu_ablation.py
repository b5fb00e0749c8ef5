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

    def kv_index(bh, qi, s, off):
        block, _ = _fwd_kv_step(
            qi, s, off[0], off[1], bm=BM, bn=BN, nsb=nsb, num_sink=NS,
            window=W, n_q=N_q, n_kv_blocks=nk_pad // BN)
        return ((bh // H_q) * H_kv + (bh % H_q) // group, block, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bx * H_q, nq_pad // BM, steps),
        in_specs=[
            pl.BlockSpec((1, BM, d_pad), lambda bh, qi, s, off: (bh, qi, 0)),
            pl.BlockSpec((1, BN, d_pad), kv_index),
            pl.BlockSpec((1, BN, d_pad), kv_index),
        ],
        out_specs=pl.BlockSpec((1, BM, d_pad),
                               lambda bh, qi, s, off: (bh, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((BM, d_pad), jnp.float32),
            pltpu.VMEM((BM, 128), jnp.float32),
            pltpu.VMEM((BM, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _ablation_kernel, scale=1.0 / (Dx ** 0.5), stage=stage, bm=BM, bn=BN,
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
        return pl.pallas_call(kernel, **params)(offsets, qp, kp, vp)

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
    for stage in ["mxu_floor", "rowmax", "exp2", "sum", "general",
                  "sum_mxu", "nomax", "nomax_summxu", "bf16exp"]:
        fn, ops = run_ablation(q, k, v, stage)
        qp = ops[0]
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
