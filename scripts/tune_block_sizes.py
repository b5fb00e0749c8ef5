"""Block-size tuner for the Pallas sink-attention kernels.

TPU-native analog of the reference's Triton block sweep
(/root/reference/tests/tune_block_sizes.py — which is stale against its own
kernel signature; see SURVEY.md §2.2). Sweeps (block_q, block_kv) tile pairs
over sequence lengths at the headline config and prints latency / useful
TFLOP/s / MFU per pair, marking the best pair per N.

Usage:
    python scripts/tune_block_sizes.py [--fwd-bwd] [--seqlens 4096 8192 ...]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sink_attention_tpu.ops import sink_flash_attention
from sink_attention_tpu.utils import (V5E_PEAK_BF16, sink_attention_flops,
                                      time_chained)

BLOCK_PAIRS = [
    (256, 256), (256, 512), (512, 256), (512, 512), (512, 1024),
    (1024, 512), (1024, 1024), (1024, 2048), (2048, 1024), (2048, 2048),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqlens", type=int, nargs="+",
                    default=[4096, 8192, 16384, 32768])
    ap.add_argument("--fwd-bwd", action="store_true",
                    help="time forward+backward instead of forward")
    ap.add_argument("--window", type=int, default=4096)
    ap.add_argument("--num-sink", type=int, default=4)
    ap.add_argument("--heads", type=int, nargs=2, default=[32, 8],
                    metavar=("H_Q", "H_KV"))
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--pairs", type=str, default=None,
                    help="comma-separated bmxbn subset, e.g. "
                         "'512x512,1024x1024' — each pair costs minutes of "
                         "scan compile on the remote tunnel, so narrow the "
                         "sweep when iterating")
    args = ap.parse_args()

    B, (H_q, H_kv), D = 1, args.heads, args.head_dim
    peak = V5E_PEAK_BF16
    mode = "fwd+bwd" if args.fwd_bwd else "fwd"
    print(f"config: B={B} GQA {H_q}/{H_kv} D={D} sink={args.num_sink} "
          f"window={args.window} bf16 [{mode}] on "
          f"{jax.devices()[0].device_kind}")
    print(f"{'N':>7} {'bm':>5} {'bn':>5} {'ms':>9} {'TFLOP/s':>9} {'MFU%':>6}")

    for N in args.seqlens:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, H_q, N, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, H_kv, N, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, H_kv, N, D), jnp.bfloat16)
        flops = sink_attention_flops(B, H_q, N, D, args.num_sink, args.window)
        if args.fwd_bwd:
            flops = int(flops * 3.5)  # bwd recompute ~2.5x fwd
        pairs = BLOCK_PAIRS
        if args.pairs:
            pairs = [tuple(int(t) for t in p.split("x"))
                     for p in args.pairs.split(",")]
        best = None
        for bm, bn in pairs:
            if bm > N or bn > N:
                continue
            try:
                # k, v via *consts, NOT closures: closure-captured
                # arrays become inline jit constants and stall the
                # remote-compile tunnel (the same class of staleness the
                # reference's tuner shipped with)
                if args.fwd_bwd:
                    def op(q, k, v, bm=bm, bn=bn):
                        f = lambda q: sink_flash_attention(
                            q, k, v, args.num_sink, args.window,
                            block_q=bm, block_kv=bn).astype(jnp.float32).sum()
                        return jax.grad(f)(q).astype(q.dtype)
                else:
                    def op(q, k, v, bm=bm, bn=bn):
                        return sink_flash_attention(
                            q, k, v, args.num_sink, args.window,
                            block_q=bm, block_kv=bn)
                # chained-scan differencing is the ONLY valid timing
                # on the axon tunnel: direct per-call block_until_ready
                # timing returns memoized/async results (measured 0.04 ms
                # for a 4 ms kernel). The price is a scan compile per
                # pair (minutes at small tiles) — use --pairs to narrow.
                dt = time_chained(op, q, k, v, iters_lo=2, iters_hi=8,
                                  reps=3)
            except Exception as e:  # VMEM overflow etc.
                print(f"{N:>7} {bm:>5} {bn:>5}   failed: "
                      f"{type(e).__name__}: {str(e)[:60]}", flush=True)
                continue
            tf = flops / dt / 1e12
            mfu = flops / dt / peak * 100
            mark = ""
            if best is None or dt < best[0]:
                best = (dt, bm, bn)
            print(f"{N:>7} {bm:>5} {bn:>5} {dt*1e3:>9.3f} {tf:>9.1f} "
                  f"{mfu:>6.1f}", flush=True)
        if best:
            print(f"  best @ N={N}: bm={best[1]} bn={best[2]} "
                  f"{best[0]*1e3:.3f} ms")


if __name__ == "__main__":
    main()
