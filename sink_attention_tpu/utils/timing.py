"""Device timing + roofline accounting.

The axon TPU tunnel makes ``block_until_ready`` unreliable for timing, so
ops are timed by chaining them inside a single jitted ``lax.scan`` (the op's
output feeds the next iteration's input — no CSE, no overlap ambiguity) and
differencing two loop lengths to cancel dispatch/fetch overhead.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["time_chained", "sink_attention_flops", "V5E_PEAK_BF16",
           "H200_PEAK_BF16", "V5E_HBM_BW"]

V5E_PEAK_BF16 = 197e12   # TPU v5e bf16 peak FLOP/s
V5P_PEAK_BF16 = 459e12   # TPU v5p bf16 peak FLOP/s
H200_PEAK_BF16 = 990e12  # H200 SXM bf16 dense peak FLOP/s
V5E_HBM_BW = 819e9       # TPU v5e HBM bandwidth B/s


def time_chained(op: Callable, x0, *consts, iters_lo: int = 4,
                 iters_hi: int = 20, reps: int = 3) -> float:
    """Median per-call seconds for ``op`` (out shape == in shape).

    Runs ``op`` chained (output -> next input) in one jitted scan for two
    loop lengths; the difference isolates pure device time per call.

    Extra operands (weights, caches, ...) MUST be passed via ``*consts``
    (forwarded as ``op(x, *consts)``), not captured in the closure:
    closure-captured arrays become inline jit constants, and multi-GB
    constants hang the tunnel's remote compile.
    """

    def make(iters):
        @jax.jit
        def run(x, *cs):
            def body(c, _):
                return op(c, *cs), ()
            c, _ = jax.lax.scan(body, x, None, length=iters)
            return jnp.sum(c.astype(jnp.float32))
        return run

    lo, hi = make(iters_lo), make(iters_hi)
    float(lo(x0, *consts))  # compile
    float(hi(x0, *consts))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(lo(x0, *consts))
        t1 = time.perf_counter()
        float(hi(x0, *consts))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (iters_hi - iters_lo))
    ts.sort()
    return max(ts[len(ts) // 2], 1e-9)


def sink_attention_flops(B: int, H_q: int, N: int, D: int, num_sink: int,
                         window: int, n_kv: int | None = None) -> int:
    """Useful attention FLOPs: 4 * B * H * D * sum_i |attended(i)|."""
    import numpy as np
    n_kv = N if n_kv is None else n_kv
    i = np.arange(N, dtype=np.int64)
    attended = np.minimum(i + 1, num_sink + window)
    attended = np.minimum(attended, n_kv)
    return int(4 * B * H_q * D * attended.sum())
