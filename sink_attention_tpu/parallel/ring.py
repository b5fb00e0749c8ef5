"""Ring attention for sink flash attention (context parallelism).

The reference only sketches this ("broadcast sink KV once before the ring,
each step attends to [sink_kv, ring_chunk_kv]" — reference
docs/design.md:165-175; no implementation exists). Here it is implemented
with a **skip-ahead schedule**: because sink+window attention touches only
O(num_sink + window) KV per query, each device rotates through just the
``ceil((window-1)/chunk) + 1`` KV chunks its window can intersect instead
of all ``n_dev`` chunks, and the sink tokens arrive via a single masked
``psum`` broadcast (whose VJP is the sink-grad all-reduce). Per-device
work and ICI traffic are O(window/chunk), independent of sequence length —
at 128K over 32 devices with W=4096 that is 2 ring steps instead of 32.

Partials merge by log-sum-exp with s_aux folded in exactly once at the
end; the schedule is exact (tests/test_parallel.py pins parity vs the
single-device kernel, and test_ring_skip_ahead pins the step count).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.flash import merge_partials, sink_flash_attention_chunk
from .sp import broadcast_sink_kv, sp_sink_flash_attention

__all__ = ["ring_sink_flash_attention", "ring_num_steps",
           "sharded_sink_flash_attention"]


def sharded_sink_flash_attention(q_local, k_local, v_local,
                                 num_sink: int = 4, window_size: int = 512,
                                 s_aux=None, axis_name: str = "seq",
                                 interpret: Optional[bool] = None):
    """Sequence-sharded sink attention with automatic schedule choice.

    One entry point for both SP regimes (shard shapes are static, so the
    choice is made at trace time, free at runtime):

    * ``window_size - 1 <= n_local`` — **halo SP**: a single ``ppermute``
      hop moves only the (window-1)-sized halo; cheapest ICI traffic.
    * wider windows — **ring skip-ahead**: rotate whole chunks
      ``ceil((window-1)/chunk) + 1`` times. Handles window >> shard size,
      which one-hop halo SP cannot represent.

    Replaces the reference's single SP wrapper (sp_utils.py:151-180),
    which silently loses cross-chunk window context in both regimes.
    """
    n_local = k_local.shape[2]
    # halo SP also requires the sinks to live entirely on shard 0
    # (broadcast_sink_kv reads shard 0's first num_sink slots); the ring
    # path handles num_sink > n_local via its full-rotation fallback.
    if window_size - 1 <= n_local and num_sink <= n_local:
        return sp_sink_flash_attention(
            q_local, k_local, v_local, num_sink=num_sink,
            window_size=window_size, s_aux=s_aux, axis_name=axis_name,
            interpret=interpret)
    return ring_sink_flash_attention(
        q_local, k_local, v_local, num_sink=num_sink,
        window_size=window_size, s_aux=s_aux, axis_name=axis_name,
        interpret=interpret)


def ring_num_steps(n_dev: int, n_local: int, window_size: int) -> int:
    """Number of ring rotations the skip-ahead schedule performs.

    A query at the start of a chunk reaches back ``window_size - 1``
    positions, spanning at most ``ceil((window_size-1)/n_local)`` earlier
    chunks plus its own — everything further back is outside the window
    (sinks travel by broadcast, not rotation).
    """
    k = -(-max(window_size - 1, 0) // n_local) + 1
    return min(n_dev, k)


def ring_sink_flash_attention(q_local, k_local, v_local, num_sink: int = 4,
                              window_size: int = 512, s_aux=None,
                              axis_name: str = "seq",
                              interpret: Optional[bool] = None):
    """Exact ring sink attention (differentiable — trains under CP).

    Args (inside shard_map over ``axis_name``):
        q_local, k_local, v_local: [B, H, N/n_dev, D] contiguous chunks
        s_aux: full [H_q] (same on every device)

    Returns: [B, H_q, N/n_dev, D].

    Schedule (all devices uniform, SPMD):

    1. **Window phase** — ``ring_num_steps`` rotations via ``ppermute``.
       At step ``s`` device ``r`` holds global chunk ``(r - s) mod n_dev``
       and runs the offset-generalized chunk kernel with the full
       sink-or-window union mask (chunks that wrap to future positions
       are causally empty and contribute -inf partials). After the phase,
       device ``r`` has covered chunks ``max(0, r-steps+1) .. r`` — every
       chunk its window can intersect.
    2. **Sink phase** (only when the rotation was actually cut short) —
       chunk 0's first ``num_sink`` KV arrive by masked-psum broadcast
       (parallel.sp.broadcast_sink_kv) and a dedicated sink-only partial
       covers sink columns strictly below this device's window-phase
       coverage (``col_hi`` clip — the same exact-partition trick as
       sp.sp_sink_flash_attention, so nothing double-counts).
    """
    n_dev = jax.lax.axis_size(axis_name)
    r = jax.lax.axis_index(axis_name)
    n_local = q_local.shape[2]
    q_off = r * n_local
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    steps = ring_num_steps(n_dev, n_local, window_size)
    if num_sink > n_local:
        # the sink region spans multiple chunks; broadcast_sink_kv can't
        # slice it from chunk 0 alone — fall back to the full rotation
        steps = n_dev

    outs, lses = [], []
    k_cur, v_cur = k_local, v_local
    for step in range(steps):
        chunk_id = (r - step) % n_dev  # which global chunk we hold now
        kv_off = chunk_id * n_local
        # Double-buffered schedule: issue the NEXT hop's ppermute BEFORE
        # this step's chunk kernel. The permute input is (k_cur, v_cur) —
        # never the kernel output — so there is no data dependence and
        # XLA's latency-hiding scheduler overlaps the ICI transfer with
        # the attention compute (the BASELINE north star: "ring KV
        # collectives over ICI overlapped with compute"). Program order
        # here is what gives the scheduler room; tests pin the jaxpr
        # ordering (test_parallel.py::test_ring_permute_precedes_kernel).
        if step + 1 < steps:
            k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        o_p, lse_p = sink_flash_attention_chunk(
            q_local, k_cur, v_cur,
            jnp.stack([q_off, kv_off]).astype(jnp.int32),
            num_sink=num_sink, window_size=window_size, interpret=interpret)
        outs.append(o_p)
        lses.append(lse_p)
        if step + 1 < steps:
            k_cur, v_cur = k_nxt, v_nxt

    if steps < n_dev and num_sink > 0:
        sink_k, sink_v = broadcast_sink_kv(k_local, v_local, num_sink,
                                           axis_name)
        # lowest KV position the window phase covered on this device;
        # devices whose rotation reached chunk 0 get col_hi == 0 and a
        # -inf sink partial (no double counting)
        col_hi = jnp.maximum((r - steps + 1) * n_local, 0)
        o_s, lse_s = sink_flash_attention_chunk(
            q_local, sink_k, sink_v,
            jnp.stack([q_off, jnp.zeros_like(q_off),
                       col_hi]).astype(jnp.int32),
            num_sink=num_sink, window_size=1, interpret=interpret)
        outs.append(o_s)
        lses.append(lse_s)

    out, _ = merge_partials(outs, lses, s_aux=s_aux)
    return out.astype(q_local.dtype)
