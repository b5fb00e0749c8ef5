"""Ring attention for sink flash attention (context parallelism).

The reference only sketches this ("broadcast sink KV once before the ring,
each step attends to [sink_kv, ring_chunk_kv]" — reference
docs/design.md:165-175; no implementation exists). Here it is implemented:
KV chunks rotate around the mesh axis via ``ppermute`` while each device
accumulates online-softmax partials (out, lse) from the offset-generalized
Pallas kernel; partials merge by log-sum-exp, with s_aux folded in exactly
once at the end.

The sink tokens need no separate broadcast: they live in chunk 0, which
visits every device during the rotation, and the kernel's two-range
iteration picks them up via ``num_sink`` whenever kv_offset == 0.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.flash import merge_partials, sink_flash_attention_chunk

__all__ = ["ring_sink_flash_attention"]


def ring_sink_flash_attention(q_local, k_local, v_local, num_sink: int = 4,
                              window_size: int = 512, s_aux=None,
                              axis_name: str = "seq",
                              interpret: Optional[bool] = None):
    """Exact ring sink attention (differentiable — trains under CP).

    Args (inside shard_map over ``axis_name``):
        q_local, k_local, v_local: [B, H, N/n_dev, D] contiguous chunks
        s_aux: full [H_q] (same on every device)

    Returns: [B, H_q, N/n_dev, D].

    Every device sees every KV chunk once; chunks whose block ranges are
    empty for this device's queries cost only masked grid steps. A
    skip-ahead schedule (sending the gap region past idle devices) is a
    later-round optimization.
    """
    n_dev = jax.lax.axis_size(axis_name)
    r = jax.lax.axis_index(axis_name)
    n_local = q_local.shape[2]
    q_off = r * n_local
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    outs, lses = [], []
    k_cur, v_cur = k_local, v_local
    for step in range(n_dev):
        chunk_id = (r - step) % n_dev  # which global chunk we hold now
        kv_off = chunk_id * n_local
        o_p, lse_p = sink_flash_attention_chunk(
            q_local, k_cur, v_cur,
            jnp.stack([q_off, kv_off]).astype(jnp.int32),
            num_sink=num_sink, window_size=window_size, interpret=interpret)
        outs.append(o_p)
        lses.append(lse_p)
        if step + 1 < n_dev:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)

    out, _ = merge_partials(outs, lses, s_aux=s_aux)
    return out.astype(q_local.dtype)
