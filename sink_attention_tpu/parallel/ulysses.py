"""Ulysses-style sequence parallelism: all_to_all head<->sequence resharding.

The reference integrates with verl's Ulysses SP by patching the inner
attention call and slicing the per-head ``s_aux`` to the local head shard
(/root/reference/sink_attention/verl_patch.py:15-20, 134-154). Here the
all-to-alls themselves are owned: ``jax.lax.all_to_all`` over the SP axis
swaps sequence sharding for head sharding, the full-sequence Pallas kernel
runs on the local heads (static offsets — fully differentiable), and the
output is swapped back. s_aux head slicing is done by SP rank, mirroring
verl_patch.py:146-151.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.flash import sink_flash_attention

__all__ = ["ulysses_sink_flash_attention",
           "scatter_heads", "gather_heads",
           "ulysses_sink_flash_attention_packed",
           "slice_s_aux_for_rank"]


def slice_s_aux_for_rank(s_aux, h_local: int, axis_name: str):
    """Slice a full [H_total] s_aux to this SP rank's [h_local] heads.

    Mirrors the reference's Ulysses head-slicing (verl_patch.py:134-154):
    after the all-to-all, rank r owns heads [r*h_local, (r+1)*h_local).
    """
    r = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(s_aux, r * h_local, h_local, axis=0)


def scatter_heads(x, axis_name: str):
    """seq-sharded [B, H, N/sp, D] -> head-sharded [B, H/sp, N, D]."""
    return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)


def gather_heads(x, axis_name: str):
    """head-sharded [B, H/sp, N, D] -> seq-sharded [B, H, N/sp, D]."""
    return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                              tiled=True)


def ulysses_sink_flash_attention(q_local, k_local, v_local,
                                 num_sink: int = 4, window_size: int = 512,
                                 s_aux=None, axis_name: str = "seq",
                                 interpret: Optional[bool] = None):
    """Exact, differentiable SP sink attention via Ulysses all-to-alls.

    Args (inside shard_map over ``axis_name`` with sp = axis size):
        q_local: [B, H_q, N/sp, D] — sequence-sharded, all heads
        k_local, v_local: [B, H_kv, N/sp, D]
        s_aux: full [H_q] (every rank passes the same array)

    Returns: [B, H_q, N/sp, D] sequence-sharded output.

    Requires H_q % sp == 0 and H_kv % sp == 0.
    """
    sp = jax.lax.axis_size(axis_name)
    B, H_q, n_local, D = q_local.shape
    H_kv = k_local.shape[1]
    assert H_q % sp == 0 and H_kv % sp == 0, (H_q, H_kv, sp)

    q = scatter_heads(q_local, axis_name)
    k = scatter_heads(k_local, axis_name)
    v = scatter_heads(v_local, axis_name)

    aux_local = None
    if s_aux is not None:
        aux_local = slice_s_aux_for_rank(s_aux, H_q // sp, axis_name)

    out = sink_flash_attention(q, k, v, num_sink=num_sink,
                               window_size=window_size, s_aux=aux_local,
                               interpret=interpret)
    return gather_heads(out, axis_name)


def ulysses_sink_flash_attention_packed(q_local, k_local, v_local, positions,
                                        num_sink: int = 4,
                                        window_size: int = 512,
                                        s_aux=None, axis_name: str = "seq",
                                        interpret: Optional[bool] = None):
    """Ulysses SP over a PACKED (multi-segment) batch.

    Same all-to-all structure as :func:`ulysses_sink_flash_attention`; the
    local-head kernel is the packed variant, so distributed packed training
    keeps per-segment sinks/windows (the reference drops sink attention
    entirely for packed batches — verl_patch.py:73-93, and its Ulysses
    path inherits that fallback).

    ``positions``: full [B, N] segment-local positions — every rank passes
    the same (replicated) array; it is tiny (int32 per token) so no
    resharding is worth it.
    """
    from ..ops.packed import sink_flash_attention_packed

    sp = jax.lax.axis_size(axis_name)
    B, H_q, n_local, D = q_local.shape
    H_kv = k_local.shape[1]
    assert H_q % sp == 0 and H_kv % sp == 0, (H_q, H_kv, sp)
    assert positions.shape == (B, n_local * sp), positions.shape

    q = scatter_heads(q_local, axis_name)
    k = scatter_heads(k_local, axis_name)
    v = scatter_heads(v_local, axis_name)

    aux_local = None
    if s_aux is not None:
        aux_local = slice_s_aux_for_rank(s_aux, H_q // sp, axis_name)

    out = sink_flash_attention_packed(
        q, k, v, positions, num_sink=num_sink, window_size=window_size,
        s_aux=aux_local, interpret=interpret)
    return gather_heads(out, axis_name)
