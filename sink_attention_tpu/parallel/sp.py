"""Sequence parallelism for sink attention (shard_map + lax collectives).

TPU-native equivalents of the reference's torch.distributed SP utilities
(/root/reference/sink_attention/sp_utils.py:28-180):

* ``broadcast_sink_kv``   <- prepare_sink_kv_for_sp (dist.broadcast from
  rank 0, sp_utils.py:28-78) — here a masked ``psum`` over the axis, which is
  SPMD-uniform (no ragged prepend) and differentiable (its transpose is the
  sink-grad psum the reference does by hand in reduce_sink_kv_grads).
* ``reduce_sink_grads``   <- reduce_sink_kv_grads (dist.all_reduce SUM,
  sp_utils.py:81-129).
* ``local_position_offset`` <- get_local_position_offset (sp_utils.py:132-148).
* ``sp_sink_flash_attention`` <- SinkAttentionSPWrapper (sp_utils.py:151-180),
  but EXACT: unlike the reference wrapper (which attends only sink + local
  chunk, losing cross-chunk window context), this exchanges a window-sized
  halo of KV from the previous shard via ``ppermute`` and merges a separate
  sink partial by log-sum-exp, so results equal single-device attention.

All functions take an ``axis_name`` and must run inside ``shard_map`` over a
mesh axis (the JAX analog of "pass in an sp process group").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.flash import (
    merge_partials,
    sink_flash_attention_chunk,
    _round_up,
)

__all__ = [
    "broadcast_sink_kv",
    "reduce_sink_grads",
    "local_position_offset",
    "sp_sink_flash_attention",
]


def broadcast_sink_kv(k_local, v_local, num_sink: int, axis_name: str):
    """Broadcast shard 0's first ``num_sink`` KV positions to all shards.

    Returns (sink_k, sink_v): [B, H_kv, num_sink, D] on every shard.
    Differentiable: the VJP is a psum of sink grads onto shard 0 — exactly
    the reference's reduce_sink_kv_grads semantics, for free.
    """
    idx = jax.lax.axis_index(axis_name)
    mine = jnp.where(idx == 0, 1.0, 0.0).astype(k_local.dtype)
    sink_k = jax.lax.psum(k_local[:, :, :num_sink] * mine, axis_name)
    sink_v = jax.lax.psum(v_local[:, :, :num_sink] * mine, axis_name)
    return sink_k, sink_v


def reduce_sink_grads(dk_sink, dv_sink, axis_name: str):
    """All-reduce (SUM) sink-KV gradients across the SP group."""
    return (jax.lax.psum(dk_sink, axis_name),
            jax.lax.psum(dv_sink, axis_name))


def local_position_offset(n_local: int, axis_name: str):
    """Global position of this shard's first token."""
    return jax.lax.axis_index(axis_name) * n_local


def sp_sink_flash_attention(q_local, k_local, v_local, num_sink: int = 4,
                            window_size: int = 512, s_aux=None,
                            axis_name: str = "seq",
                            interpret: Optional[bool] = None):
    """Exact sequence-parallel sink attention (forward).

    Each shard holds a contiguous [B, H, N_local, D] chunk. The computation:

      1. halo: ``ppermute`` the last (window-1) KV positions from the left
         neighbor, so window spans crossing the shard boundary are exact;
      2. local partial over [halo | local] (contiguous global positions,
         possibly starting before 0 on shard 0 — masked in-kernel);
      3. sink partial over shard 0's sink KV (broadcast via psum);
      4. log-sum-exp merge of the partials, with s_aux folded in once.

    Differentiable end-to-end: the chunk kernel's VJP folds the merge's
    lse cotangent into its delta term, and the sink broadcast's transpose
    IS the sink-grad all-reduce the reference does by hand
    (reduce_sink_kv_grads, sp_utils.py:81-129).
    """
    B, H_kv, n_local, D = k_local.shape
    n_dev = jax.lax.axis_size(axis_name)
    q_off = local_position_offset(n_local, axis_name)

    halo = _round_up(max(window_size - 1, 0), 128)
    # One-neighbor halo covers at most one shard of left context; a wider
    # window silently loses cross-shard context, so refuse at trace time.
    # ValueError, not assert: these guard EXACTNESS and must survive
    # python -O (use parallel.ring.ring_sink_flash_attention — or the
    # sharded_sink_flash_attention front door — for the refused regimes).
    if num_sink > n_local:
        raise ValueError(
            f"num_sink={num_sink} exceeds shard length {n_local}: the sink "
            "broadcast reads shard 0's first num_sink slots; use "
            "ring_sink_flash_attention (or sharded_sink_flash_attention)")
    if window_size - 1 > n_local:
        raise ValueError(
            f"window_size={window_size} exceeds shard length {n_local}: "
            "halo SP is exact only for window_size - 1 <= n_local; use "
            "ring_sink_flash_attention instead")
    halo = min(halo, n_local)  # 128-alignment may round past the shard
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    halo_k = jax.lax.ppermute(k_local[:, :, n_local - halo:], axis_name, perm)
    halo_v = jax.lax.ppermute(v_local[:, :, n_local - halo:], axis_name, perm)
    k_ext = jnp.concatenate([halo_k, k_local], axis=2)
    v_ext = jnp.concatenate([halo_v, v_local], axis=2)
    # global position of k_ext[0]; negative on shard 0 (masked in-kernel)
    kv_off = q_off - halo

    # Local partial: sink-or-window mask over the columns available locally
    # (covers sink columns that happen to live in this shard's range, i.e.
    # all of them on shard 0).
    o_loc, lse_loc = sink_flash_attention_chunk(
        q_local, k_ext, v_ext,
        jnp.stack([q_off, kv_off]).astype(jnp.int32),
        num_sink=num_sink, window_size=window_size, interpret=interpret)

    outs, lses = [o_loc], [lse_loc]
    if num_sink > 0:
        sink_k, sink_v = broadcast_sink_kv(k_local, v_local, num_sink,
                                           axis_name)
        # Sink partial: ONLY the sink columns strictly below the local
        # partial's coverage (col_hi clip) — exact partition, no double
        # counting. On shard 0 col_hi = 0 and this contributes nothing.
        col_hi = jnp.maximum(kv_off, 0)
        o_s, lse_s = sink_flash_attention_chunk(
            q_local, sink_k, sink_v,
            jnp.stack([q_off, jnp.zeros_like(q_off),
                       col_hi]).astype(jnp.int32),
            num_sink=num_sink, window_size=1, interpret=interpret)
        outs.append(o_s)
        lses.append(lse_s)

    out, _ = merge_partials(outs, lses, s_aux=s_aux)
    return out.astype(q_local.dtype)
