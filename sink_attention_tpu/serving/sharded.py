"""Tensor-sharded serving: TP generation over a device mesh.

The BASELINE north star asks for "tensor-sharded weights + KV across a
multi-host slice" — gpt-oss-20b does not fit one v5e chip in bf16. This
module serves a model whose weights AND KV caches are sharded over the
mesh's ``model`` axis, reusing the training TP layout
(``parallel.train.param_shardings``):

* q/k/v projections shard their output (head) dim, o_proj its input dim,
  experts shard the expert dim — XLA inserts the TP all-reduces in the
  dense layers.
* Attention (prefill and decode) runs in ``shard_map`` islands: each
  device executes the Pallas kernel over its local H/tp heads (GQA groups
  stay device-local because H_q and H_kv shard by the same factor), so no
  attention communication at all.
* The sink KV cache shards over its head axis — leaf-wise specs
  ``[B, H_kv/tp, S, D]``; cache append partitions trivially (the write
  index is head-independent).

The reference package has no multi-GPU serving path (its SP utilities are
training-only — sp_utils.py); this is TPU-build-only capability.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..models.model import forward_prefill, make_caches
from ..ops import sink_decode_attention_cached, sink_flash_attention
from ..parallel.train import param_shardings

__all__ = ["make_sharded_generate"]


def _cache_specs(cache, model_axis: str):
    """Leaf-wise PartitionSpecs for a SinkKVCache: shard the head axis of
    k/v/scales ([B, H_kv, ...]), replicate the int32 position scalars."""
    def leaf(x):
        if x.ndim >= 3:
            return P(None, model_axis, *([None] * (x.ndim - 2)))
        return P()
    return jax.tree.map(leaf, cache)


def make_sharded_generate(cfg: ModelConfig, mesh: Mesh,
                          model_axis: str = "model",
                          dtype: Any = jnp.bfloat16,
                          quant: Optional[str] = None,
                          interpret: Optional[bool] = None):
    """Build a TP-sharded greedy generation function.

    Returns ``(p_shardings, generate)`` where ``p_shardings`` is the
    NamedSharding pytree to ``jax.device_put`` the params with, and
    ``generate(params, input_ids, max_new_tokens)`` -> tokens
    [B, max_new_tokens] is jitted with those shardings.

    Requires ``num_heads % tp == 0 and num_kv_heads % tp == 0``.
    """
    tp = mesh.shape[model_axis]
    assert cfg.num_heads % tp == 0 and cfg.num_kv_heads % tp == 0, (
        cfg.num_heads, cfg.num_kv_heads, tp)
    p_sh = param_shardings(cfg, mesh, model_axis)
    qspec = P(None, model_axis, None, None)
    aux_spec = P(model_axis)

    def prefill_attn(q, k, v, *, num_sink, window_size, s_aux):
        q = jax.lax.with_sharding_constraint(q, NamedSharding(mesh, qspec))

        def island(q, k, v, a):
            return sink_flash_attention(
                q, k, v, num_sink=num_sink, window_size=window_size,
                s_aux=a, interpret=interpret)

        fn = jax.shard_map(island, mesh=mesh,
                           in_specs=(qspec, qspec, qspec, aux_spec),
                           out_specs=qspec, check_vma=False)
        return fn(q, k, v, s_aux)

    def decode_attn(q, cache, s_aux):
        cspec = _cache_specs(cache, model_axis)

        def island(q, c, a):
            return sink_decode_attention_cached(q, c, s_aux=a,
                                                interpret=interpret)

        fn = jax.shard_map(island, mesh=mesh,
                           in_specs=(qspec, cspec, aux_spec),
                           out_specs=qspec, check_vma=False)
        return fn(q, cache, s_aux)

    def generate(params, input_ids, max_new_tokens: int):
        B, N = input_ids.shape
        caches = make_caches(cfg, B, max_len=N + max_new_tokens,
                             dtype=dtype, quant=quant)
        caches = [
            jax.lax.with_sharding_constraint(
                c, jax.tree.map(lambda s: NamedSharding(mesh, s),
                                _cache_specs(c, model_axis)))
            for c in caches
        ]
        logits, caches = forward_prefill(params, cfg, input_ids, caches,
                                         attn_impl=prefill_attn,
                                         interpret=interpret)
        first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        if max_new_tokens == 1:
            return first[:, None]
        from .generate import decode_loop
        toks, _ = decode_loop(params, cfg, first, caches, start_pos=N,
                              steps=max_new_tokens - 1, interpret=interpret,
                              attn_impl=decode_attn)
        return toks

    gen = jax.jit(
        generate,
        static_argnums=2,
        in_shardings=(p_sh, NamedSharding(mesh, P())),
    )
    return p_sh, gen
