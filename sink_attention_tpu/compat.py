"""Reference API compatibility layer.

The reference exports exactly 12 names (sink_attention/__init__.py:15-28).
This module maps each to its TPU-native equivalent so users migrating from
the GPU package find every entry point:

| reference name               | here                                        |
|------------------------------|---------------------------------------------|
| sink_flash_attention         | ops.sink_flash_attention (same signature)   |
| sink_decode_attention        | ops.sink_decode_attention (same signature)  |
| SinkCacheLayer               | compat.SinkCacheLayer (mutable wrapper over |
|                              | the functional cache.SinkKVCache)           |
| SinkAttentionCache           | compat.SinkAttentionCache (multi-layer)     |

Note: unlike the reference's ``SinkAttentionCache`` (cache.py:241-330),
the class here is NOT a ``transformers.Cache`` subclass — this package is
torch-free, so HF ``isinstance`` checks do not apply; it matches the
reference cache's *behavioral* contract (update/get_kv/get_seq_length/
reorder semantics, pinned by tests/test_compat.py), not its type
hierarchy. Use models.hf_loader to bring HF checkpoints into the owned
model instead of passing this cache to ``transformers.generate``.

| prepare_sink_kv_for_sp       | parallel.broadcast_sink_kv (axis_name       |
|                              | instead of a process group)                 |
| reduce_sink_kv_grads         | parallel.reduce_sink_grads                  |
| get_local_position_offset    | parallel.local_position_offset              |
| SinkAttentionSPWrapper       | compat.SinkAttentionSPWrapper               |
| patch_verl_with_sink_attention / unpatch_verl — no monkey-patching on   |
|   TPU: the model layer is owned (models.forward_prefill uses the kernel |
|   natively). For training integration use models + parallel.train.     |
|   Packed (varlen) batches — where the reference falls back to stock    |
|   FA (verl_patch.py:73-93) — use ops.sink_flash_attention_packed.      |
| patch_for_generation / unpatch_generation — replaced by the owned      |
|   generate loop: serving.greedy_generate / prefill_and_caches.         |
| subprocess_generate          | serving.subprocess_eval.subprocess_generate |
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from .cache import SinkKVCache
from .ops import sink_decode_attention, sink_flash_attention  # re-export
from .parallel import (
    broadcast_sink_kv as prepare_sink_kv_for_sp,  # noqa: F401
    local_position_offset as get_local_position_offset,  # noqa: F401
    reduce_sink_grads as reduce_sink_kv_grads,  # noqa: F401
    sp_sink_flash_attention,
)

__all__ = [
    "sink_flash_attention",
    "sink_decode_attention",
    "SinkCacheLayer",
    "SinkAttentionCache",
    "prepare_sink_kv_for_sp",
    "reduce_sink_kv_grads",
    "get_local_position_offset",
    "SinkAttentionSPWrapper",
    "subprocess_generate",
]


class SinkCacheLayer:
    """Mutable-API wrapper over the functional ``SinkKVCache``.

    Mirrors the reference per-layer cache (cache.py:29-238): ``update``
    mutates internal state and returns KV for attention (prefill returns the
    full input KV — the prefill kernel masks; decode returns the linearized
    [sink | window] KV). For jit/scan code use ``SinkKVCache`` directly.
    """

    def __init__(self, num_sink: int, window_size: int,
                 quant: Optional[str] = None):
        self.num_sink = num_sink
        self.window_size = window_size
        self.quant = quant
        self._cache: Optional[SinkKVCache] = None

    @property
    def is_initialized(self) -> bool:
        return self._cache is not None

    def _lazy_init(self, k):
        B, H_kv, _, D = k.shape
        self._cache = SinkKVCache.init(
            B, H_kv, D, num_sink=self.num_sink,
            window_size=self.window_size, dtype=k.dtype, quant=self.quant)
        self._head_dim = D

    def update(self, key_states, value_states, cache_kwargs=None):
        if self._cache is None:
            self._lazy_init(key_states)
        n_new = key_states.shape[2]
        if not bool(self._cache.seen > 0):  # prefill
            self._cache = self._cache.prefill(key_states, value_states)
            return key_states, value_states  # kernel masks during prefill
        if n_new == 1:
            self._cache = self._cache.append(key_states, value_states)
        else:  # multi-token decode (speculative)
            self._cache = self._cache.append_many(key_states, value_states)
        return self.get_kv()

    def get_kv(self) -> Tuple[jax.Array, jax.Array]:
        return self._cache.linearized_kv(head_dim=self._head_dim)

    def get_seq_length(self) -> int:
        return 0 if self._cache is None else int(self._cache.get_seq_length())

    def get_mask_sizes(self, cache_position=None) -> Tuple[int, int]:
        return self.get_seq_length(), 0

    def get_max_cache_shape(self) -> int:
        return self.num_sink + self.window_size

    @property
    def seen_tokens(self) -> int:
        return 0 if self._cache is None else int(self._cache.seen)

    def reorder_cache(self, beam_idx):
        if self._cache is not None:
            self._cache = self._cache.reorder(jnp.asarray(beam_idx))

    @property
    def functional(self) -> Optional[SinkKVCache]:
        return self._cache


class SinkAttentionCache:
    """Multi-layer mutable cache (reference cache.py:241-330)."""

    def __init__(self, num_sink: int = 4, window_size: int = 4096,
                 quant: Optional[str] = None):
        self.num_sink = num_sink
        self.window_size = window_size
        self.quant = quant
        self.layers: List[SinkCacheLayer] = []

    def __len__(self):
        return len(self.layers)

    def __getitem__(self, idx):
        return self.layers[idx]

    def __repr__(self):
        return (f"SinkAttentionCache(num_sink={self.num_sink}, "
                f"window_size={self.window_size}, layers={len(self.layers)}, "
                f"seen_tokens={self.seen_tokens})")

    def update(self, key_states, value_states, layer_idx: int,
               cache_kwargs=None):
        while len(self.layers) <= layer_idx:
            self.layers.append(SinkCacheLayer(
                self.num_sink, self.window_size, self.quant))
        return self.layers[layer_idx].update(key_states, value_states,
                                             cache_kwargs)

    def get_seq_length(self, layer_idx: int = 0) -> int:
        if layer_idx < len(self.layers):
            return self.layers[layer_idx].get_seq_length()
        return 0

    def get_max_cache_length(self) -> int:
        return self.num_sink + self.window_size

    def reorder_cache(self, beam_idx):
        for layer in self.layers:
            layer.reorder_cache(beam_idx)

    @property
    def seen_tokens(self) -> int:
        return self.layers[0].seen_tokens if self.layers else 0


class SinkAttentionSPWrapper:
    """Reference sp_utils.py:151-180 analog: SP attention as a callable.

    Unlike the reference wrapper (which only broadcasts sinks and never
    reduces sink grads — sp_utils.py:167-180 leaves that to the caller),
    this wraps the exact halo-based SP attention; gradient reduction is
    inherent to the psum-broadcast formulation.
    """

    def __init__(self, num_sink: int = 4, window_size: int = 512,
                 axis_name: str = "seq"):
        self.num_sink = num_sink
        self.window_size = window_size
        self.axis_name = axis_name

    def __call__(self, q, k, v, s_aux=None):
        return sp_sink_flash_attention(
            q, k, v, num_sink=self.num_sink, window_size=self.window_size,
            s_aux=s_aux, axis_name=self.axis_name)


def subprocess_generate(*args, **kwargs):
    from .serving.subprocess_eval import subprocess_generate as _impl
    return _impl(*args, **kwargs)
