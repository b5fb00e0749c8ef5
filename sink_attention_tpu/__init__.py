"""sink_attention_tpu: TPU-native sink flash attention framework.

A from-scratch JAX/Pallas framework with the capabilities of the reference
``sink-flash-attention`` package (Triton/CUDA), redesigned TPU-first:
Pallas (Mosaic) kernels for prefill/training and decode attention with
attention-sink + gpt-oss s_aux support, a functional rolling sink KV cache
(bf16 / INT8 / FP8), gpt-oss-style models, and mesh-parallel utilities
(SP / Ulysses / ring attention) built on jax.sharding collectives.

Top-level re-exports mirror the reference's 12-name public API
(reference sink_attention/__init__.py:15-28); see ``compat`` for the full
name-by-name mapping.  Subpackages:

- ``ops``      — Pallas kernels + eager oracle (prefill fwd/bwd, decode)
- ``cache``    — functional sink KV cache (bf16/int8/fp8) + ragged batch cache
- ``models``   — gpt-oss-style model family, HF checkpoint loader
- ``parallel`` — mesh / SP / Ulysses / ring / pipeline / train step
- ``serving``  — jitted generate loop, continuous batching engine,
                 subprocess eval harness
- ``utils``    — timing, checkpointing
- ``compat``   — mutable-API wrappers matching the reference surface
"""

__version__ = "0.1.0"

from .ops import (
    eager_sink_attention,
    sink_window_mask,
    sink_flash_attention,
    sink_flash_attention_with_lse,
    sink_flash_attention_chunk,
    merge_partials,
    eager_sink_attention_packed,
    packed_sink_window_mask,
    sink_flash_attention_packed,
    sink_decode_attention,
    sink_decode_attention_cached,
    sink_decode_attention_cached_multi,
    sink_decode_attention_ragged,
)
from .cache import SinkKVCache, RaggedSinkKVCache
from .parallel import (
    broadcast_sink_kv,
    reduce_sink_grads,
    local_position_offset,
    sp_sink_flash_attention,
    ulysses_sink_flash_attention,
    ring_sink_flash_attention,
)
from .compat import (
    SinkCacheLayer,
    SinkAttentionCache,
    SinkAttentionSPWrapper,
    prepare_sink_kv_for_sp,
    reduce_sink_kv_grads,
    get_local_position_offset,
    subprocess_generate,
)

__all__ = [
    "__version__",
    # ops
    "eager_sink_attention",
    "sink_window_mask",
    "sink_flash_attention",
    "sink_flash_attention_with_lse",
    "sink_flash_attention_chunk",
    "merge_partials",
    "eager_sink_attention_packed",
    "packed_sink_window_mask",
    "sink_flash_attention_packed",
    "sink_decode_attention",
    "sink_decode_attention_cached",
    "sink_decode_attention_cached_multi",
    "sink_decode_attention_ragged",
    # cache
    "SinkKVCache",
    "RaggedSinkKVCache",
    # parallel
    "broadcast_sink_kv",
    "reduce_sink_grads",
    "local_position_offset",
    "sp_sink_flash_attention",
    "ulysses_sink_flash_attention",
    "ring_sink_flash_attention",
    # reference-compat surface
    "SinkCacheLayer",
    "SinkAttentionCache",
    "SinkAttentionSPWrapper",
    "prepare_sink_kv_for_sp",
    "reduce_sink_kv_grads",
    "get_local_position_offset",
    "subprocess_generate",
]
