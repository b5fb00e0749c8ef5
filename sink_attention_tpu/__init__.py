"""sink_attention_tpu: TPU-native sink flash attention framework.

A from-scratch JAX/Pallas framework with the capabilities of the reference
``sink-flash-attention`` package (Triton/CUDA), redesigned TPU-first:
Pallas (Mosaic) kernels for prefill/training and decode attention with
attention-sink + gpt-oss s_aux support, a functional rolling sink KV cache
(bf16 / INT8 / FP8), gpt-oss-style models, and mesh-parallel utilities
(SP / Ulysses / ring attention) built on jax.sharding collectives.
"""

__version__ = "0.1.0"

from .ops import (
    eager_sink_attention,
    sink_window_mask,
    sink_flash_attention,
    sink_flash_attention_with_lse,
    sink_flash_attention_chunk,
    merge_partials,
)

__all__ = [
    "__version__",
    "eager_sink_attention",
    "sink_window_mask",
    "sink_flash_attention",
    "sink_flash_attention_with_lse",
    "sink_flash_attention_chunk",
    "merge_partials",
]
