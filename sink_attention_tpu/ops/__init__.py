from .reference import (eager_sink_attention, sink_window_mask,
                        eager_sink_attention_packed,
                        packed_sink_window_mask)
from .flash import (
    sink_flash_attention,
    sink_flash_attention_with_lse,
    sink_flash_attention_chunk,
    merge_partials,
)
from .packed import sink_flash_attention_packed
from .decode import (sink_decode_attention, sink_decode_attention_cached,
                     sink_decode_attention_cached_multi,
                     sink_decode_attention_ragged)

__all__ = [
    "eager_sink_attention",
    "sink_window_mask",
    "eager_sink_attention_packed",
    "packed_sink_window_mask",
    "sink_flash_attention_packed",
    "sink_flash_attention",
    "sink_flash_attention_with_lse",
    "sink_flash_attention_chunk",
    "merge_partials",
    "sink_decode_attention",
    "sink_decode_attention_cached",
    "sink_decode_attention_cached_multi",
    "sink_decode_attention_ragged",
]
