from .sink_cache import SinkKVCache, quantize, dequantize
from .ragged import RaggedSinkKVCache

__all__ = ["SinkKVCache", "RaggedSinkKVCache", "quantize", "dequantize"]
