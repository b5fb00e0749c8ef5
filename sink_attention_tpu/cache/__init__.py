from .sink_cache import SinkKVCache, quantize, dequantize

__all__ = ["SinkKVCache", "quantize", "dequantize"]
