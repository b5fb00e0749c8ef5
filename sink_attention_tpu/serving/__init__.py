from .generate import greedy_generate, prefill_and_caches, decode_loop
from .engine import ContinuousBatchingEngine, Request, SamplingParams

__all__ = ["greedy_generate", "prefill_and_caches", "decode_loop",
           "ContinuousBatchingEngine", "Request", "SamplingParams"]
