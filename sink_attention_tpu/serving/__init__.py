from .generate import (greedy_generate, beam_generate,
                       speculative_generate,
                       prefill_and_caches, decode_loop)
from .engine import ContinuousBatchingEngine, Request, SamplingParams
from .sharded import make_sharded_generate

__all__ = ["greedy_generate", "beam_generate", "speculative_generate",
           "prefill_and_caches",
           "decode_loop",
           "ContinuousBatchingEngine", "Request", "SamplingParams",
           "make_sharded_generate"]
