from .generate import greedy_generate, prefill_and_caches, decode_loop

__all__ = ["greedy_generate", "prefill_and_caches", "decode_loop"]
