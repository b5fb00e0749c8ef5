"""Jitted generation: prefill + lax.scan decode over the sink KV cache.

Replaces the reference's HF ``model.generate()`` monkey-patch path
(/root/reference/sink_attention/generate_patch.py:131-187) with an owned,
fully-jitted loop: one compiled prefill call, then every decode step —
cache append + Pallas decode attention + MoE + sampling — inside a single
``lax.scan`` (no per-token Python dispatch).
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp

from ..cache import SinkKVCache
from ..models.config import ModelConfig
from ..models.model import forward_decode, forward_prefill, make_caches

__all__ = ["greedy_generate", "prefill_and_caches", "decode_loop"]


def prefill_and_caches(params, cfg: ModelConfig, input_ids,
                       max_new_tokens: int, dtype: Any = jnp.bfloat16,
                       quant: Optional[str] = None,
                       interpret: Optional[bool] = None):
    """Run prefill, return (next_token [B], caches)."""
    B, N = input_ids.shape
    caches = make_caches(cfg, B, max_len=N + max_new_tokens, dtype=dtype,
                         quant=quant)
    logits, caches = forward_prefill(params, cfg, input_ids, caches,
                                     interpret=interpret)
    next_tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    return next_tok, caches


def decode_loop(params, cfg: ModelConfig, first_token, caches,
                start_pos: int, steps: int,
                interpret: Optional[bool] = None):
    """Greedy lax.scan decode: returns tokens [B, steps + 1]."""

    def step(carry, _):
        caches, tok, pos = carry
        logits, caches = forward_decode(params, cfg, tok[:, None], caches,
                                        pos, interpret=interpret)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return (caches, nxt, pos + 1), nxt

    carry = (caches, first_token, jnp.int32(start_pos))
    (caches, _, _), toks = jax.lax.scan(step, carry, length=steps)
    # [B, 1 + steps]: first_token then the scanned tokens
    all_toks = jnp.concatenate([first_token[:, None], toks.T], axis=1)
    return all_toks, caches


def greedy_generate(params, cfg: ModelConfig, input_ids,
                    max_new_tokens: int, dtype: Any = jnp.bfloat16,
                    quant: Optional[str] = None,
                    interpret: Optional[bool] = None):
    """Greedy generation. input_ids [B, N] -> generated tokens
    [B, max_new_tokens]. Fully jittable (static max_new_tokens)."""
    B, N = input_ids.shape
    first, caches = prefill_and_caches(params, cfg, input_ids,
                                       max_new_tokens, dtype=dtype,
                                       quant=quant, interpret=interpret)
    if max_new_tokens == 1:
        return first[:, None]
    toks, _ = decode_loop(params, cfg, first, caches, start_pos=N,
                          steps=max_new_tokens - 1, interpret=interpret)
    return toks
