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

__all__ = ["greedy_generate", "beam_generate", "prefill_and_caches",
           "decode_loop"]


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


def beam_generate(params, cfg: ModelConfig, input_ids,
                  max_new_tokens: int, num_beams: int = 4,
                  length_penalty: float = 1.0,
                  dtype: Any = jnp.bfloat16,
                  quant: Optional[str] = None,
                  interpret: Optional[bool] = None):
    """Beam-search generation over the rolling sink cache.

    The reference supports beam search only through HF ``generate()`` +
    ``reorder_cache`` (cache.py:230-238); this is the owned, fully-jitted
    equivalent: the whole search — decode step, beam scoring, cache
    reorder by beam origin — runs inside one ``lax.scan``.

    input_ids: [B, N] -> (tokens [B, max_new_tokens], scores [B]) of the
    best beam per batch row (greedy-equivalent at num_beams=1). Beams are
    flattened into the cache batch dim (B * num_beams slots); finished
    beams are not frozen early (no EOS) — scores use ``length_penalty``
    a la HF (sum logp / T**length_penalty).
    """
    B, N = input_ids.shape
    V = cfg.vocab_size
    K = num_beams

    # prefill each row once, then tile state across beams
    caches = make_caches(cfg, B, max_len=N + max_new_tokens, dtype=dtype,
                         quant=quant)
    logits, caches = forward_prefill(params, cfg, input_ids, caches,
                                     interpret=interpret)
    logp0 = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), -1)  # [B,V]
    top0 = jax.lax.top_k(logp0, K)  # values [B,K], ids [B,K]
    beam_scores = top0[0]                      # [B, K]
    beam_tok = top0[1].astype(jnp.int32)       # [B, K]

    def tile_beams(x):
        # [B, ...] -> [B*K, ...] (beam-major within each row)
        return jnp.repeat(x, K, axis=0)

    caches = [jax.tree.map(
        lambda l: tile_beams(l) if getattr(l, "ndim", 0) >= 1 else l, c)
        for c in caches]

    def step(carry, _):
        caches, toks, scores, pos, seqs, t = carry
        # toks: [B*K]; scores: [B, K]; seqs: [B, K, max_new_tokens]
        logits, caches = forward_decode(params, cfg, toks[:, None], caches,
                                        pos, interpret=interpret)
        logp = jax.nn.log_softmax(
            logits[:, -1].astype(jnp.float32), -1).reshape(B, K, V)
        cand = scores[..., None] + logp               # [B, K, V]
        flat = cand.reshape(B, K * V)
        new_scores, flat_idx = jax.lax.top_k(flat, K)  # [B, K]
        src_beam = (flat_idx // V).astype(jnp.int32)   # [B, K]
        new_tok = (flat_idx % V).astype(jnp.int32)     # [B, K]
        # reorder caches and histories by source beam (flattened indices)
        gather_idx = (jnp.arange(B, dtype=jnp.int32)[:, None] * K +
                      src_beam).reshape(-1)            # [B*K]
        caches = [c.reorder(gather_idx) for c in caches]
        seqs = jnp.take_along_axis(seqs, src_beam[..., None], axis=1)
        seqs = jax.lax.dynamic_update_index_in_dim(
            seqs, new_tok, t, axis=2)
        return ((caches, new_tok.reshape(-1), new_scores, pos + 1, seqs,
                 t + 1), None)

    seqs0 = jnp.zeros((B, K, max_new_tokens), jnp.int32)
    seqs0 = jax.lax.dynamic_update_index_in_dim(seqs0, beam_tok, 0, axis=2)
    carry = (caches, beam_tok.reshape(-1), beam_scores, jnp.int32(N), seqs0,
             jnp.int32(1))
    if max_new_tokens > 1:
        (caches, _, beam_scores, _, seqs, _), _ = jax.lax.scan(
            step, carry, length=max_new_tokens - 1)
    else:
        seqs = seqs0
    final = beam_scores / (float(max_new_tokens) ** length_penalty)
    best = jnp.argmax(final, axis=1)                   # [B]
    best_seq = jnp.take_along_axis(
        seqs, best[:, None, None], axis=1)[:, 0]       # [B, T]
    best_score = jnp.take_along_axis(final, best[:, None], axis=1)[:, 0]
    return best_seq, best_score
