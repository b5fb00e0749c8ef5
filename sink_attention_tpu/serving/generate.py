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

__all__ = ["greedy_generate", "beam_generate", "speculative_generate",
           "prefill_and_caches", "decode_loop"]


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
                interpret: Optional[bool] = None, attn_impl=None):
    """Greedy lax.scan decode: returns tokens [B, steps + 1].

    ``attn_impl(q, cache, s_aux)`` overrides the decode attention (e.g.
    the shard_map island used by serving.sharded).
    """

    def step(carry, _):
        caches, tok, pos = carry
        logits, caches = forward_decode(params, cfg, tok[:, None], caches,
                                        pos, interpret=interpret,
                                        attn_impl=attn_impl)
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
                  eos_id: Optional[int] = None,
                  pad_id: int = 0,
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
    flattened into the cache batch dim (B * num_beams slots).

    With ``eos_id`` set, a beam that emits EOS is *frozen*: its score
    stops accumulating (it competes as a completed hypothesis), it only
    "extends" with ``pad_id``, its cache slot is its own identity in the
    reorder gather, and its length is pinned for the final HF-style
    ``score / len**length_penalty`` normalization. Without ``eos_id`` the
    behavior is unchanged (all beams run max_new_tokens).

    EOS semantics deliberately diverge from HF's ``BeamSearchScorer``:
    finished hypotheses compete **in-slot** among the K live beams (no
    separate banked-hypothesis pool drawing from 2K candidates), so a
    completed hypothesis can be evicted by K transiently higher-scoring
    live beams. This keeps the whole search a fixed-shape device loop —
    no host-side pool — at the cost of occasionally returning a worse
    hypothesis than HF would in that (rare) crossing pattern.

    Loop mechanics: a ``lax.while_loop`` (not a fixed-length scan) that
    exits as soon as EVERY beam is frozen, and a ``lax.cond`` that skips
    the per-layer cache reorder whenever the beam->slot permutation is
    the identity — the steady state once beams stabilize or freeze — so
    a search that finishes early costs no further decode steps at all.

    Design note (round 5): a permutation-composed variant — a
    slot_of_beam indirection so injective selections update [B, K]
    metadata instead of moving cache rows, with physical copies only on
    true branch duplication — was implemented and measured SLOWER at the
    bench scale (K=8: 82 -> 105 ms for 128 tokens; K=32: tie), because
    the identity-skip already covers the steady state and the
    indirection's always-on routing (inverse-permutation token scatter,
    beam-indexed logit gather, claim/orphan bookkeeping) costs more per
    step than the occasional small-cache reorder it avoids. At K*B=32
    the beam loop runs within ~1.5x of an EQUAL-BATCH greedy decode
    (bench `beam` rows) — the residual vs B=1 greedy is batch width, not
    reorder. Revisit indirection only if profiles show reorder dominating
    at production cache sizes (W >= 4K, H_kv >= 8).
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
    if eos_id is not None:
        finished0 = beam_tok == eos_id
    else:
        finished0 = jnp.zeros((B, K), bool)

    def tile_beams(x):
        # [B, ...] -> [B*K, ...] (beam-major within each row)
        return jnp.repeat(x, K, axis=0)

    caches = [jax.tree.map(
        lambda l: tile_beams(l) if getattr(l, "ndim", 0) >= 1 else l, c)
        for c in caches]

    # a frozen beam's only candidate: pad_id at logp 0 (score unchanged)
    frozen_logp = jnp.full((V,), -jnp.inf, jnp.float32).at[pad_id].set(0.0)

    def step(carry):
        caches, toks, scores, pos, seqs, fin, glen, t = carry
        # toks: [B*K]; scores/fin/glen: [B, K]; seqs: [B, K, T]
        logits, caches = forward_decode(params, cfg, toks[:, None], caches,
                                        pos, interpret=interpret)
        logp = jax.nn.log_softmax(
            logits[:, -1].astype(jnp.float32), -1).reshape(B, K, V)
        if eos_id is not None:
            logp = jnp.where(fin[..., None], frozen_logp[None, None], logp)
        cand = scores[..., None] + logp               # [B, K, V]
        flat = cand.reshape(B, K * V)
        new_scores, flat_idx = jax.lax.top_k(flat, K)  # [B, K]
        src_beam = (flat_idx // V).astype(jnp.int32)   # [B, K]
        new_tok = (flat_idx % V).astype(jnp.int32)     # [B, K]
        was_fin = jnp.take_along_axis(fin, src_beam, axis=1)
        if eos_id is not None:
            new_fin = was_fin | (new_tok == eos_id)
            new_tok = jnp.where(was_fin, pad_id, new_tok)
        else:
            new_fin = was_fin
        glen = jnp.take_along_axis(glen, src_beam, axis=1) + jnp.where(
            was_fin, 0, 1)
        # reorder caches and histories by source beam (flattened indices).
        # The reorder moves every layer's KV rows, so skip it outright
        # when the permutation is the identity (each beam extends itself
        # — the steady state once beams stabilize, and always true once
        # all beams are frozen).
        gather_idx = (jnp.arange(B, dtype=jnp.int32)[:, None] * K +
                      src_beam).reshape(-1)            # [B*K]
        identity = jnp.all(src_beam ==
                           jnp.arange(K, dtype=jnp.int32)[None, :])
        caches = jax.lax.cond(
            identity, lambda cs: cs,
            lambda cs: [c.reorder(gather_idx) for c in cs], caches)
        seqs = jnp.take_along_axis(seqs, src_beam[..., None], axis=1)
        seqs = jax.lax.dynamic_update_index_in_dim(
            seqs, new_tok, t, axis=2)
        return (caches, new_tok.reshape(-1), new_scores, pos + 1, seqs,
                new_fin, glen, t + 1)

    # pad_id-filled so an early exit (all beams frozen) leaves the tail
    # of every sequence at pad, exactly as the frozen extensions would
    seqs0 = jnp.full((B, K, max_new_tokens), pad_id, jnp.int32)
    seqs0 = jax.lax.dynamic_update_index_in_dim(seqs0, beam_tok, 0, axis=2)
    glen0 = jnp.ones((B, K), jnp.int32)
    carry = (caches, beam_tok.reshape(-1), beam_scores, jnp.int32(N), seqs0,
             finished0, glen0, jnp.int32(1))

    def keep_going(carry):
        fin, t = carry[5], carry[7]
        return jnp.logical_and(t < max_new_tokens, ~jnp.all(fin))

    if max_new_tokens > 1:
        (caches, _, beam_scores, _, seqs, _, glen, _) = jax.lax.while_loop(
            keep_going, step, carry)
    else:
        seqs, glen = seqs0, glen0
    final = beam_scores / (glen.astype(jnp.float32) ** length_penalty)
    best = jnp.argmax(final, axis=1)                   # [B]
    best_seq = jnp.take_along_axis(
        seqs, best[:, None, None], axis=1)[:, 0]       # [B, T]
    best_score = jnp.take_along_axis(final, best[:, None], axis=1)[:, 0]
    return best_seq, best_score


def speculative_generate(params_target, params_draft, cfg_target, cfg_draft,
                         input_ids, max_new_tokens: int,
                         num_draft_tokens: int = 4,
                         dtype: Any = jnp.bfloat16,
                         quant: Optional[str] = None,
                         interpret: Optional[bool] = None):
    """Greedy speculative decoding, fully on-device (zero host syncs).

    Each round, inside one ``lax.while_loop`` iteration:

    1. the draft model proposes ``num_draft_tokens`` greedily via
       ``lax.scan`` (small-model decode steps on a throwaway fork of the
       immutable draft cache);
    2. the target verifies the whole draft in ONE fused multi-token
       attention call (``ops.sink_decode_attention_cached_multi``) against
       the PRE-append cache;
    3. the accepted prefix length ``n_acc`` (longest match with the
       target's own greedy choices) is a cumprod reduce, and commitment is
       ``SinkKVCache.append_many_counted`` — the verification KVs are
       written with the ring state advanced by only ``n_acc + 1``, so
       rejecting tokens costs four scalar selects per token instead of
       the re-append target pass the old host-driven version paid;
    4. the draft cache commits the SAME accepted tokens at zero model
       cost: the proposal scan already produced their per-layer KVs
       (``forward_decode(collect_kv=True)``) — for every committed index
       the proposal input equals the accepted input, so those KVs are
       re-committed via ``append_many_counted`` and the draft never runs
       a second pass.

    Output is IDENTICAL to target-only greedy decoding — the draft only
    changes how many target passes are needed. Exactly one target pass per
    round, so the returned acceptance rate (emitted tokens per target
    pass) is also the target-pass speedup factor. (Parity caveat shared
    with every speculative scheme: the verification forward uses the fused
    multi-token attention while plain decode uses the single-token kernel;
    in bf16, logit near-ties can argmax differently between the two, and
    either choice is then a valid greedy continuation. In fp32 /
    ``jax.default_matmul_precision('highest')`` parity is exact.)

    The reference supports the *cache* side of this (multi-token append,
    cache.py:176-183) but has no speculative loop. Returns
    (tokens [B, max_new_tokens], acceptance_rate [scalar]).
    """
    from ..models.model import (forward_decode, forward_prefill,
                                forward_verify, make_caches)

    B, N = input_ids.shape
    assert B == 1, "speculative loop is per-sequence (B=1)"
    K = min(num_draft_tokens, max_new_tokens)
    buf_len = max_new_tokens + K  # rounds may overshoot; sliced at the end
    tcaches = make_caches(cfg_target, B, N + buf_len, dtype=dtype,
                          quant=quant)
    dcaches = make_caches(cfg_draft, B, N + buf_len, dtype=dtype,
                          quant=quant)
    tlogits, tcaches = forward_prefill(params_target, cfg_target, input_ids,
                                       tcaches, interpret=interpret)
    _, dcaches = forward_prefill(params_draft, cfg_draft, input_ids,
                                 dcaches, interpret=interpret)
    first = jnp.argmax(tlogits[:, -1], axis=-1).astype(jnp.int32)  # [B]

    if max_new_tokens == 1:
        return first[:, None], jnp.float32(1.0)

    def round_body(carry):
        tcaches, dcaches, tok, pos, emitted, out_buf, rounds = carry

        # 1. draft proposes K tokens, emitting each step's per-layer KV —
        # the commit in step 4 reuses these (for i <= n_acc the proposal
        # inputs ARE the accepted inputs), so the draft never runs twice
        def dstep(c, _):
            dc, cur, p = c
            dl, dc, kvs = forward_decode(params_draft, cfg_draft,
                                         cur[:, None], dc, p,
                                         interpret=interpret,
                                         collect_kv=True)
            nxt = jnp.argmax(dl[:, -1], axis=-1).astype(jnp.int32)
            return (dc, nxt, p + 1), (nxt, kvs)

        _, (draft_kb, dkvs) = jax.lax.scan(dstep, (dcaches, tok, pos),
                                           length=K)
        draft = draft_kb[:, 0]  # [K] (B == 1)

        # 2. target verifies [tok, draft[:-1]] in one multi-token pass
        inputs = jnp.concatenate([tok, draft[:K - 1]])[None]  # [1, K]
        vlogits, tkvs = forward_verify(params_target, cfg_target, inputs,
                                       tcaches, pos)
        greedy = jnp.argmax(vlogits[0], axis=-1).astype(jnp.int32)  # [K]

        # 3. longest accepted prefix + one free token from verification
        if K > 1:
            eq = (greedy[:K - 1] == draft[:K - 1]).astype(jnp.int32)
            n_acc = jnp.sum(jnp.cumprod(eq))
        else:
            n_acc = jnp.int32(0)
        count = n_acc + 1
        idx = jnp.arange(K, dtype=jnp.int32)
        accepted = jnp.where(idx < n_acc, draft,
                             greedy[jnp.minimum(n_acc, K - 1)])  # [K]
        tcaches = [c.append_many_counted(k, v, count)
                   for c, (k, v) in zip(tcaches, tkvs)]

        # 4. draft commit: the proposal scan's own KVs, ring state advanced
        # by count. Committed inputs [tok, accepted[:n_acc]] equal the
        # proposal inputs [tok, draft[:n_acc]] elementwise (accepted ==
        # draft below n_acc), and slots past count are never readable, so
        # this is exactly the old second-draft-pass commit for free.
        dcaches = [c.append_many_counted(
            jnp.moveaxis(k[:, :, :, 0, :], 0, 2),   # [K,B,H,1,D]->[B,H,K,D]
            jnp.moveaxis(v[:, :, :, 0, :], 0, 2), count)
            for c, (k, v) in zip(dcaches, dkvs)]

        out_buf = jax.lax.dynamic_update_slice(out_buf, accepted, (emitted,))
        tok = accepted[jnp.minimum(n_acc, K - 1)][None]
        return (tcaches, dcaches, tok, pos + count, emitted + count,
                out_buf, rounds + 1)

    def cond(carry):
        return carry[4] < max_new_tokens - 1

    out_buf = jnp.zeros((buf_len,), jnp.int32)
    carry = (tcaches, dcaches, first, jnp.int32(N), jnp.int32(0), out_buf,
             jnp.int32(0))
    carry = jax.lax.while_loop(cond, round_body, carry)
    _, _, _, _, emitted, out_buf, rounds = carry
    toks = jnp.concatenate([first, out_buf[:max_new_tokens - 1]])[None]
    rate = emitted.astype(jnp.float32) / jnp.maximum(rounds, 1)
    return toks, rate


