"""Eager reference ("oracle") for sink attention.

This is the single source of truth for the attention semantics implemented by
the Pallas kernels. Every kernel test compares against this module. The
semantics mirror the reference implementation's eager oracles (see
/root/reference/tests/test_sink_attention.py:15-50 and
/root/reference/tests/test_s_aux.py:16-72) but are written once, in JAX, with
fp32 math throughout.

Attention pattern for query at global position i over key at global position j:

    valid(i, j) = (j <= i) AND (j < num_sink OR j >= i - window_size + 1)

i.e. causal, always attending the first ``num_sink`` tokens (the "sink"
tokens) plus a sliding window of the last ``window_size`` tokens.

The optional ``s_aux`` (one learnable scalar per query head — the gpt-oss
"attention sink" logit) participates in the softmax as an extra logit that
absorbs probability mass but contributes no value vector:

    p_j = exp(s_j - m) / (sum_k exp(s_k - m) + exp(s_aux - m))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sink_window_mask(
    n_q: int,
    n_kv: int,
    num_sink: int,
    window_size: int,
    q_offset: int = 0,
    kv_offset: int = 0,
) -> jax.Array:
    """Boolean [n_q, n_kv] mask: True where query i may attend key j.

    ``q_offset``/``kv_offset`` translate local indices into global positions,
    enabling rectangular (chunked / ring-attention) use.
    """
    i = jnp.arange(n_q)[:, None] + q_offset
    j = jnp.arange(n_kv)[None, :] + kv_offset
    causal = j <= i
    sink = j < num_sink
    window = j >= i - window_size + 1
    return causal & (sink | window)


def eager_sink_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_sink: int = 4,
    window_size: int = 512,
    s_aux: jax.Array | None = None,
    q_offset: int = 0,
    kv_offset: int = 0,
    return_lse: bool = False,
):
    """Eager sink attention with optional per-head s_aux.

    Args:
        q: [B, H_q, N_q, D]
        k, v: [B, H_kv, N_kv, D]  (H_q % H_kv == 0; GQA/MQA supported)
        num_sink: number of always-attended leading tokens
        window_size: causal sliding-window size (window includes self)
        s_aux: optional [H_q] learnable sink logit per query head
        q_offset/kv_offset: global position offsets (for chunked attention)
        return_lse: also return the log-sum-exp [B, H_q, N_q] (fp32), where
            lse = log(sum_j exp(scaled score_j) + exp(s_aux)) over valid j.

    Returns:
        out [B, H_q, N_q, D] in q.dtype (and lse if requested).
    """
    mask = sink_window_mask(q.shape[2], k.shape[2], num_sink, window_size,
                            q_offset, kv_offset)
    return _eager_attend(q, k, v, mask[None, None], s_aux, return_lse)


def packed_sink_window_mask(positions: jax.Array, num_sink: int,
                            window_size: int) -> jax.Array:
    """Boolean [B, n, n] mask for a packed (multi-segment) batch row.

    ``positions`` [B, n] holds each token's position *within its segment*
    (resetting to 0 at every segment start). With segment starts
    ``s_i = i - positions_i`` the packed mask is

        valid(i, j) = (j <= i) AND (j >= s_i)
                      AND (j < s_i + num_sink OR j >= i - window_size + 1)

    — ``j >= s_i`` together with causality already implies same-segment
    membership (segments are contiguous), so only row-side segment starts
    are needed. This is the oracle for ``sink_flash_attention_packed``;
    the reference package has no packed support (it falls back to stock
    flash attention — /root/reference/sink_attention/verl_patch.py:73-93).
    """
    n = positions.shape[-1]
    idx = jnp.arange(n, dtype=positions.dtype)
    s = idx[None, :] - positions  # [B, n] segment starts
    i = idx[None, :, None]
    j = idx[None, None, :]
    s_i = s[:, :, None]
    causal = j <= i
    in_seg = j >= s_i
    sink = j < s_i + num_sink
    window = j >= i - window_size + 1
    return causal & in_seg & (sink | window)


def eager_sink_attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    positions: jax.Array,
    num_sink: int = 4,
    window_size: int = 512,
    s_aux: jax.Array | None = None,
    return_lse: bool = False,
):
    """Eager sink attention over a packed (multi-segment) batch.

    q: [B, H_q, N, D]; k, v: [B, H_kv, N, D]; positions: [B, N] segment-local
    token positions. Each segment gets its own sinks (its first ``num_sink``
    tokens) and its own causal sliding window; tokens never attend across
    segment boundaries.
    """
    assert q.shape[2] == k.shape[2], (q.shape, k.shape)
    mask = packed_sink_window_mask(positions, num_sink, window_size)
    return _eager_attend(q, k, v, mask[:, None], s_aux, return_lse)


def _eager_attend(q, k, v, mask, s_aux, return_lse):
    """Shared masked-softmax attention body. mask: [B|1, 1, N_q, N_kv]."""
    B, H_q, N_q, D = q.shape
    H_kv, N_kv = k.shape[1], k.shape[2]
    assert H_q % H_kv == 0, (H_q, H_kv)
    groups = H_q // H_kv

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if groups > 1:
        kf = jnp.repeat(kf, groups, axis=1)
        vf = jnp.repeat(vf, groups, axis=1)

    scale = 1.0 / (D**0.5)
    # HIGHEST so the oracle is a true fp32 reference even on TPU (where the
    # default matmul precision is bf16-based).
    scores = jnp.einsum("bhqd,bhkd->bhqk", qf * scale, kf,
                        precision=jax.lax.Precision.HIGHEST)
    neg_inf = jnp.float32(-jnp.inf)
    scores = jnp.where(mask, scores, neg_inf)

    if s_aux is not None:
        aux = s_aux.astype(jnp.float32).reshape(1, H_q, 1, 1)
        aux = jnp.broadcast_to(aux, (B, H_q, N_q, 1))
        logits = jnp.concatenate([scores, aux], axis=-1)
    else:
        logits = scores

    m = jnp.max(logits, axis=-1, keepdims=True)
    # Guard fully-masked rows (possible only when s_aux is None and a row has
    # no valid key — cannot happen for square causal attention, but can for
    # rectangular chunks).
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(logits - m_safe)
    p = jnp.where(jnp.isfinite(logits), p, 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    denom_safe = jnp.where(denom == 0.0, 1.0, denom)
    weights = p[..., :N_kv] / denom_safe  # drop the s_aux column: no value
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, vf,
                     precision=jax.lax.Precision.HIGHEST).astype(q.dtype)

    if return_lse:
        lse = (m_safe + jnp.log(denom_safe)).squeeze(-1)
        lse = jnp.where(denom.squeeze(-1) == 0.0, neg_inf, lse)
        return out, lse
    return out
