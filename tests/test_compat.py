"""Reference-API compat layer tests (mutable cache wrappers, SP wrapper)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sink_attention_tpu.compat import (
    SinkAttentionCache,
    SinkCacheLayer,
    sink_decode_attention,
    sink_flash_attention,
)
from sink_attention_tpu.ops import eager_sink_attention


def token_kv(B, H, n, D, start=0):
    vals = (jnp.arange(start, start + n, dtype=jnp.float32)
            .reshape(1, 1, n, 1))
    return (jnp.broadcast_to(vals, (B, H, n, D)),
            jnp.broadcast_to(vals + 0.5, (B, H, n, D)))


def test_cache_layer_reference_semantics():
    layer = SinkCacheLayer(num_sink=2, window_size=4)
    k, v = token_kv(1, 2, 6, 8)
    # prefill returns the FULL input KV (kernel masks) — cache.py:80-127
    k_out, v_out = layer.update(k, v)
    assert k_out.shape == (1, 2, 6, 8)
    np.testing.assert_array_equal(np.asarray(k_out), np.asarray(k))
    assert layer.get_seq_length() == 6  # 2 sink + 4 window
    # decode returns linearized [sink | window]
    k1, v1 = token_kv(1, 2, 1, 8, start=6)
    k_out, v_out = layer.update(k1, v1)
    assert k_out.shape == (1, 2, 6, 8)
    np.testing.assert_array_equal(
        np.asarray(k_out)[0, 0, :, 0], [0, 1, 3, 4, 5, 6])
    assert layer.seen_tokens == 7


def test_multilayer_cache_and_generate_flow():
    cache = SinkAttentionCache(num_sink=2, window_size=8)
    B, H_q, H_kv, D = 1, 4, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    k = jax.random.normal(ks[0], (B, H_kv, 12, D))
    v = jax.random.normal(ks[1], (B, H_kv, 12, D))
    s_aux = jax.random.normal(ks[2], (H_q,))

    # layer 0 prefill: run the prefill kernel over the returned full KV
    k_full, v_full = cache.update(k, v, layer_idx=0)
    q = jax.random.normal(ks[3], (B, H_q, 12, D))
    out = sink_flash_attention(q, k_full, v_full, num_sink=2, window_size=8,
                               s_aux=s_aux)
    ref = eager_sink_attention(q, k, v, num_sink=2, window_size=8,
                               s_aux=s_aux)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-3)

    # decode step over the evicted cache (no mask needed)
    k1 = jax.random.normal(ks[4], (B, H_kv, 1, D))
    v1 = jax.random.normal(ks[5], (B, H_kv, 1, D))
    k_kv, v_kv = cache.update(k1, v1, layer_idx=0)
    q1 = jax.random.normal(ks[6], (B, H_q, 1, D))
    out1 = sink_decode_attention(q1, k_kv, v_kv, s_aux=s_aux)
    full_k = jnp.concatenate([k, k1], axis=2)
    full_v = jnp.concatenate([v, v1], axis=2)
    ref1 = eager_sink_attention(q1, full_k, full_v, num_sink=2,
                                window_size=8, s_aux=s_aux, q_offset=12)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1), atol=1e-4,
                               rtol=1e-3)
    assert len(cache) == 1
    assert cache.seen_tokens == 13


def test_subprocess_generate_tiny_model():
    from sink_attention_tpu.serving.subprocess_eval import subprocess_generate

    model_config = dict(vocab_size=64, hidden_size=32, num_layers=1,
                        num_heads=2, num_kv_heads=2, head_dim=16,
                        intermediate_size=16, num_experts=2,
                        experts_per_tok=1, sliding_window=8,
                        layer_types=("sliding_attention",),
                        rope_theta=10000.0, max_position_embeddings=256)
    out = subprocess_generate(
        input_ids=[[1, 2, 3, 4]], model_config=model_config,
        max_new_tokens=3, platforms=("cpu",), timeout=600)
    assert len(out) == 1 and len(out[0]) == 3
    assert all(0 <= t < 64 for t in out[0])
