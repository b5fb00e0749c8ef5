"""Decode kernel tests: parity vs oracle, GQA, s_aux, cache composition.

Mirrors /root/reference/tests/test_decode_kernel.py (plain-KV decode parity,
s_aux absorption, GQA, non-aligned N_kv) and the composition tests of
/root/reference/tests/test_inference.py:116-199 (multi-step decode with
eviction equals the last row of full eager attention) — plus quantized-cache
accuracy, which the reference does not have.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sink_attention_tpu.cache import SinkKVCache
from sink_attention_tpu.ops import (
    eager_sink_attention,
    sink_decode_attention,
    sink_decode_attention_cached,
)


def fp32_tol():
    return 5e-3 if jax.default_backend() == "tpu" else 1e-5


@pytest.mark.parametrize("cfg", [
    # (B, H_q, H_kv, N_kv, D, use_aux)
    (1, 4, 4, 128, 64, False),
    (1, 4, 4, 300, 64, True),     # non-block-aligned N_kv
    (2, 8, 2, 512, 128, True),    # GQA 4:1
    (1, 8, 1, 256, 128, True),    # MQA
    (1, 8, 2, 448, 80, True),     # head_dim 80
])
def test_decode_matches_oracle(cfg):
    B, H_q, H_kv, N_kv, D, use_aux = cfg
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H_q, 1, D))
    k = jax.random.normal(ks[1], (B, H_kv, N_kv, D))
    v = jax.random.normal(ks[2], (B, H_kv, N_kv, D))
    s_aux = jax.random.normal(ks[3], (H_q,)) if use_aux else None

    out = sink_decode_attention(q, k, v, s_aux=s_aux)
    # oracle: all KV attended == causal last row with full window
    ref = eager_sink_attention(q, k, v, num_sink=0, window_size=N_kv,
                               s_aux=s_aux, q_offset=N_kv - 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=fp32_tol(), rtol=1e-3)


def test_s_aux_zero_vs_none():
    """s_aux=0 must differ from s_aux=None (it adds exp(0)=1 to the
    denominator) — reference test_decode_kernel.py behavior."""
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (1, 2, 1, 64))
    k = jax.random.normal(ks[1], (1, 2, 64, 64))
    v = jax.random.normal(ks[2], (1, 2, 64, 64))
    a = sink_decode_attention(q, k, v, s_aux=None)
    b = sink_decode_attention(q, k, v, s_aux=jnp.zeros((2,)))
    assert float(jnp.max(jnp.abs(a - b))) > 1e-4
    # and large negative s_aux ~ None
    c = sink_decode_attention(q, k, v, s_aux=jnp.full((2,), -30.0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                               atol=5e-4 if jax.default_backend() == "tpu"
                               else 1e-6)


def test_decode_absorption_monotonic():
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (1, 2, 1, 64))
    k = jax.random.normal(ks[1], (1, 2, 128, 64))
    v = jax.random.normal(ks[2], (1, 2, 128, 64))
    norms = [float(jnp.linalg.norm(
        sink_decode_attention(q, k, v, s_aux=jnp.full((2,), a))))
        for a in (-5.0, 0.0, 5.0)]
    assert norms[0] > norms[1] > norms[2]


@pytest.mark.parametrize("quant", [None, "int8", "fp8"])
def test_multistep_decode_with_eviction(quant):
    """Cache + decode kernel == last row of full eager attention, per step,
    across eviction wraps (the strongest inference-path test; reference
    test_inference.py:116-199)."""
    B, H_q, H_kv, D = 1, 4, 2, 64
    num_sink, window = 4, 32
    prefill_len, steps = 40, 24
    total = prefill_len + steps
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q_all = jax.random.normal(ks[0], (B, H_q, total, D))
    k_all = jax.random.normal(ks[1], (B, H_kv, total, D))
    v_all = jax.random.normal(ks[2], (B, H_kv, total, D))
    s_aux = jax.random.normal(jax.random.PRNGKey(4), (H_q,))

    dtype = jnp.float32 if quant is None else jnp.bfloat16
    cache = SinkKVCache.init(B, H_kv, D, num_sink=num_sink,
                             window_size=window, dtype=dtype, quant=quant)
    cache = cache.prefill(k_all[:, :, :prefill_len].astype(dtype),
                          v_all[:, :, :prefill_len].astype(dtype))

    errs = []
    for t in range(prefill_len, total):
        cache = cache.append(k_all[:, :, t:t + 1].astype(dtype),
                             v_all[:, :, t:t + 1].astype(dtype))
        out = sink_decode_attention_cached(
            q_all[:, :, t:t + 1].astype(dtype), cache, s_aux=s_aux)
        ref = eager_sink_attention(
            q_all[:, :, t:t + 1], k_all[:, :, :t + 1], v_all[:, :, :t + 1],
            num_sink=num_sink, window_size=window, s_aux=s_aux, q_offset=t)
        errs.append(float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32)))))
    worst = max(errs)
    budget = {None: fp32_tol(), "int8": 0.05, "fp8": 0.12}[quant]
    assert worst < budget, (worst, budget)


def test_cached_decode_window_not_full():
    """Decode immediately after a short prefill (window not yet full)."""
    B, H_q, H_kv, D = 1, 2, 2, 64
    cache = SinkKVCache.init(B, H_kv, D, num_sink=2, window_size=64,
                             dtype=jnp.float32)
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    k_all = jax.random.normal(ks[0], (B, H_kv, 9, D))
    v_all = jax.random.normal(ks[1], (B, H_kv, 9, D))
    q = jax.random.normal(ks[2], (B, H_q, 1, D))
    cache = cache.prefill(k_all[:, :, :8], v_all[:, :, :8])
    cache = cache.append(k_all[:, :, 8:9], v_all[:, :, 8:9])
    out = sink_decode_attention_cached(q, cache)
    ref = eager_sink_attention(q, k_all, v_all, num_sink=2, window_size=64,
                               q_offset=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=fp32_tol(), rtol=1e-3)


def test_jitted_decode_step():
    """Full decode step (append + attention) must be jittable."""
    B, H_q, H_kv, D = 1, 4, 2, 64
    cache = SinkKVCache.init(B, H_kv, D, num_sink=4, window_size=32,
                             dtype=jnp.float32)
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    cache = cache.prefill(jax.random.normal(ks[0], (B, H_kv, 16, D)),
                          jax.random.normal(ks[1], (B, H_kv, 16, D)))

    @jax.jit
    def step(cache, q, k, v):
        cache = cache.append(k, v)
        return cache, sink_decode_attention_cached(q, cache)

    q = jax.random.normal(ks[2], (B, H_q, 1, D))
    cache2, out = step(cache, q, q[:, :H_kv], q[:, :H_kv])
    assert out.shape == (B, H_q, 1, D)
    assert int(cache2.seen) == 17


# -- multi-token (speculative) cached decode --------------------------------


def test_multi_token_cached_decode_matches_eager():
    """Draft-token verification: T queries over the pre-append cache must
    equal the last T rows of full eager attention (exactly what sequential
    single-token decode would produce), across eviction wraps."""
    from sink_attention_tpu.ops.decode import (
        sink_decode_attention_cached_multi)

    B, Hq, Hkv, D = 1, 4, 2, 32
    ns, W = 4, 64
    for P, T in [(100, 4), (60, 1), (5, 3), (40, 64)]:
        N = P + T
        ks = jax.random.split(jax.random.PRNGKey(P), 4)
        q_all = jax.random.normal(ks[0], (B, Hq, N, D), jnp.float32)
        k_all = jax.random.normal(ks[1], (B, Hkv, N, D), jnp.float32)
        v_all = jax.random.normal(ks[2], (B, Hkv, N, D), jnp.float32)
        aux = jax.random.normal(ks[3], (Hq,), jnp.float32)
        cache = SinkKVCache.init(B, Hkv, D, num_sink=ns, window_size=W,
                                 dtype=jnp.float32)
        cache = cache.prefill(k_all[:, :, :P], v_all[:, :, :P])
        out, cache2 = sink_decode_attention_cached_multi(
            q_all[:, :, P:], k_all[:, :, P:], v_all[:, :, P:], cache,
            s_aux=aux)
        ref = eager_sink_attention(q_all, k_all, v_all, ns, W,
                                   s_aux=aux)[:, :, P:]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, err_msg=f"P={P} T={T}")
        assert int(cache2.seen) == N


def test_multi_token_decode_rollback_semantics():
    """Rejecting drafts = reverting to the pre-append cache; re-appending
    the accepted prefix then continues exactly as sequential decode."""
    from sink_attention_tpu.ops.decode import (
        sink_decode_attention_cached_multi)

    B, Hq, Hkv, D = 1, 2, 2, 16
    ns, W = 2, 32
    P, T, accept = 50, 4, 2
    N = P + T
    ks = jax.random.split(jax.random.PRNGKey(9), 4)
    q_all = jax.random.normal(ks[0], (B, Hq, N, D), jnp.float32)
    k_all = jax.random.normal(ks[1], (B, Hkv, N, D), jnp.float32)
    v_all = jax.random.normal(ks[2], (B, Hkv, N, D), jnp.float32)
    cache0 = SinkKVCache.init(B, Hkv, D, num_sink=ns, window_size=W,
                              dtype=jnp.float32)
    cache0 = cache0.prefill(k_all[:, :, :P], v_all[:, :, :P])
    _, _ = sink_decode_attention_cached_multi(
        q_all[:, :, P:], k_all[:, :, P:], v_all[:, :, P:], cache0)
    # roll back: keep cache0, append only the accepted prefix
    cache_acc = cache0.append_many(k_all[:, :, P:P + accept],
                                   v_all[:, :, P:P + accept])
    # sequential decode of the same prefix must give an identical cache
    cache_seq = cache0
    for t in range(accept):
        cache_seq = cache_seq.append(k_all[:, :, P + t:P + t + 1],
                                     v_all[:, :, P + t:P + t + 1])
    for a, b in zip(jax.tree.leaves(cache_acc), jax.tree.leaves(cache_seq)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_token_decode_short_prompt_matches_sequential():
    """Prompt shorter than num_sink: multi-token verification must equal a
    true sequential single-token decode loop (the mask's always-attend
    term applies to sink-REGION columns only, and sequential appends
    promote early tokens into sinks)."""
    from sink_attention_tpu.ops.decode import (
        sink_decode_attention_cached, sink_decode_attention_cached_multi)

    B, Hq, Hkv, D = 1, 4, 2, 32
    ns, W, P, T = 4, 4, 2, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    N = P + T
    q_all = jax.random.normal(ks[0], (B, Hq, N, D), jnp.float32)
    k_all = jax.random.normal(ks[1], (B, Hkv, N, D), jnp.float32)
    v_all = jax.random.normal(ks[2], (B, Hkv, N, D), jnp.float32)
    aux = jax.random.normal(ks[3], (Hq,), jnp.float32)

    def fresh():
        c = SinkKVCache.init(B, Hkv, D, num_sink=ns, window_size=W,
                             dtype=jnp.float32)
        return c.prefill(k_all[:, :, :P], v_all[:, :, :P])

    out_multi, cache_multi = sink_decode_attention_cached_multi(
        q_all[:, :, P:], k_all[:, :, P:], v_all[:, :, P:], fresh(),
        s_aux=aux)

    cache = fresh()
    seq_outs = []
    for t in range(P, N):
        cache = cache.append(k_all[:, :, t:t + 1], v_all[:, :, t:t + 1])
        seq_outs.append(sink_decode_attention_cached(
            q_all[:, :, t:t + 1], cache, s_aux=aux))
    out_seq = jnp.concatenate(seq_outs, axis=2)

    np.testing.assert_allclose(np.asarray(out_multi), np.asarray(out_seq),
                               atol=1e-5)
    # post-append state identical too (promotion happened in both)
    assert int(cache_multi.sink_len) == int(cache.sink_len) == ns
    np.testing.assert_allclose(np.asarray(cache_multi.k),
                               np.asarray(cache.k), atol=0)
