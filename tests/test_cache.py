"""Sink KV cache state-machine tests.

Mirrors the reference cache suite (/root/reference/tests/test_cache.py:386-404):
prefill variants, sequential decode with eviction, circular linearization with
sentinel values, GQA shapes, beam reorder, seen-token accounting — plus the
quantized variants the TPU build adds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sink_attention_tpu.cache import SinkKVCache


def token_kv(B, H, n, D, start=0):
    """KV whose slot dim equals the global token index (sentinel values)."""
    vals = (jnp.arange(start, start + n, dtype=jnp.float32)
            .reshape(1, 1, n, 1))
    return (jnp.broadcast_to(vals, (B, H, n, D)),
            jnp.broadcast_to(vals + 0.5, (B, H, n, D)))


def chrono(cache):
    k, v = cache.linearized_kv(head_dim=1)
    return np.asarray(k)[0, 0, :, 0]


def test_prefill_short():
    cache = SinkKVCache.init(1, 2, 8, num_sink=4, window_size=8,
                             dtype=jnp.float32)
    k, v = token_kv(1, 2, 3, 8)
    cache = cache.prefill(k, v)
    assert int(cache.sink_len) == 3 and int(cache.window_len) == 0
    assert int(cache.get_seq_length()) == 3
    np.testing.assert_array_equal(chrono(cache), [0, 1, 2])


def test_prefill_exact_sink():
    cache = SinkKVCache.init(1, 2, 8, num_sink=4, window_size=8,
                             dtype=jnp.float32)
    cache = cache.prefill(*token_kv(1, 2, 4, 8))
    assert int(cache.sink_len) == 4 and int(cache.window_len) == 0


def test_prefill_sink_plus_window():
    cache = SinkKVCache.init(1, 2, 8, num_sink=4, window_size=8,
                             dtype=jnp.float32)
    cache = cache.prefill(*token_kv(1, 2, 10, 8))
    assert int(cache.sink_len) == 4 and int(cache.window_len) == 6
    assert int(cache.write_pos) == 6
    np.testing.assert_array_equal(chrono(cache), np.arange(10))


def test_prefill_overflow_keeps_last_window():
    cache = SinkKVCache.init(1, 2, 8, num_sink=4, window_size=8,
                             dtype=jnp.float32)
    cache = cache.prefill(*token_kv(1, 2, 20, 8))
    assert int(cache.window_len) == 8 and int(cache.write_pos) == 0
    np.testing.assert_array_equal(
        chrono(cache), [0, 1, 2, 3, 12, 13, 14, 15, 16, 17, 18, 19])


def test_decode_eviction_and_linearization():
    cache = SinkKVCache.init(1, 2, 8, num_sink=2, window_size=4,
                             dtype=jnp.float32)
    cache = cache.prefill(*token_kv(1, 2, 5, 8))  # sink {0,1}, window {2,3,4}
    for t in range(5, 11):
        cache = cache.append(*token_kv(1, 2, 1, 8, start=t))
    # window keeps the last 4 tokens {7,8,9,10}; sinks survive
    assert int(cache.get_seq_length()) == 6
    assert int(cache.seen) == 11
    np.testing.assert_array_equal(chrono(cache), [0, 1, 7, 8, 9, 10])


def test_append_many_matches_sequential():
    c1 = SinkKVCache.init(1, 1, 4, num_sink=2, window_size=4,
                          dtype=jnp.float32)
    c2 = c1
    c1 = c1.prefill(*token_kv(1, 1, 3, 4))
    c2 = c2.prefill(*token_kv(1, 1, 3, 4))
    k, v = token_kv(1, 1, 3, 4, start=3)
    c1 = c1.append_many(k, v)
    for i in range(3):
        c2 = c2.append(k[:, :, i:i + 1], v[:, :, i:i + 1])
    np.testing.assert_array_equal(chrono(c1), chrono(c2))


def test_beam_reorder():
    cache = SinkKVCache.init(3, 1, 4, num_sink=1, window_size=4,
                             dtype=jnp.float32)
    k = jnp.arange(3, dtype=jnp.float32).reshape(3, 1, 1, 1) * jnp.ones(
        (3, 1, 2, 4))
    cache = cache.prefill(k, k)
    cache = cache.reorder(jnp.array([2, 0, 1]))
    np.testing.assert_array_equal(
        np.asarray(cache.k[:, 0, 0, 0]), [2.0, 0.0, 1.0])


def test_update_dispatch():
    cache = SinkKVCache.init(1, 1, 4, num_sink=2, window_size=4,
                             dtype=jnp.float32)
    cache = cache.update(*token_kv(1, 1, 6, 4))       # prefill
    cache = cache.update(*token_kv(1, 1, 1, 4, start=6))  # decode
    assert int(cache.seen) == 7


@pytest.mark.parametrize("quant", ["int8", "fp8"])
def test_quantized_roundtrip(quant):
    cache = SinkKVCache.init(1, 2, 64, num_sink=4, window_size=128,
                             dtype=jnp.bfloat16, quant=quant)
    key = jax.random.PRNGKey(0)
    k = jax.random.normal(key, (1, 2, 40, 64))
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 40, 64))
    cache = cache.prefill(k, v)
    lk, lv = cache.linearized_kv(head_dim=64)
    assert lk.shape == (1, 2, 40, 64)
    err = float(jnp.max(jnp.abs(lk - k)))
    budget = 0.03 if quant == "int8" else 0.2  # e4m3: 3 mantissa bits
    assert err < budget, err


def test_jit_append_scan():
    """The cache must work inside lax.scan (decode loop)."""
    cache = SinkKVCache.init(1, 1, 8, num_sink=2, window_size=4,
                             dtype=jnp.float32)
    cache = cache.prefill(*token_kv(1, 1, 3, 8))

    def step(cache, t):
        k = jnp.full((1, 1, 1, 8), t, jnp.float32)
        return cache.append(k, k + 0.5), t

    cache, _ = jax.lax.scan(step, cache, jnp.arange(3, 9, dtype=jnp.float32))
    assert int(cache.seen) == 9
    np.testing.assert_array_equal(chrono(cache), [0, 1, 5, 6, 7, 8])


def test_append_promotes_short_prompt_into_sinks():
    """A prompt shorter than num_sink leaves sink slots unfilled; decode
    appends must PROMOTE into them (global position < num_sink) so the
    first num_sink SEEN tokens stay pinned forever — the j < num_sink
    term of the kernel mask. (The reference cache never promotes and
    diverges from its own kernel mask once the ring wraps.)"""
    B, H, D, ns, W = 1, 2, 4, 4, 3
    cache = SinkKVCache.init(B, H, D, num_sink=ns, window_size=W,
                             dtype=jnp.float32)
    k, v = token_kv(B, H, 2, D)            # prompt = tokens 0, 1
    cache = cache.prefill(k, v)
    assert int(cache.sink_len) == 2 and int(cache.window_len) == 0
    # appends: tokens 2, 3 promote; 4.. go to the ring
    for t in range(2, 9):
        kt, vt = token_kv(B, H, 1, D, start=t)
        cache = cache.append(kt, vt)
    assert int(cache.sink_len) == ns
    assert int(cache.window_len) == W
    # chronological view: sinks 0..3 pinned, ring holds the last W tokens
    np.testing.assert_array_equal(chrono(cache), [0, 1, 2, 3, 6, 7, 8])


def test_ragged_insert_short_prompt_under_jit():
    """insert() of a prompt shorter than num_sink must place the real
    tokens at sink slots [0, true_len) under jax.jit — a previous
    roll+dynamic_slice formulation relied on slice start-clamping that
    XLA composes away under jit (tokens landed rotated out of the valid
    region; eager and jit disagreed)."""
    from sink_attention_tpu.cache.ragged import RaggedSinkKVCache

    B, H, D, ns, W = 2, 2, 4, 4, 6
    cache = RaggedSinkKVCache.init(B, H, D, num_sink=ns, window_size=W,
                                   dtype=jnp.float32)
    kp, vp = token_kv(1, H, 8, D)  # padded buffer; true_len=2
    kp, vp = kp[0], vp[0]          # [H, N, D]

    def ins(cache, k, v):
        return cache.insert(jnp.int32(0), k, v, jnp.int32(2))

    c_eager = ins(cache, kp, vp)
    c_jit = jax.jit(ins)(cache, kp, vp)
    for c in (c_eager, c_jit):
        assert int(c.sink_len[0]) == 2
        lk, _ = c.linearized_kv_slot(0, head_dim=1)
        np.testing.assert_array_equal(np.asarray(lk)[0, :, 0], [0, 1])


def test_ragged_append_promotes_short_prompt():
    """Ragged cache: the same sink promotion per slot, with an inactive
    slot left untouched."""
    from sink_attention_tpu.cache.ragged import RaggedSinkKVCache

    B, H, D, ns, W = 2, 2, 4, 4, 3
    cache = RaggedSinkKVCache.init(B, H, D, num_sink=ns, window_size=W,
                                   dtype=jnp.float32)
    kp, vp = token_kv(1, H, 4, D)
    cache = cache.insert(jnp.int32(0), kp[0], vp[0], jnp.int32(2))
    active = jnp.asarray([True, False])
    for t in range(2, 9):
        kt, vt = token_kv(B, H, 1, D, start=t)
        cache = cache.append(kt, vt, active)
    assert int(cache.sink_len[0]) == ns
    assert int(cache.window_len[0]) == W
    assert int(cache.sink_len[1]) == 0 and int(cache.seen[1]) == 0
    lk, _ = cache.linearized_kv_slot(0, head_dim=1)
    np.testing.assert_array_equal(np.asarray(lk)[0, :, 0],
                                  [0, 1, 2, 3, 6, 7, 8])


def test_append_many_counted_full_ring_rejection():
    """Rejected speculative tokens (i >= count) must be FULL no-ops.

    Regression test for the round-3 advisor's high finding: with the ring
    full (window_len == window_size), the frozen next-write slot holds the
    OLDEST LIVE window token, and an ungated data write there corrupted it
    — speculative decoding then diverged from greedy past the window
    length whenever a draft token was rejected. The fix gates the data
    write (read-back + select), not just the scalar ring state.
    """
    B, H, D, ns, W = 1, 2, 4, 2, 4
    base = SinkKVCache.init(B, H, D, num_sink=ns, window_size=W,
                            dtype=jnp.float32)
    # Fill past the wrap: tokens 0..8 -> sinks [0,1], ring holds [5,6,7,8]
    for t in range(9):
        kt, vt = token_kv(B, H, 1, D, start=t)
        base = base.append(kt, vt)
    np.testing.assert_array_equal(chrono(base), [0, 1, 5, 6, 7, 8])

    # Commit 2 of 4 draft tokens (values 9..12), under jit like the real
    # speculative loop.
    kd, vd = token_kv(B, H, 4, D, start=9)

    @jax.jit
    def commit(cache, k, v, count):
        return cache.append_many_counted(k, v, count)

    got = commit(base, kd, vd, jnp.int32(2))
    want = base.append_many(kd[:, :, :2], vd[:, :, :2])
    np.testing.assert_array_equal(chrono(got), chrono(want))
    np.testing.assert_array_equal(chrono(got), [0, 1, 7, 8, 9, 10])
    assert int(got.seen) == int(want.seen) == 11
    assert int(got.write_pos) == int(want.write_pos)
    # The REJECTED tokens' values (11, 12) must appear nowhere: slot data
    # for the oldest live token (7) survived the rejected writes.
    assert not np.isin([11.0, 12.0], np.asarray(got.k)).any()

    # count == 0 must leave the cache bit-identical.
    got0 = commit(base, kd, vd, jnp.int32(0))
    for a, b in zip(jax.tree.leaves(got0), jax.tree.leaves(base)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
