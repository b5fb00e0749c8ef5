"""Forward-parity tests: Pallas prefill kernel vs the eager oracle.

Mirrors the reference's forward test matrix
(/root/reference/tests/test_sink_attention.py:187-198 and
tests/test_s_aux.py:75-123): shapes, GQA, dtypes, degenerate configs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sink_attention_tpu.ops import (
    eager_sink_attention,
    sink_flash_attention,
    sink_flash_attention_with_lse,
)


def make_qkv(key, B, H_q, H_kv, N, D, dtype=jnp.float32, N_kv=None):
    kq, kk, kv = jax.random.split(key, 3)
    N_kv = N if N_kv is None else N_kv
    q = jax.random.normal(kq, (B, H_q, N, D), dtype=jnp.float32)
    k = jax.random.normal(kk, (B, H_kv, N_kv, D), dtype=jnp.float32)
    v = jax.random.normal(kv, (B, H_kv, N_kv, D), dtype=jnp.float32)
    return q.astype(dtype), k.astype(dtype), v.astype(dtype)


def tol(dtype):
    if jnp.dtype(dtype) == jnp.float32 and jax.default_backend() == "tpu":
        # TPU MXU default precision for fp32 matmuls is bf16-based.
        return 6e-3
    return {
        jnp.float32.dtype: 2e-5,
        jnp.bfloat16.dtype: 2e-2,
        jnp.float16.dtype: 4e-3,
    }[jnp.dtype(dtype)]


CONFIGS = [
    # (B, H_q, H_kv, N, D, num_sink, window)
    (1, 2, 2, 128, 64, 4, 64),        # basic MHA
    (2, 4, 2, 256, 64, 4, 128),       # GQA 2:1, batch
    (1, 8, 2, 192, 80, 4, 96),        # gpt-oss-like: GQA 4:1, head_dim 80
    (1, 2, 2, 300, 128, 16, 128),     # multi-sink, non-aligned N
    (1, 2, 1, 256, 64, 0, 128),       # pure sliding window (num_sink=0)
    (1, 2, 2, 256, 64, 4, 1),         # window=1: sink + self only
    (1, 2, 2, 256, 64, 4, 4096),      # window >= N: full causal
    (1, 2, 2, 64, 32, 4, 32),         # tiny (padding path)
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_forward_matches_oracle(cfg):
    B, H_q, H_kv, N, D, num_sink, window = cfg
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H_q, H_kv, N, D)
    out = sink_flash_attention(q, k, v, num_sink=num_sink,
                               window_size=window)
    ref = eager_sink_attention(q, k, v, num_sink=num_sink,
                               window_size=window)
    np.testing.assert_allclose(out, ref, atol=tol(q.dtype), rtol=1e-3)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
@pytest.mark.parametrize("use_s_aux", [False, True])
def test_s_aux_and_dtypes(dtype, use_s_aux):
    B, H_q, H_kv, N, D = 1, 4, 2, 256, 64
    q, k, v = make_qkv(jax.random.PRNGKey(1), B, H_q, H_kv, N, D, dtype)
    s_aux = (jax.random.normal(jax.random.PRNGKey(2), (H_q,)) * 2.0
             if use_s_aux else None)
    out = sink_flash_attention(q, k, v, num_sink=4, window_size=128,
                               s_aux=s_aux)
    ref = eager_sink_attention(q, k, v, num_sink=4, window_size=128,
                               s_aux=s_aux)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=tol(dtype), rtol=1e-2)


def test_lse_matches_oracle():
    B, H_q, H_kv, N, D = 1, 4, 2, 256, 64
    q, k, v = make_qkv(jax.random.PRNGKey(3), B, H_q, H_kv, N, D)
    s_aux = jax.random.normal(jax.random.PRNGKey(4), (H_q,))
    out, lse = sink_flash_attention_with_lse(
        q, k, v, num_sink=4, window_size=64, s_aux=s_aux)
    ref, ref_lse = eager_sink_attention(
        q, k, v, num_sink=4, window_size=64, s_aux=s_aux, return_lse=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-3)
    np.testing.assert_allclose(lse, ref_lse, atol=1e-4, rtol=1e-4)


def test_s_aux_absorbs_mass():
    """Larger s_aux must monotonically shrink the output norm
    (reference test_s_aux.py:144-170)."""
    B, H_q, H_kv, N, D = 1, 2, 2, 128, 64
    q, k, v = make_qkv(jax.random.PRNGKey(5), B, H_q, H_kv, N, D)
    norms = []
    for val in [-5.0, 0.0, 5.0]:
        out = sink_flash_attention(
            q, k, v, num_sink=4, window_size=64,
            s_aux=jnp.full((H_q,), val))
        norms.append(float(jnp.linalg.norm(out)))
    assert norms[0] > norms[1] > norms[2]


def test_full_causal_equivalence():
    """window >= N with num_sink=0 equals plain causal attention."""
    B, H, N, D = 1, 2, 128, 64
    q, k, v = make_qkv(jax.random.PRNGKey(6), B, H, H, N, D)
    out = sink_flash_attention(q, k, v, num_sink=0, window_size=N)
    scale = 1.0 / (D**0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    mask = jnp.tril(jnp.ones((N, N), bool))
    s = jnp.where(mask, s, -jnp.inf)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-3)


def test_rectangular_with_offsets():
    """Chunked query block must equal the corresponding slice of full attn."""
    B, H, N, D = 1, 2, 384, 64
    q, k, v = make_qkv(jax.random.PRNGKey(7), B, H, H, N, D)
    full = eager_sink_attention(q, k, v, num_sink=4, window_size=128)
    chunk = sink_flash_attention(
        q[:, :, 128:256], k, v, num_sink=4, window_size=128, q_offset=128)
    np.testing.assert_allclose(chunk, full[:, :, 128:256], atol=2e-5,
                               rtol=1e-3)


def test_adversarial_logits_trigger_safe_mode():
    """The fixed-scale fast path is exact only for |scaled logit| within
    fp32's exponent range of the row scale A; the wrapper must detect a
    violation and transparently re-run with the classic rescaling kernel
    (ops/flash.py sanity sentinel). Three trigger classes:

    1. lse overflow: logits so large p itself hits +inf.
    2. acc-only overflow (round-3 advisor, medium): p large-but-FINITE
       (2^119) times |v| = 30 overflows acc = p @ v to inf while
       l = sum(p) stays finite — lse alone cannot see it; the kernel
       publishes max|acc| in LSE sublane 1 for this.
    3. underflow: logits so negative a valid row's whole mass flushes
       to zero.

    Each must still produce the eager oracle's (finite) answer."""
    B, H, N, D = 1, 2, 64, 64
    scale_to_unit = 1.0 / jnp.sqrt(jnp.float32(D))

    def uniform_qkv(qk_dot, v_val):
        # q . k == qk_dot for every pair; all logits equal
        c = float(np.sqrt(qk_dot / D))
        q = jnp.full((B, H, N, D), c, jnp.float32)
        k = jnp.full((B, H, N, D), c, jnp.float32)
        v = jnp.full((B, H, N, D), v_val, jnp.float32)
        return q, k, v

    # 1. hard overflow: scaled logit ~ 1000 >> 126/log2(e)
    q, k, v = uniform_qkv(qk_dot=1000.0 * 8.0, v_val=1.0)
    out = sink_flash_attention(q, k, v, num_sink=0, window_size=N)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)

    # 2. acc-only overflow: exp2 exponent 119 (finite), v = 30 ->
    # rows attending >= 18 columns overflow acc but not l
    qk_dot = 119.0 / 1.4426950408889634 * 8.0  # scaled-logit*log2e = 119
    q, k, v = uniform_qkv(qk_dot=qk_dot, v_val=30.0)
    out = sink_flash_attention(q, k, v, num_sink=0, window_size=N)
    assert np.isfinite(np.asarray(out)).all(), "acc overflow not caught"
    np.testing.assert_allclose(np.asarray(out), 30.0, rtol=1e-5)

    # 3. underflow: all logits hugely negative; uniform softmax must
    # still come out (every row DOES attend >= 1 column)
    q, k, v = uniform_qkv(qk_dot=1000.0 * 8.0, v_val=2.0)
    out = sink_flash_attention(-q, k, v, num_sink=0, window_size=N)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-5)


@pytest.mark.parametrize("qo,kvo", [(0, 0), (128, 0), (192, 64), (64, 192)])
def test_schedule_grid_matches_rectangular(qo, kvo):
    """The flat valid-cell schedule (static offsets; _build_fwd_schedule)
    must agree with the rectangular runtime-arithmetic grid on the same
    call. sink_flash_attention takes the schedule path (python-int
    offsets); sink_flash_attention_chunk traces its offsets and keeps the
    rectangular grid — same kernel body, different cell enumeration.
    Covers unaligned offsets (one extra straddle block per phase) and a
    nonzero kv_offset (sink columns at a shifted local block)."""
    from sink_attention_tpu.ops import sink_flash_attention_chunk

    B, H_q, H_kv, N, D, ns, W = 1, 4, 2, 256, 64, 4, 96
    q, k, v = make_qkv(jax.random.PRNGKey(3), B, H_q, H_kv, N, D)
    sched_out = sink_flash_attention(q, k, v, num_sink=ns, window_size=W,
                                     q_offset=qo, kv_offset=kvo)
    rect_out, _ = sink_flash_attention_chunk(
        q, k, v, jnp.array([qo, kvo], jnp.int32), num_sink=ns,
        window_size=W)
    np.testing.assert_allclose(np.asarray(sched_out, np.float32),
                               np.asarray(rect_out, np.float32),
                               atol=2e-6, rtol=1e-5)
