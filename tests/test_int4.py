"""Packed-INT4 weight matmul ops (ops.int4) + int4 model integration.

TPU-build-only capability: full gpt-oss-20b is ~21 GB in int8 (over a
16 GB v5e) but ~10.5 GB in int4. XLA has no packed-int4 dot, so
ops.int4 owns the nibble format (decoded via XLA-fused shifts).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sink_attention_tpu.ops.int4 import (
    int4_matmul,
    int4_matmul_experts,
    pack_int4,
)


def unpack_ref(packed, scale, contract_axis=-2):
    # nibble format: byte = (hi << 4) | (lo & 0xF), halves in [-7, 7]
    lo = (packed.astype(jnp.int32) << 28) >> 28
    hi = packed.astype(jnp.int32) >> 4
    ca = contract_axis % packed.ndim
    return jnp.concatenate([lo, hi], axis=ca).astype(jnp.float32) * scale


def test_pack_roundtrip_exact():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    packed, scale = pack_int4(w)
    deq = unpack_ref(packed, scale)
    # per-column max-abs int4: error bounded by scale/2
    bound = np.asarray(scale)[0] / 2 + 1e-8
    err = np.max(np.abs(np.asarray(deq - w)), axis=0)
    assert (err <= bound).all()


@pytest.mark.parametrize("shape", [(1, 64, 128), (8, 2880, 512),
                                   (100, 288, 640), (5, 62, 130)])
def test_int4_matmul_matches_dequant(shape):
    T, K, N = shape
    ks = jax.random.split(jax.random.PRNGKey(T), 2)
    x = jax.random.normal(ks[0], (T, K), jnp.bfloat16)
    w = jax.random.normal(ks[1], (K, N)) * 0.1
    packed, scale = pack_int4(w)
    ref = x.astype(jnp.float32) @ unpack_ref(packed, scale)
    out = int4_matmul(x, packed, scale)
    rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)) /
                (jnp.max(jnp.abs(ref)) + 1e-9))
    assert rel < 2e-2, rel  # bf16 matmul precision


@pytest.mark.parametrize("batched_x", [False, True])
def test_int4_experts_matches_dequant(batched_x):
    E, T, K, N = 3, 8, 288, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    w = jax.random.normal(ks[1], (E, K, N)) * 0.1
    packed, scale = pack_int4(w, contract_axis=1)
    wq = unpack_ref(packed, scale, contract_axis=1)
    if batched_x:
        x = jax.random.normal(ks[0], (E, T, K), jnp.bfloat16)
        ref = jnp.einsum("etk,ekn->etn", x.astype(jnp.float32), wq)
    else:
        x = jax.random.normal(ks[0], (T, K), jnp.bfloat16)
        ref = jnp.einsum("tk,ekn->etn", x.astype(jnp.float32), wq)
    out = int4_matmul_experts(x, packed, scale)
    rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)) /
                jnp.max(jnp.abs(ref)))
    assert rel < 2e-2, rel


def test_int4_model_matches_dequantized():
    """Full model forward with int4 weights vs the explicitly dequantized
    plain-weight model."""
    from sink_attention_tpu.models import (ModelConfig, forward_prefill,
                                           init_quantized_params)
    from sink_attention_tpu.models.quant import is_quantized4

    cfg = ModelConfig.tiny(num_layers=2, vocab_size=128)
    qp4 = init_quantized_params(cfg, jax.random.PRNGKey(0),
                                compute_dtype=jnp.float32,
                                init_dtype=jnp.float32, bits=4)
    assert is_quantized4(qp4["layers"][0]["attn"]["wq"])
    assert is_quantized4(qp4["layers"][0]["mlp"]["gate_up"])

    def deq(w):
        if is_quantized4(w):
            ca = w["q4"].ndim - 2
            return unpack_ref(w["q4"], w["s"], ca).astype(jnp.float32)
        if isinstance(w, dict) and "q" in w:
            return w["q"].astype(jnp.float32) * w["s"]
        return w

    dp = jax.tree.map(
        deq, qp4,
        is_leaf=lambda x: isinstance(x, dict) and ("q" in x or "q4" in x))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, 128)
    lg, _ = forward_prefill(qp4, cfg, ids)
    lr, _ = forward_prefill(dp, cfg, ids)
    cos = float((lg * lr).sum() /
                (jnp.linalg.norm(lg) * jnp.linalg.norm(lr)))
    assert cos > 0.999, cos


def test_int4_generate_runs():
    from sink_attention_tpu.models import ModelConfig, init_quantized_params
    from sink_attention_tpu.serving import greedy_generate

    cfg = ModelConfig.tiny(num_layers=1, vocab_size=64)
    qp4 = init_quantized_params(cfg, jax.random.PRNGKey(2),
                                compute_dtype=jnp.float32,
                                init_dtype=jnp.float32, bits=4)
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 0, 64)
    toks = greedy_generate(qp4, cfg, ids, max_new_tokens=4,
                           dtype=jnp.float32)
    t = np.asarray(toks)
    assert t.shape == (1, 4) and ((t >= 0) & (t < 64)).all()


def test_int4_engine_generates():
    """Continuous-batching engine over an int4-weight model."""
    from sink_attention_tpu.models import ModelConfig, init_quantized_params
    from sink_attention_tpu.serving import ContinuousBatchingEngine

    cfg = ModelConfig.tiny(num_layers=1, vocab_size=64)
    qp4 = init_quantized_params(cfg, jax.random.PRNGKey(4),
                                compute_dtype=jnp.float32,
                                init_dtype=jnp.float32, bits=4)
    eng = ContinuousBatchingEngine(qp4, cfg, max_batch=2, max_len=64,
                                   prefill_bucket=16, dtype=jnp.float32)
    r1 = eng.submit([1, 2, 3], max_new_tokens=3)
    r2 = eng.submit([4, 5], max_new_tokens=3)
    out = eng.run()
    assert len(out[r1]) == 3 and len(out[r2]) == 3
    assert all(0 <= t < 64 for t in out[r1] + out[r2])
