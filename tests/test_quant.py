"""Weight-only INT8 quantization (models.quant) — serving-path tests.

The reference package has no weight quantization; this capability is
TPU-build-only (BASELINE north-star configs). Checks: quantize/dequant
round-trip accuracy, model forward parity within int8 tolerance on every
path (prefill, decode, ragged decode / engine), and pytree compatibility.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sink_attention_tpu.models import (
    ModelConfig,
    forward_decode,
    forward_prefill,
    init_params,
    is_quantized,
    make_caches,
    quantize_params,
    quantize_weight,
)


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.1
    qw = quantize_weight(w)
    assert qw["q"].dtype == jnp.int8
    assert qw["s"].shape == (1, 32)
    deq = qw["q"].astype(jnp.float32) * qw["s"]
    # per-column max-abs scaling: error bounded by scale/2 per element
    bound = np.asarray(qw["s"])[0] / 2 + 1e-8
    err = np.max(np.abs(np.asarray(deq - w)), axis=0)
    assert (err <= bound).all()


def test_quantize_weight_expert_scales():
    w = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 8))
    qw = quantize_weight(w)  # contract middle axis
    assert qw["s"].shape == (4, 1, 8)  # per-(expert, out-channel)


def test_quantized_prefill_close():
    cfg = ModelConfig.tiny(num_layers=2, vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qp = quantize_params(params)
    assert is_quantized(qp["layers"][0]["attn"]["wq"])
    assert is_quantized(qp["embed"])
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, 128)
    lf, _ = forward_prefill(params, cfg, ids)
    lq, _ = forward_prefill(qp, cfg, ids)
    rel = float(jnp.max(jnp.abs(lf - lq)) / jnp.std(lf))
    cos = float((lf * lq).sum() /
                (jnp.linalg.norm(lf) * jnp.linalg.norm(lq)))
    assert rel < 0.2 and cos > 0.99, (rel, cos)


def test_quantized_decode_runs_and_close():
    cfg = ModelConfig.tiny(num_layers=2, vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qp = quantize_params(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, 128)

    def decode_logits(p):
        caches = make_caches(cfg, 1, 64, dtype=jnp.float32)
        _, caches = forward_prefill(p, cfg, ids, caches=caches)
        lg, _ = forward_decode(p, cfg, ids[:, :1], caches, position=16)
        return lg

    lf = decode_logits(params)
    lq = decode_logits(qp)
    assert bool(jnp.all(jnp.isfinite(lq)))
    cos = float((lf * lq).sum() /
                (jnp.linalg.norm(lf) * jnp.linalg.norm(lq)))
    assert cos > 0.99, cos


def test_quantized_engine_generates():
    from sink_attention_tpu.serving import ContinuousBatchingEngine

    cfg = ModelConfig.tiny(num_layers=2, vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qp = quantize_params(params)
    eng = ContinuousBatchingEngine(qp, cfg, max_batch=2, max_len=64,
                                   prefill_bucket=16, dtype=jnp.float32)
    r1 = eng.submit([1, 2, 3], max_new_tokens=4)
    r2 = eng.submit([4, 5], max_new_tokens=4)
    out = eng.run()
    assert len(out[r1]) == 4 and len(out[r2]) == 4
    assert all(0 <= t < 128 for t in out[r1] + out[r2])


def test_quantized_matches_greedy_generate_of_dequantized():
    """Greedy generation with int8 weights must equal greedy generation
    with the explicitly dequantized weights (the quant dict is exact)."""
    from sink_attention_tpu.serving import greedy_generate

    cfg = ModelConfig.tiny(num_layers=1, vocab_size=64)
    params = init_params(cfg, jax.random.PRNGKey(2), jnp.float32)
    # fp32 scales => fp32 compute in the quantized model, matching the
    # dequantized model's dtype so generation is bit-comparable.
    qp = quantize_params(params, compute_dtype=jnp.float32)

    def deq(w):
        if is_quantized(w):
            return (w["q"].astype(jnp.float32) * w["s"]).astype(jnp.float32)
        return w
    dp = jax.tree.map(deq, qp, is_leaf=is_quantized)

    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 0, 64)
    t_q = greedy_generate(qp, cfg, ids, max_new_tokens=4,
                          dtype=jnp.float32)
    t_d = greedy_generate(dp, cfg, ids, max_new_tokens=4,
                          dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(t_q), np.asarray(t_d))
