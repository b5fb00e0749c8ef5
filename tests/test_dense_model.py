"""Dense (Qwen2/Llama) model-family tests.

The reference package is gpt-oss-only; the dense family extends the same
kernel/cache/serving stack to standard gated-SiLU transformers — the
models StreamingLLM-style sink inference (num_sink_tokens > 0, no learned
s_aux) was designed for. Golden test mirrors tests/test_model.py: port a
randomly-initialized HF ``Qwen2ForCausalLM``'s weights and require logits
parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sink_attention_tpu.models import (
    ModelConfig,
    forward_decode,
    forward_prefill,
    init_params,
    make_caches,
    params_from_hf_state_dict,
)
from sink_attention_tpu.models.quant import quantize_params
from sink_attention_tpu.serving import greedy_generate

transformers = pytest.importorskip("transformers")


def tiny_qwen2_pair(seed=0):
    import torch
    torch.manual_seed(seed)
    hf_cfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=96, rope_theta=10000.0, rms_norm_eps=1e-6,
        max_position_embeddings=2048, tie_word_embeddings=False,
        attn_implementation="eager", use_sliding_window=False,
    )
    hf_model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(hf_cfg)
    params = params_from_hf_state_dict(hf_model.state_dict(), cfg,
                                       dtype=jnp.float32)
    return hf_model, cfg, params


def test_config_from_hf_qwen2():
    _, cfg, params = tiny_qwen2_pair()
    assert cfg.mlp_type == "dense"
    assert not cfg.use_s_aux
    assert cfg.attention_bias and cfg.attention_out_bias is False
    assert cfg.head_dim == 16
    assert all(t == "full_attention" for t in cfg.layer_types)
    lp = params["layers"][0]
    assert "sinks" not in lp["attn"]
    assert set(lp["mlp"]) == {"gate", "up", "down"}


def test_qwen2_logits_match_hf_eager():
    import torch
    hf_model, cfg, params = tiny_qwen2_pair()
    B, N = 2, 48
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (B, N))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits.numpy()
    logits, _ = forward_prefill(params, cfg, jnp.asarray(ids))
    logits = np.asarray(logits)
    diff = np.abs(logits - hf_logits).max()
    assert diff < 2e-3, diff
    assert (logits.argmax(-1) == hf_logits.argmax(-1)).mean() == 1.0


@pytest.mark.parametrize("attn_bias", [False, True])
def test_llama_logits_match_hf_eager(attn_bias):
    """Llama family: attention_bias applies to ALL FOUR projections
    (unlike Qwen2, whose o_proj is hardcoded bias-free) — the True case
    pins that the checkpoint's real o_proj bias is loaded, not zeros."""
    import torch
    torch.manual_seed(1)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        rope_theta=50000.0, rms_norm_eps=1e-6, max_position_embeddings=512,
        tie_word_embeddings=False, attention_bias=attn_bias,
        attn_implementation="eager")
    hf_model = transformers.LlamaForCausalLM(hf_cfg).eval()
    if attn_bias:  # random-init biases are zero; make them matter
        with torch.no_grad():
            for layer in hf_model.model.layers:
                layer.self_attn.o_proj.bias.normal_(0.0, 0.5)
    cfg = ModelConfig.from_hf_config(hf_cfg)
    assert cfg.attention_bias == attn_bias and cfg.mlp_type == "dense"
    assert cfg.o_bias == attn_bias
    params = params_from_hf_state_dict(hf_model.state_dict(), cfg,
                                       dtype=jnp.float32)
    ids = np.random.RandomState(1).randint(0, cfg.vocab_size, (1, 33))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits.numpy()
    logits, _ = forward_prefill(params, cfg, jnp.asarray(ids))
    assert np.abs(np.asarray(logits) - hf_logits).max() < 2e-3


def test_mistral_sliding_window_logits_match_hf_eager():
    """Mistral applies its sliding window in EVERY layer with no opt-in
    flag; window smaller than the sequence so the mask actually bites."""
    import torch
    torch.manual_seed(2)
    hf_cfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        sliding_window=16, rms_norm_eps=1e-6, max_position_embeddings=512,
        tie_word_embeddings=False, attn_implementation="eager")
    hf_model = transformers.MistralForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(hf_cfg)
    assert cfg.sliding_window == 16
    assert all(t == "sliding_attention" for t in cfg.layer_types)
    params = params_from_hf_state_dict(hf_model.state_dict(), cfg,
                                       dtype=jnp.float32)
    ids = np.random.RandomState(2).randint(0, cfg.vocab_size, (1, 48))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits.numpy()
    logits, _ = forward_prefill(params, cfg, jnp.asarray(ids))
    assert np.abs(np.asarray(logits) - hf_logits).max() < 2e-3


def test_qwen2_max_window_layers():
    """Qwen2's sliding window starts at layer max_window_layers; leading
    layers stay full attention."""
    cfg = ModelConfig.from_hf_config(dict(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=48, use_sliding_window=True, sliding_window=8,
        max_window_layers=2, max_position_embeddings=256))
    assert cfg.layer_types == ("full_attention", "full_attention",
                               "sliding_attention", "sliding_attention")
    assert cfg.sliding_window == 8


def test_qwen2_decode_matches_prefill():
    """Prefill N tokens vs prefill N-8 + 8 cached decode steps."""
    cfg = ModelConfig.qwen2_tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    B, N, T = 2, 24, 8
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, N), 0,
                             cfg.vocab_size)
    full_logits, _ = forward_prefill(params, cfg, ids)

    caches = make_caches(cfg, B, max_len=N, dtype=jnp.float32)
    _, caches = forward_prefill(params, cfg, ids[:, :N - T], caches=caches)
    outs = []
    for t in range(T):
        pos = N - T + t
        logits, caches = forward_decode(params, cfg, ids[:, pos:pos + 1],
                                        caches, jnp.asarray(pos))
        outs.append(logits[:, 0])
    dec = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(dec, np.asarray(full_logits[:, N - T:]),
                               atol=2e-4, rtol=1e-3)


def test_qwen2_streaming_sink_cache_generate():
    """StreamingLLM mode on a dense model: num_sink_tokens leading tokens
    are pinned while the window rolls — the cache-eviction kind of sink
    (the reference kernel's num_sink>0 mode, cache.py semantics)."""
    cfg = ModelConfig.qwen2_tiny(num_sink_tokens=2, sliding_window=8,
                                 layer_types=("sliding_attention",) * 2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0,
                                cfg.vocab_size)
    toks = greedy_generate(params, cfg, prompt, max_new_tokens=6,
                           dtype=jnp.float32)
    assert toks.shape == (1, 6)
    assert int(jnp.max(toks)) < cfg.vocab_size


def test_qwen2_int8_quantized_forward():
    cfg = ModelConfig.qwen2_tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0,
                             cfg.vocab_size)
    ref_logits, _ = forward_prefill(params, cfg, ids)
    qparams = quantize_params(params, cfg, compute_dtype=jnp.float32)
    assert "q" in qparams["layers"][0]["mlp"]["gate"]
    q_logits, _ = forward_prefill(qparams, cfg, ids)
    # int8 weights: logits drift but argmax should broadly agree
    agree = (np.asarray(q_logits).argmax(-1) ==
             np.asarray(ref_logits).argmax(-1)).mean()
    assert agree > 0.9, agree


def test_qwen2_sharded_train_step():
    """DP x SP x TP one-step parity vs the unsharded step on a dense
    model (Megatron column/row MLP split via param_shardings)."""
    import optax
    from jax.sharding import Mesh
    from sink_attention_tpu.parallel.train import (
        cross_entropy_loss, make_train_step)

    # 4/4 heads: each TP shard keeps 2 kv heads, divisible by sp=2
    cfg = ModelConfig.qwen2_tiny(num_heads=4, num_kv_heads=4)
    params = init_params(cfg, jax.random.PRNGKey(0))
    batch = jax.random.randint(jax.random.PRNGKey(1), (4, 33), 0,
                               cfg.vocab_size)  # 32 input tokens
    opt = optax.sgd(1e-2)

    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "seq", "model"))
    step, p_sh = make_train_step(cfg, mesh, opt)
    with mesh:
        params_sh = jax.device_put(params, p_sh)
        opt_state = opt.init(params_sh)
        new_params, _, loss = step(params_sh, opt_state, batch)

    ref_loss = cross_entropy_loss(params, cfg, batch)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    # params actually moved
    delta = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, new_params, params), 0.0)
    assert delta > 0.0
