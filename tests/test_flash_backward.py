"""Gradient parity: custom_vjp backward kernels vs autodiff through the oracle.

Mirrors the reference's backward test strategy
(/root/reference/tests/test_sink_attention.py:71-96 — dQ/dK/dV parity vs fp32
eager autograd; tests/test_s_aux.py:176-261 — ds_aux analytical vs finite
differences and finiteness checks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sink_attention_tpu.ops import eager_sink_attention, sink_flash_attention


def make_inputs(key, B, H_q, H_kv, N, D, with_aux=True):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, H_q, N, D))
    k = jax.random.normal(ks[1], (B, H_kv, N, D))
    v = jax.random.normal(ks[2], (B, H_kv, N, D))
    s_aux = jax.random.normal(ks[3], (H_q,)) if with_aux else None
    return q, k, v, s_aux


GRAD_CONFIGS = [
    # (B, H_q, H_kv, N, D, num_sink, window, use_aux)
    (1, 2, 2, 128, 64, 4, 64, False),
    (1, 4, 2, 256, 64, 4, 128, True),       # GQA + s_aux
    (1, 2, 2, 256, 64, 0, 64, False),       # pure window
    (1, 2, 2, 192, 80, 4, 96, True),        # head_dim 80
    (1, 2, 2, 256, 64, 4, 4096, True),      # full causal
    (2, 4, 1, 128, 64, 16, 32, True),       # MQA, multi-sink
]


@pytest.mark.parametrize("cfg", GRAD_CONFIGS)
def test_grads_match_oracle(cfg):
    B, H_q, H_kv, N, D, num_sink, window, use_aux = cfg
    q, k, v, s_aux = make_inputs(jax.random.PRNGKey(0), B, H_q, H_kv, N, D,
                                 use_aux)
    do = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss_kernel(q, k, v, s_aux):
        out = sink_flash_attention(q, k, v, num_sink=num_sink,
                                   window_size=window, s_aux=s_aux)
        return jnp.sum(out * do)

    def loss_ref(q, k, v, s_aux):
        out = eager_sink_attention(q, k, v, num_sink=num_sink,
                                   window_size=window, s_aux=s_aux)
        return jnp.sum(out * do)

    argnums = (0, 1, 2, 3) if use_aux else (0, 1, 2)
    g_kernel = jax.grad(loss_kernel, argnums)(q, k, v, s_aux)
    g_ref = jax.grad(loss_ref, argnums)(q, k, v, s_aux)

    names = ["dq", "dk", "dv", "ds_aux"][:len(argnums)]
    atol = 2e-3 if jax.default_backend() == "tpu" else 1e-4
    for name, a, b in zip(names, g_kernel, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=atol, rtol=1e-2,
            err_msg=f"{name} mismatch for cfg={cfg}")


def test_ds_aux_finite_differences():
    """ds_aux vs central finite differences (reference test_s_aux.py:196-239;
    the README headline 'max diff 1.19e-3' comes from this check)."""
    B, H_q, H_kv, N, D = 1, 2, 2, 64, 32
    q, k, v, s_aux = make_inputs(jax.random.PRNGKey(1), B, H_q, H_kv, N, D)

    def loss(s_aux):
        out = sink_flash_attention(q, k, v, num_sink=4, window_size=32,
                                   s_aux=s_aux)
        return jnp.sum(out**2)

    analytical = jax.grad(loss)(s_aux)
    eps = 1e-3
    for h in range(H_q):
        e = jnp.zeros_like(s_aux).at[h].set(eps)
        numerical = (loss(s_aux + e) - loss(s_aux - e)) / (2 * eps)
        a, n = float(analytical[h]), float(numerical)
        # rel tolerance: fp32 rounding of the (large) loss dominates abs error
        assert abs(a - n) < 5e-2 * max(1.0, abs(a)), (h, a, n)


def test_grads_finite_bf16():
    B, H_q, H_kv, N, D = 1, 4, 2, 256, 64
    q, k, v, s_aux = make_inputs(jax.random.PRNGKey(2), B, H_q, H_kv, N, D)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))

    def loss(q, k, v, s_aux):
        out = sink_flash_attention(q, k, v, num_sink=4, window_size=128,
                                   s_aux=s_aux)
        return jnp.sum(out.astype(jnp.float32)**2)

    grads = jax.grad(loss, (0, 1, 2, 3))(q, k, v, s_aux)
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32)))), g.dtype


def test_ds_aux_matches_finite_differences():
    """Independent ds_aux validation vs central finite differences
    (reference test_s_aux.py:196-239; headline 'max diff 1.19e-3',
    README.md:116). The other gradient tests compare against autodiff
    through the eager oracle; this one needs no oracle at all."""
    B, Hq, Hkv, N, D = 1, 4, 2, 128, 32
    ns, W = 4, 32
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    q = jax.random.normal(ks[0], (B, Hq, N, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, N, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, N, D), jnp.float32)
    aux = jax.random.normal(ks[3], (Hq,), jnp.float32)

    def loss(a):
        out = sink_flash_attention(q, k, v, ns, W, s_aux=a,
                                   block_q=64, block_kv=64)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    analytic = np.asarray(jax.grad(loss)(aux))
    eps = 1e-3
    numeric = np.zeros_like(analytic)
    for h in range(Hq):
        e = jnp.zeros_like(aux).at[h].set(eps)
        numeric[h] = (float(loss(aux + e)) - float(loss(aux - e))) / (2 * eps)
    np.testing.assert_allclose(analytic, numeric, atol=5e-2, rtol=5e-2)


def test_chunk_backward_negative_kv_offset_sink_grads():
    """SP-halo layout: kv_offset < 0 puts the global sink columns at a
    nonzero local block. dK/dV must include out-of-window sink
    contributions (regression: the static sink/window pass split dropped
    them — sink grads were wrong by O(0.3) while the forward was exact)."""
    from sink_attention_tpu.ops.flash import sink_flash_attention_chunk

    B, H, D = 1, 2, 32
    n_q, halo, ns, W, bn = 256, 256, 4, 256, 128
    ks = jax.random.split(jax.random.PRNGKey(40), 3)
    q = jax.random.normal(ks[0], (B, H, n_q, D), jnp.float32)
    kv_g = jax.random.normal(ks[1], (B, H, n_q, D), jnp.float32)
    vv_g = jax.random.normal(ks[2], (B, H, n_q, D), jnp.float32)
    # local KV = [halo of pre-sequence garbage | the real sequence]
    garbage = jnp.full((B, H, halo, D), 7.7, jnp.float32)
    k_loc = jnp.concatenate([garbage, kv_g], axis=2)
    v_loc = jnp.concatenate([garbage, vv_g], axis=2)
    offsets = jnp.array([0, -halo], jnp.int32)

    def loss_chunk(q, k, v):
        out, _ = sink_flash_attention_chunk(q, k, v, offsets, ns, W,
                                            block_q=64, block_kv=bn)
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(eager_sink_attention(q, k, v, ns, W) ** 2)

    gq, gk, gv = jax.grad(loss_chunk, (0, 1, 2))(q, k_loc, v_loc)
    rq, rk, rv = jax.grad(loss_ref, (0, 1, 2))(q, kv_g, vv_g)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=2e-4)
    # grads on the real slots match; garbage halo slots get zero grads
    np.testing.assert_allclose(np.asarray(gk[:, :, halo:]), np.asarray(rk),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(gv[:, :, halo:]), np.asarray(rv),
                               atol=2e-4)
    assert float(jnp.abs(gk[:, :, :halo]).max()) == 0.0
    assert float(jnp.abs(gv[:, :, :halo]).max()) == 0.0
