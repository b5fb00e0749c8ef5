"""Packed (multi-segment) sink attention: kernel vs eager oracle.

The reference package has NO packed support — its verl patch falls back to
stock flash attention for packed batches (verl_patch.py:73-93), so this
capability is TPU-build-only. The oracle is
``reference.packed_sink_window_mask`` semantics: per-segment sinks +
per-segment causal sliding window, no cross-segment attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sink_attention_tpu.ops.reference import (
    eager_sink_attention,
    eager_sink_attention_packed,
)
from sink_attention_tpu.ops.packed import sink_flash_attention_packed


def mkpos(seglens, B=1):
    pos = []
    for L in seglens:
        pos += list(range(L))
    return jnp.tile(jnp.array(pos, jnp.int32)[None], (B, 1))


def rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32)


def qkva(name, B, Hq, Hkv, N, D, with_aux=False):
    ks = jax.random.split(jax.random.PRNGKey(abs(hash(name)) % 2**31), 4)
    q = rand(ks[0], B, Hq, N, D)
    k = rand(ks[1], B, Hkv, N, D)
    v = rand(ks[2], B, Hkv, N, D)
    a = rand(ks[3], Hq) if with_aux else None
    return q, k, v, a


CONFIGS = [
    # name, B, Hq, Hkv, N, D, seglens, num_sink, window, s_aux
    ("two-equal", 1, 2, 1, 256, 64, [128, 128], 4, 64, False),
    ("ragged", 2, 4, 2, 256, 64, [100, 30, 70, 56], 4, 64, False),
    ("long-seg-beyond-window", 1, 2, 2, 512, 64, [400, 112], 4, 64, True),
    ("tiny-segs", 1, 2, 2, 256, 64, [8] * 32, 4, 64, False),
    ("no-sink", 1, 2, 2, 256, 64, [100, 156], 0, 64, False),
    ("s_aux-gqa", 1, 4, 2, 256, 64, [100, 156], 4, 64, True),
    ("unaligned", 1, 2, 2, 250, 48, [90, 160], 4, 60, False),
    ("seg-shorter-than-sink", 1, 2, 2, 128, 32, [2, 126], 4, 32, False),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_packed_forward_matches_oracle(cfg):
    name, B, Hq, Hkv, N, D, segs, ns, W, with_aux = cfg
    q, k, v, a = qkva(name, B, Hq, Hkv, N, D, with_aux)
    pos = mkpos(segs, B)
    out = sink_flash_attention_packed(q, k, v, pos, ns, W, s_aux=a,
                                      block_q=64, block_kv=64)
    ref = eager_sink_attention_packed(q, k, v, pos, ns, W, s_aux=a)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_single_segment_equals_unpacked():
    q, k, v, a = qkva("single", 1, 2, 2, 256, 64, True)
    pos = jnp.arange(256, dtype=jnp.int32)[None]
    out = sink_flash_attention_packed(q, k, v, pos, 4, 64, s_aux=a,
                                      block_q=64, block_kv=64)
    ref = eager_sink_attention(q, k, v, 4, 64, s_aux=a)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_no_cross_segment_leakage():
    """Mutating segment 1's K/V must not change segment 2's outputs."""
    q, k, v, _ = qkva("leak", 1, 2, 2, 256, 64)
    pos = mkpos([128, 128])
    out1 = sink_flash_attention_packed(q, k, v, pos, 4, 64, block_q=64,
                                       block_kv=64)
    k2 = k.at[:, :, :128].multiply(-3.0)
    v2 = v.at[:, :, :128].add(7.0)
    out2 = sink_flash_attention_packed(q, k2, v2, pos, 4, 64, block_q=64,
                                       block_kv=64)
    np.testing.assert_allclose(np.asarray(out1[:, :, 128:]),
                               np.asarray(out2[:, :, 128:]), atol=1e-6)
    assert not np.allclose(np.asarray(out1[:, :, :128]),
                           np.asarray(out2[:, :, :128]), atol=1e-2)


@pytest.mark.parametrize("cfg", [
    ("ragged", 1, 4, 2, 256, 64, [100, 30, 70, 56], 4, 64, True),
    ("long-seg", 1, 2, 2, 512, 64, [400, 112], 4, 64, True),
    ("tiny-segs", 1, 2, 1, 256, 32, [8] * 32, 4, 64, False),
    ("unaligned", 1, 2, 2, 250, 48, [90, 160], 4, 60, False),
], ids=lambda c: c[0])
def test_packed_grads_match_oracle(cfg):
    name, B, Hq, Hkv, N, D, segs, ns, W, with_aux = cfg
    q, k, v, a = qkva("g" + name, B, Hq, Hkv, N, D, with_aux)
    pos = mkpos(segs, B)
    argnums = (0, 1, 2, 3) if with_aux else (0, 1, 2)

    def loss_kernel(q, k, v, a=None):
        return (sink_flash_attention_packed(
            q, k, v, pos, ns, W, s_aux=a, block_q=64, block_kv=64) ** 2).sum()

    def loss_ref(q, k, v, a=None):
        return (eager_sink_attention_packed(
            q, k, v, pos, ns, W, s_aux=a) ** 2).sum()

    args = (q, k, v, a) if with_aux else (q, k, v)
    gk = jax.grad(loss_kernel, argnums)(*args)
    gr = jax.grad(loss_ref, argnums)(*args)
    for nm, x, y in zip(["dq", "dk", "dv", "ds_aux"], gk, gr):
        abs_err = np.max(np.abs(np.asarray(x) - np.asarray(y)))
        rel_err = np.max(np.abs(np.asarray(x) - np.asarray(y)) /
                         (np.abs(np.asarray(y)) + 1e-3))
        assert abs_err < 2e-3 or rel_err < 1e-3, (name, nm, abs_err, rel_err)


def test_packed_bf16():
    q, k, v, a = qkva("bf16", 1, 4, 2, 256, 64, True)
    pos = mkpos([100, 156])
    out = sink_flash_attention_packed(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), pos, 4, 64, s_aux=a, block_q=64,
        block_kv=64)
    ref = eager_sink_attention_packed(q, k, v, pos, 4, 64, s_aux=a)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), atol=3e-2)


def test_model_level_packed_forward_matches_separate():
    """forward_prefill over a packed batch (packed attn_impl + segment-
    local RoPE positions) must equal separate forwards per segment —
    the packed-training integration the reference lacks entirely."""
    from sink_attention_tpu.models import (ModelConfig, init_params,
                                           forward_prefill)

    cfg = ModelConfig.tiny(num_layers=2, vocab_size=64, sliding_window=16)
    params = init_params(cfg, jax.random.PRNGKey(7), jnp.float32)
    segs = [24, 40]
    N = sum(segs)
    ids = jax.random.randint(jax.random.PRNGKey(8), (1, N), 0, 64)
    pos = mkpos(segs)

    def packed_attn(q, k, v, *, num_sink, window_size, s_aux):
        return sink_flash_attention_packed(
            q, k, v, pos, num_sink, window_size, s_aux=s_aux,
            block_q=32, block_kv=32)

    logits_packed, _ = forward_prefill(params, cfg, ids,
                                       positions=pos[0],
                                       attn_impl=packed_attn)

    off = 0
    for L in segs:
        seg_ids = ids[:, off:off + L]
        logits_sep, _ = forward_prefill(params, cfg, seg_ids)
        np.testing.assert_allclose(
            np.asarray(logits_packed[:, off:off + L]),
            np.asarray(logits_sep), atol=2e-4, rtol=1e-3)
        off += L
