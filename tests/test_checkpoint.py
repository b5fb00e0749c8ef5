"""Checkpoint/resume round-trip: params and mid-generation cache state."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sink_attention_tpu.cache import SinkKVCache
from sink_attention_tpu.utils import checkpoint as ckpt


def test_params_roundtrip(tmp_path):
    from sink_attention_tpu.models import ModelConfig, init_params
    cfg = ModelConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    ckpt.save(str(tmp_path / "params"), params)
    restored = ckpt.restore(str(tmp_path / "params"))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, restored)


def test_cache_roundtrip_mid_generation(tmp_path):
    cache = SinkKVCache.init(1, 2, 16, num_sink=2, window_size=8,
                             dtype=jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 12, 16))
    cache = cache.prefill(k, k + 1)
    cache = cache.append(k[:, :, :1], k[:, :, :1])
    ckpt.save(str(tmp_path / "cache"), cache)
    arrays = ckpt.restore(str(tmp_path / "cache"))
    # orbax restores the flax.struct dataclass as a field-name dict
    for name in ["k", "v", "k_scale", "v_scale", "sink_len", "window_len",
                 "write_pos", "seen"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(cache, name)), np.asarray(arrays[name]),
            err_msg=name)
