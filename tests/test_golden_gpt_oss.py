"""Golden gpt-oss-20b criterion test (skip-if-weights-absent).

Reference: /root/reference/tests/test_gpt_oss_model.py:16-164 — eager vs
patched-kernel vs FA2 on real 20b logits, asserting the kernel is strictly
closer to eager. Real weights cannot be downloaded in this environment, so
the full-checkpoint path skips unless a local snapshot exists; the
protocol itself (same forward, full-causal/no-sink ablation as the FA2
stand-in, metric computation) is exercised on a tiny random model against
the eager attention oracle so the harness stays pinned.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from golden_gpt_oss import _metrics, find_checkpoint  # noqa: E402

from sink_attention_tpu.models import (  # noqa: E402
    ModelConfig,
    forward_prefill,
    init_params,
)
from sink_attention_tpu.ops import sink_flash_attention  # noqa: E402
from sink_attention_tpu.ops.reference import (  # noqa: E402
    eager_sink_attention,
)


def _fa2_standin(q, k, v, num_sink, window_size, s_aux=None, **kw):
    return sink_flash_attention(q, k, v, num_sink=0,
                                window_size=q.shape[2], s_aux=None)


def _eager_impl(q, k, v, num_sink, window_size, s_aux=None, **kw):
    return eager_sink_attention(q, k, v, num_sink, window_size, s_aux=s_aux)


def test_golden_protocol_on_tiny_model():
    """The golden harness's three-way comparison, with the package's eager
    oracle standing in for HF eager on a tiny random model: the kernel
    must be (numerically) close to eager and the full-causal ablation must
    be measurably farther — the exact shape of the 20b criterion.

    Thresholds are set from measured round-5 margins (fp32, CPU, seeds
    0-2): kernel mean_abs 2.35e-8 to 2.42e-8 (cos 1.000000), ablation
    mean_abs 1.69e-2 to 1.90e-2, ratio 7.2e5 to 7.9e5. Bounds below give
    ~40x headroom on the kernel error and sit ~70x under the measured
    ratio — a kernel regressed to the round-4 bound (5e-2 / ratio 4)
    would now fail loudly instead of passing a degraded state (round-3
    review ask #8)."""
    cfg = ModelConfig.tiny(sliding_window=32, num_sink_tokens=4)
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 96)))

    eager = forward_prefill(params, cfg, ids, attn_impl=_eager_impl)[0]
    ours = forward_prefill(params, cfg, ids)[0]
    ablation = forward_prefill(params, cfg, ids, attn_impl=_fa2_standin)[0]

    mk = _metrics(ours, eager)
    ma = _metrics(ablation, eager)
    # Kernel vs eager: same math, kernel-precision differences only
    # (measured 2.4e-8 at fp32).
    assert mk["mean_abs"] < 1e-6, mk
    # Ablation: different attention pattern -> far from eager (measured
    # ratio ~7e5; floor set at measured / ~70).
    assert ma["mean_abs"] > 1e4 * mk["mean_abs"], (mk, ma)
    assert ma["mean_abs"] > 5e-3, ma
    assert mk["cos"] > ma["cos"]


@pytest.mark.skipif(find_checkpoint(None) is None,
                    reason="no local gpt-oss-20b checkpoint (zero egress)")
def test_golden_real_checkpoint():
    """Runs the real-weights criterion when a checkpoint is present."""
    from golden_gpt_oss import run

    rc = run(find_checkpoint(None), num_prompts=1, seq_len=128,
             quant="int8" if jax.default_backend() == "cpu" else "int4",
             skip_hf=False, out_path=None)
    assert rc == 0
