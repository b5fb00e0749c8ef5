"""Sharded training step (DP x Ulysses-SP x TP/EP) on a device mesh.

Runs on real chips or, for a dry run, on a virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train.py

Packed (multi-segment) batches: swap the loss for
``parallel.train.cross_entropy_loss_packed`` and feed position_ids.
Memory levers for big models / long sequences (all composable):
``make_train_step(fsdp=True)`` (ZeRO-3 weight+optimizer sharding over
'data'), ``remat=True`` (recompute layer activations in backward),
``accum_steps=k`` (microbatch gradient accumulation).
"""

import os
import sys

sys.path.insert(0, ".")

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin can override the env var; force it through
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from sink_attention_tpu.models import ModelConfig, init_params
from sink_attention_tpu.parallel import make_mesh
from sink_attention_tpu.parallel.train import make_train_step


def main():
    n = jax.device_count()
    tp = 2 if n % 2 == 0 else 1
    dp = n // tp
    mesh = make_mesh({"data": dp, "seq": 1, "model": tp})
    cfg = ModelConfig.tiny(num_heads=4 * tp, num_kv_heads=2 * tp,
                           num_experts=2 * tp, vocab_size=512,
                           num_layers=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    opt = optax.adamw(1e-3)
    step, p_sh = make_train_step(cfg, mesh, opt, fsdp=dp > 1, remat=True,
                                 accum_steps=2)
    params = jax.device_put(params, p_sh)
    opt_state = opt.init(params)
    batch = jax.random.randint(jax.random.PRNGKey(1), (2 * dp, 129), 0,
                               cfg.vocab_size)
    for i in range(5):
        params, opt_state, loss = step(params, opt_state, batch)
        print(f"step {i}: loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
