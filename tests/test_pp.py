"""Pipeline parallelism: GPipe schedule correctness on a virtual CPU mesh.

The pipeline is exact (no approximation), so its logits and loss must match
the single-device forward bit-for-bit-ish (fp32 tolerance).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sink_attention_tpu.models import ModelConfig, init_params
from sink_attention_tpu.models.model import forward_prefill
from sink_attention_tpu.parallel import make_mesh
from sink_attention_tpu.parallel.pp import (
    make_pp_train_step,
    pipeline_forward,
    pipeline_param_shardings,
    stack_pipeline_params,
    unstack_pipeline_params,
)
from sink_attention_tpu.parallel.train import cross_entropy_loss


def _cfg(num_layers=4):
    return ModelConfig.tiny(num_heads=4, num_kv_heads=2, head_dim=16,
                            hidden_size=32, num_experts=2,
                            sliding_window=16, vocab_size=64,
                            num_layers=num_layers)


def test_stack_roundtrip():
    cfg = _cfg(4)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    pp = stack_pipeline_params(params, 2)
    back = unstack_pipeline_params(pp, 4)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("stages,micro", [(2, 2), (4, 2), (2, 4)])
def test_pipeline_logits_match_single_device(stages, micro):
    cfg = _cfg(4)
    if stages == 4:
        # 1 layer/stage: the sliding/full alternation can't tile, so use a
        # uniform pattern (the constraint is asserted by _stage_pattern).
        cfg = dataclasses.replace(cfg, layer_types=("sliding_attention",) * 4)
    params = init_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    B, N = micro * 2, 32
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, N), 0,
                             cfg.vocab_size)

    ref_logits, _ = forward_prefill(params, cfg, ids)

    mesh = make_mesh({"pipe": stages}, devices=jax.devices()[:stages])
    pp_params = stack_pipeline_params(params, stages)
    shardings = pipeline_param_shardings(cfg, mesh)
    pp_params = jax.device_put(pp_params, shardings)
    specs = jax.tree_util.tree_map(lambda s: s.spec, shardings)

    fwd = jax.jit(jax.shard_map(
        lambda pp, ids: pipeline_forward(
            pp, cfg, ids, num_stages=stages, num_microbatches=micro,
            axis_name="pipe"),
        mesh=mesh, in_specs=(specs, P(None, None)),
        out_specs=P(None, None, None), check_vma=False))
    got = fwd(pp_params, ids)

    err = float(jnp.max(jnp.abs(got - ref_logits)))
    assert err < 5e-4, err


def test_pp_train_step_matches_reference_loss():
    cfg = _cfg(4)
    params = init_params(cfg, jax.random.PRNGKey(3), jnp.float32)
    mesh = make_mesh({"pipe": 2}, devices=jax.devices()[:2])
    optimizer = optax.sgd(1e-2)
    step, shardings = make_pp_train_step(cfg, mesh, optimizer,
                                         num_microbatches=2)
    pp_params = jax.device_put(stack_pipeline_params(params, 2), shardings)
    opt_state = optimizer.init(pp_params)
    batch = jax.random.randint(jax.random.PRNGKey(4), (4, 33), 0,
                               cfg.vocab_size)

    pp_params2, opt_state, loss = step(pp_params, opt_state, batch)
    ref_loss = float(cross_entropy_loss(params, cfg, batch))
    assert abs(float(loss) - ref_loss) < 5e-5, (float(loss), ref_loss)

    # params actually moved, and stayed finite
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), pp_params, pp_params2)
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    assert all(np.isfinite(x).all() for x in
               jax.tree_util.tree_leaves(jax.device_get(pp_params2)))


def test_pp_with_dp_and_sp():
    cfg = dataclasses.replace(_cfg(2),
                              layer_types=("sliding_attention",) * 2)
    params = init_params(cfg, jax.random.PRNGKey(5), jnp.float32)
    mesh = make_mesh({"data": 2, "pipe": 2, "seq": 2},
                     devices=jax.devices()[:8])
    optimizer = optax.sgd(1e-2)
    step, shardings = make_pp_train_step(cfg, mesh, optimizer,
                                         num_microbatches=2)
    pp_params = jax.device_put(stack_pipeline_params(params, 2), shardings)
    opt_state = optimizer.init(pp_params)
    # batch: 2 dp shards x 4 sequences, seq len 32 (+1 target)
    batch = jax.random.randint(jax.random.PRNGKey(6), (8, 33), 0,
                               cfg.vocab_size)
    _, _, loss = step(pp_params, opt_state, batch)
    ref_loss = float(cross_entropy_loss(params, cfg, batch))
    assert abs(float(loss) - ref_loss) < 5e-5, (float(loss), ref_loss)


def test_pp_grads_match_single_device():
    cfg = dataclasses.replace(_cfg(2),
                              layer_types=("sliding_attention",) * 2)
    params = init_params(cfg, jax.random.PRNGKey(7), jnp.float32)
    batch = jax.random.randint(jax.random.PRNGKey(8), (4, 17), 0,
                               cfg.vocab_size)

    ref_grads = jax.grad(cross_entropy_loss)(params, cfg, batch)

    mesh = make_mesh({"pipe": 2}, devices=jax.devices()[:2])
    optimizer = optax.sgd(1.0)  # update == -grad for SGD lr 1
    step, shardings = make_pp_train_step(cfg, mesh, optimizer,
                                         num_microbatches=2)
    pp_params = jax.device_put(stack_pipeline_params(params, 2), shardings)
    opt_state = optimizer.init(pp_params)
    pp_params2, _, _ = step(pp_params, opt_state, batch)
    # grad = params - params2 (lr=1 SGD)
    got = jax.tree_util.tree_map(lambda a, b: a - b, pp_params, pp_params2)
    got = unstack_pipeline_params(jax.device_get(got), cfg.num_layers)

    for ga, gb in zip(jax.tree_util.tree_leaves(ref_grads),
                      jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   atol=2e-4, rtol=1e-3)


def test_pp_with_tp_matches_reference():
    """PP x TP/EP: heads+experts sharded over 'model' inside the pipeline
    island (parallel/tp.py conjugate operators). Loss AND grads must match
    the single-device reference."""
    cfg = dataclasses.replace(
        _cfg(2), num_heads=4, num_kv_heads=2, num_experts=4,
        layer_types=("sliding_attention",) * 2)
    params = init_params(cfg, jax.random.PRNGKey(9), jnp.float32)
    batch = jax.random.randint(jax.random.PRNGKey(10), (4, 17), 0,
                               cfg.vocab_size)
    ref_loss = float(cross_entropy_loss(params, cfg, batch))
    ref_grads = jax.grad(cross_entropy_loss)(params, cfg, batch)

    mesh = make_mesh({"pipe": 2, "model": 2}, devices=jax.devices()[:4])
    optimizer = optax.sgd(1.0)  # update == -grad
    step, shardings = make_pp_train_step(cfg, mesh, optimizer,
                                         num_microbatches=2)
    pp_params = jax.device_put(stack_pipeline_params(params, 2), shardings)
    opt_state = optimizer.init(pp_params)
    pp_params2, _, loss = step(pp_params, opt_state, batch)
    assert abs(float(loss) - ref_loss) < 5e-5, (float(loss), ref_loss)

    got = jax.tree_util.tree_map(lambda a, b: a - b, pp_params, pp_params2)
    got = unstack_pipeline_params(jax.device_get(got), cfg.num_layers)
    for ga, gb in zip(jax.tree_util.tree_leaves(ref_grads),
                      jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   atol=2e-4, rtol=1e-3)


def test_pp_tp_dp_composition():
    """The full (data=2, pipe=2, model=2) mesh from VERDICT item 9."""
    cfg = dataclasses.replace(
        _cfg(2), num_heads=4, num_kv_heads=2, num_experts=4,
        layer_types=("sliding_attention",) * 2)
    params = init_params(cfg, jax.random.PRNGKey(11), jnp.float32)
    mesh = make_mesh({"data": 2, "pipe": 2, "model": 2},
                     devices=jax.devices()[:8])
    optimizer = optax.sgd(1e-2)
    step, shardings = make_pp_train_step(cfg, mesh, optimizer,
                                         num_microbatches=2)
    pp_params = jax.device_put(stack_pipeline_params(params, 2), shardings)
    opt_state = optimizer.init(pp_params)
    batch = jax.random.randint(jax.random.PRNGKey(12), (4, 17), 0,
                               cfg.vocab_size)
    _, _, loss = step(pp_params, opt_state, batch)
    ref_loss = float(cross_entropy_loss(params, cfg, batch))
    assert abs(float(loss) - ref_loss) < 5e-5, (float(loss), ref_loss)


@pytest.mark.parametrize("stages,micro,virtual", [(2, 2, 2), (2, 4, 2)])
def test_interleaved_schedule_matches_reference(stages, micro, virtual):
    """num_virtual > 1 (Megatron interleaved schedule, V-times smaller
    bubble) must stay exact: loss and grads match single-device."""
    cfg = dataclasses.replace(
        _cfg(stages * virtual),
        layer_types=("sliding_attention",) * (stages * virtual))
    params = init_params(cfg, jax.random.PRNGKey(13), jnp.float32)
    batch = jax.random.randint(jax.random.PRNGKey(14), (micro * 2, 17), 0,
                               cfg.vocab_size)
    ref_loss = float(cross_entropy_loss(params, cfg, batch))
    ref_grads = jax.grad(cross_entropy_loss)(params, cfg, batch)

    mesh = make_mesh({"pipe": stages}, devices=jax.devices()[:stages])
    optimizer = optax.sgd(1.0)
    step, shardings = make_pp_train_step(cfg, mesh, optimizer,
                                         num_microbatches=micro,
                                         num_virtual=virtual)
    pp_params = jax.device_put(
        stack_pipeline_params(params, stages, num_virtual=virtual),
        shardings)
    opt_state = optimizer.init(pp_params)
    pp_params2, _, loss = step(pp_params, opt_state, batch)
    assert abs(float(loss) - ref_loss) < 5e-5, (float(loss), ref_loss)

    got = jax.tree_util.tree_map(lambda a, b: a - b, pp_params, pp_params2)
    got = unstack_pipeline_params(jax.device_get(got), cfg.num_layers)
    for ga, gb in zip(jax.tree_util.tree_leaves(ref_grads),
                      jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   atol=2e-4, rtol=1e-3)
