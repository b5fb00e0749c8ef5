"""Pipeline parallelism: GPipe-style microbatched stages over a mesh axis.

The reference has no pipeline parallelism at all (SURVEY.md §2.3 — TP/PP/EP
absent). Here it is built the TPU way: an SPMD program under ``shard_map``
where every device runs the same per-step stage function and activations
hop stage-to-stage with ``jax.lax.ppermute`` over the 'pipe' mesh axis.

Schedule: classic GPipe. With S stages and M microbatches, the loop runs
``T = M + S - 1`` steps; at step t, stage s processes microbatch ``t - s``
(bubble steps compute-and-discard). Because the whole schedule is a
``lax.scan`` of pure collectives, ``jax.grad`` differentiates straight
through it — the backward pass is the transposed pipeline (reverse
ppermute), no hand-written 1F1B needed.

Layer parameters are stacked [S, L/S, ...] with the stage dimension sharded
over 'pipe', so each device holds only its own stage's layers. Embedding /
lm_head / final_norm are replicated (they are small next to the stack).

Composes with DP (batch over 'data') and Ulysses SP (sequence over 'seq',
resharded head<->seq inside the attention op). TP inside the pipeline
island is not wired yet — use the non-PP ``parallel.train`` path for TP/EP.

Constraint: ``layer_types`` must tile evenly so every stage sees the same
static sliding/full pattern (SPMD requires one program).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..models.model import decoder_layer, rms_norm, rope_cos_sin

__all__ = ["stack_pipeline_params", "unstack_pipeline_params",
           "pipeline_forward", "make_pp_train_step",
           "pipeline_param_shardings"]


def _stage_pattern(cfg: ModelConfig, num_stages: int):
    L = cfg.num_layers
    assert L % num_stages == 0, (L, num_stages)
    per = L // num_stages
    pattern = tuple(cfg.layer_types[:per])
    for s in range(num_stages):
        got = tuple(cfg.layer_types[s * per:(s + 1) * per])
        assert got == pattern, (
            f"pipeline stages need identical layer_type patterns; stage {s} "
            f"has {got}, stage 0 has {pattern}")
    return per, pattern


def stack_pipeline_params(params: dict, num_stages: int) -> dict:
    """[L] list-of-layer params -> stacked {'stages': [S, L/S, ...]} pytree."""
    L = len(params["layers"])
    assert L % num_stages == 0, (L, num_stages)
    per = L // num_stages
    stages = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves).reshape(
            (num_stages, per) + leaves[0].shape),
        *params["layers"])
    return {"embed": params["embed"], "stages": stages,
            "final_norm": params["final_norm"],
            "lm_head": params["lm_head"]}


def unstack_pipeline_params(pp_params: dict, num_layers: int) -> dict:
    """Inverse of :func:`stack_pipeline_params`."""
    stages = pp_params["stages"]
    S, per = jax.tree_util.tree_leaves(stages)[0].shape[:2]
    assert S * per == num_layers
    layers = [jax.tree_util.tree_map(lambda x: x[s, j], stages)
              for s in range(S) for j in range(per)]
    return {"embed": pp_params["embed"], "layers": layers,
            "final_norm": pp_params["final_norm"],
            "lm_head": pp_params["lm_head"]}


def pipeline_param_shardings(cfg: ModelConfig, mesh: Mesh,
                             pipe_axis: str = "pipe"):
    """Shardings for the stacked params: stage dim over 'pipe', the rest
    replicated (TP inside the pipeline island is not wired yet)."""
    pp = pipe_axis

    def s(*spec):
        return NamedSharding(mesh, P(*spec))

    def stage_leaf(ndim_tail):
        return s(pp, *([None] * (ndim_tail + 1)))

    stages = {
        "attn": {
            "wq": stage_leaf(2), "bq": stage_leaf(1),
            "wk": stage_leaf(2), "bk": stage_leaf(1),
            "wv": stage_leaf(2), "bv": stage_leaf(1),
            "wo": stage_leaf(2), "bo": stage_leaf(1),
            "sinks": stage_leaf(1),
        },
        "mlp": {
            "router_w": stage_leaf(2), "router_b": stage_leaf(1),
            "gate_up": stage_leaf(3), "gate_up_b": stage_leaf(2),
            "down": stage_leaf(3), "down_b": stage_leaf(2),
        },
        "ln1": stage_leaf(1),
        "ln2": stage_leaf(1),
    }
    return {"embed": s(), "stages": stages, "final_norm": s(),
            "lm_head": s()}


def pipeline_forward(pp_params: dict, cfg: ModelConfig, input_ids,
                     num_stages: int, num_microbatches: int,
                     axis_name: str = "pipe",
                     seq_axis: Optional[str] = None, attn_impl=None,
                     interpret: Optional[bool] = None):
    """Pipelined logits. MUST run inside shard_map over ``axis_name`` (and
    ``seq_axis`` if given).

    Args:
        pp_params: stacked params with the 'stages' leading dim sliced to
            this rank's stage (shape [1, L/S, ...] inside the island).
        input_ids: [B, N] token ids, replicated over the pipe/seq axes
            (the sequence is sliced locally here when seq_axis is set).
        attn_impl: attention op on [*, H, N_local, D] (default: plain
            Pallas kernel; pass a Ulysses wrapper for SP).

    Returns logits [B, N_local, V], identical on every pipe rank.
    """
    per, _ = _stage_pattern(cfg, num_stages)
    S, M = num_stages, num_microbatches
    B, N = input_ids.shape
    assert B % M == 0, (B, M)
    mb = B // M

    if attn_impl is None:
        from ..ops.flash import sink_flash_attention
        attn_impl = functools.partial(sink_flash_attention,
                                      interpret=interpret)

    if seq_axis is not None:
        sp = jax.lax.axis_size(seq_axis)
        assert N % sp == 0, (N, sp)
        n_local = N // sp
        seq_rank = jax.lax.axis_index(seq_axis)
        ids_local = jax.lax.dynamic_slice_in_dim(
            input_ids, seq_rank * n_local, n_local, axis=1)
        positions = seq_rank * n_local + jnp.arange(n_local)
    else:
        n_local = N
        ids_local = input_ids
        positions = jnp.arange(N)

    s_idx = jax.lax.axis_index(axis_name)
    stage_layers = jax.tree_util.tree_map(lambda x: x[0],
                                          pp_params["stages"])
    cos, sin = rope_cos_sin(cfg, positions)

    def stage_fn(x):
        for j in range(per):
            lp = jax.tree_util.tree_map(lambda a: a[j], stage_layers)
            window = cfg.window_for_layer(j, N)  # same pattern per stage
            x = decoder_layer(lp, cfg, x, cos, sin, window, attn_impl)
        return x

    embed = pp_params["embed"]
    micro = ids_local.reshape(M, mb, n_local)

    def first_stage_input(t):
        ids = jax.lax.dynamic_index_in_dim(
            micro, jnp.clip(t, 0, M - 1), keepdims=False)
        return embed[ids].astype(embed.dtype)

    H = cfg.hidden_size
    state = jnp.zeros((mb, n_local, H), embed.dtype)
    outs = jnp.zeros((M, mb, n_local, H), embed.dtype)

    def step(carry, t):
        state, outs = carry
        x_in = jnp.where(s_idx == 0, first_stage_input(t), state)
        x_out = stage_fn(x_in)
        # Last stage banks microbatch (t - S + 1) when it is live.
        mslot = jnp.clip(t - (S - 1), 0, M - 1)
        live = (s_idx == S - 1) & (t >= S - 1)
        banked = jax.lax.dynamic_update_index_in_dim(
            outs, x_out, mslot, axis=0)
        outs = jax.tree_util.tree_map(
            lambda new, old: jnp.where(live, new, old), banked, outs)
        # Shift activations down the pipe (the S-1 -> 0 wraparound is
        # discarded: stage 0 always overwrites with a fresh embedding).
        state = jax.lax.ppermute(
            x_out, axis_name, [(i, (i + 1) % S) for i in range(S)])
        return (state, outs), None

    (state, outs), _ = jax.lax.scan(step, (state, outs),
                                    jnp.arange(M + S - 1))

    x = outs.reshape(B, n_local, H)
    x = rms_norm(x, pp_params["final_norm"], cfg.rms_norm_eps)
    logits = x @ pp_params["lm_head"].astype(x.dtype)
    # Broadcast the last stage's logits to every pipe rank so downstream
    # loss code is SPMD-uniform. (Transpose routes the cotangent back to
    # the last stage only.)
    logits = jax.lax.psum(
        jnp.where(s_idx == S - 1, logits, jnp.zeros_like(logits)),
        axis_name)
    return logits


def make_pp_train_step(cfg: ModelConfig, mesh: Mesh, optimizer,
                       num_microbatches: int = 2,
                       pipe_axis: str = "pipe",
                       interpret: Optional[bool] = None):
    """Jitted pipeline-parallel training step over mesh axes
    ('pipe'[, 'data'][, 'seq']).

    DP shards the batch over 'data'; Ulysses SP reshards sequence<->heads
    inside the attention op over 'seq'. Returns (step_fn, shardings);
    ``step_fn(pp_params, opt_state, batch)`` with batch int32 [B, N+1]
    sharded over 'data'.
    """
    S = mesh.shape[pipe_axis]
    assert mesh.shape.get("model", 1) == 1, (
        "TP inside the pipeline island is not supported; use parallel.train")
    seq_axis = "seq" if mesh.shape.get("seq", 1) > 1 else None
    data_axis = "data" if mesh.shape.get("data", 1) > 1 else None

    def attn_impl(q, k, v, *, num_sink, window_size, s_aux):
        if seq_axis is not None:
            from .ulysses import ulysses_sink_flash_attention
            return ulysses_sink_flash_attention(
                q, k, v, num_sink=num_sink, window_size=window_size,
                s_aux=s_aux, axis_name=seq_axis, interpret=interpret)
        from ..ops.flash import sink_flash_attention
        return sink_flash_attention(
            q, k, v, num_sink=num_sink, window_size=window_size,
            s_aux=s_aux, interpret=interpret)

    p_shardings = pipeline_param_shardings(cfg, mesh, pipe_axis)
    param_specs = jax.tree_util.tree_map(lambda sh: sh.spec, p_shardings)
    batch_spec = P(data_axis, None)

    def loss_fn(pp_params, batch):
        inputs, targets = batch[:, :-1], batch[:, 1:]
        logits = pipeline_forward(
            pp_params, cfg, inputs, num_stages=S,
            num_microbatches=num_microbatches, axis_name=pipe_axis,
            seq_axis=seq_axis, attn_impl=attn_impl, interpret=interpret)
        if seq_axis is not None:
            n_local = logits.shape[1]
            r = jax.lax.axis_index(seq_axis)
            targets = jax.lax.dynamic_slice_in_dim(
                targets, r * n_local, n_local, axis=1)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)
        return -jnp.mean(ll)

    def island_grad(pp_params, batch):
        loss, grads = jax.value_and_grad(loss_fn)(pp_params, batch)
        # The loss is replicated across pipe ranks (psum-broadcast logits),
        # so S independent copies each seed a cotangent of 1 and psum's
        # transpose sums them: every grad arrives S times too large.
        grads = jax.tree_util.tree_map(lambda g: g / S, grads)
        # Stage-sharded leaves already hold per-stage grads; replicated
        # leaves (embed, lm_head, final_norm) got contributions on
        # different pipe ranks (embedding on stage 0's input path, head on
        # stage S-1) — sum them so every rank applies the same update.
        grads = jax.tree_util.tree_map(
            lambda g, sp: g if (len(sp) > 0 and sp[0] == pipe_axis)
            else jax.lax.psum(g, pipe_axis),
            grads, param_specs)
        for ax in (seq_axis, data_axis):
            if ax is not None:
                loss = jax.lax.pmean(loss, ax)
                grads = jax.tree_util.tree_map(
                    lambda g: jax.lax.pmean(g, ax), grads)
        return loss, grads

    grad_island = jax.shard_map(
        island_grad, mesh=mesh,
        in_specs=(param_specs, batch_spec),
        out_specs=(P(), param_specs),
        check_vma=False)

    def step(pp_params, opt_state, batch):
        loss, grads = grad_island(pp_params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, pp_params)
        pp_params = jax.tree_util.tree_map(lambda p, u: p + u, pp_params,
                                           updates)
        return pp_params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(p_shardings, None, NamedSharding(mesh, batch_spec)),
        out_shardings=(p_shardings, None, None),
    ), p_shardings
