"""Pipeline parallelism: microbatched stages over a mesh axis, with an
interleaved (virtual-chunk) schedule and tensor parallelism inside the
pipeline island.

The reference has no pipeline parallelism at all (SURVEY.md §2.3 — TP/PP/EP
absent). Here it is built the TPU way: an SPMD program under ``shard_map``
where every device runs the same per-step stage function and activations
hop stage-to-stage with ``jax.lax.ppermute`` over the 'pipe' mesh axis.

Schedule. With S stages, M microbatches, and V *virtual chunks* per device
(``num_virtual``, the interleaved schedule of Megatron-LM,
arXiv:2104.04473 §2.2), the model's layers split into C = S*V chunks and
device s holds chunks ``{v*S + s : v < V}``. The scan runs
``T = V*M + S - 1`` steps; at step t device s executes work item
``w = t - s``, where work items order microbatches in groups of S through
all V chunks:

    g = w // (V*S);  v = (w % (V*S)) // S;  i = w % S;  m = g*S + i

Each item's input activation arrives from the previous chunk via the ring
ppermute (the (S-1) -> 0 wraparound carries chunk v -> v+1 handoffs), so
the pipe bubble shrinks from (S-1)/(M+S-1) of the step budget to
(S-1)/(V*M+S-1) — V times smaller. V=1 reduces to classic GPipe.
V>1 requires M % S == 0. Because the whole schedule is a ``lax.scan`` of
pure collectives, ``jax.grad`` differentiates straight through it — the
backward pass is the transposed (reversed) pipeline, no hand-written 1F1B
needed, with the same bubble fraction.

Layer parameters are stacked [S, V, L/(S*V), ...] with the stage dimension
sharded over 'pipe'. Embedding / lm_head / final_norm are replicated.

Composes with DP (batch over 'data'), Ulysses SP (sequence over 'seq',
resharded head<->seq inside the attention op), and TP/EP (heads and
experts over 'model' *inside* the pipeline island via the Megatron-style
conjugate operators in parallel/tp.py).

Constraint: ``layer_types`` must tile evenly so every chunk sees the same
static sliding/full pattern (SPMD requires one program).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..models.model import rms_norm, rope_cos_sin
from .tp import tp_decoder_layer, tp_local_config

__all__ = ["stack_pipeline_params", "unstack_pipeline_params",
           "pipeline_forward", "make_pp_train_step",
           "pipeline_param_shardings"]


def _stage_pattern(cfg: ModelConfig, num_chunks: int):
    L = cfg.num_layers
    assert L % num_chunks == 0, (L, num_chunks)
    per = L // num_chunks
    pattern = tuple(cfg.layer_types[:per])
    for c in range(num_chunks):
        got = tuple(cfg.layer_types[c * per:(c + 1) * per])
        assert got == pattern, (
            f"pipeline chunks need identical layer_type patterns; chunk {c} "
            f"has {got}, chunk 0 has {pattern}")
    return per, pattern


def stack_pipeline_params(params: dict, num_stages: int,
                          num_virtual: int = 1) -> dict:
    """[L] list-of-layer params -> stacked {'stages': [S, V, L/(S*V), ...]}.

    Element [s, v] holds chunk ``v*num_stages + s`` (device s's v-th
    virtual chunk), i.e. layers ``[(v*S+s)*per, (v*S+s+1)*per)``."""
    L = len(params["layers"])
    S, V = num_stages, num_virtual
    assert L % (S * V) == 0, (L, S, V)
    per = L // (S * V)

    def stack(*leaves):
        x = jnp.stack(leaves).reshape((V, S, per) + leaves[0].shape)
        return jnp.moveaxis(x, 1, 0)  # [S, V, per, ...]

    stages = jax.tree_util.tree_map(stack, *params["layers"])
    return {"embed": params["embed"], "stages": stages,
            "final_norm": params["final_norm"],
            "lm_head": params["lm_head"]}


def unstack_pipeline_params(pp_params: dict, num_layers: int) -> dict:
    """Inverse of :func:`stack_pipeline_params`."""
    stages = pp_params["stages"]
    S, V, per = jax.tree_util.tree_leaves(stages)[0].shape[:3]
    assert S * V * per == num_layers
    layers = [jax.tree_util.tree_map(lambda x: x[c % S, c // S, j], stages)
              for c in range(S * V) for j in range(per)]
    return {"embed": pp_params["embed"], "layers": layers,
            "final_norm": pp_params["final_norm"],
            "lm_head": pp_params["lm_head"]}


def pipeline_param_shardings(cfg: ModelConfig, mesh: Mesh,
                             pipe_axis: str = "pipe",
                             model_axis: Optional[str] = None):
    """Shardings for the stacked params: stage dim over 'pipe'; with
    ``model_axis``, heads/experts over 'model' inside each stage
    (parallel/tp.py layout — q/k/v output-dim, wo input-dim, sinks,
    expert dim; router/bo/norms replicated)."""
    pp, m = pipe_axis, model_axis

    def s(*spec):
        return NamedSharding(mesh, P(*spec))

    def leaf(ndim_tail, shard_dim=None):
        # [S, V, per, <tail>]; shard_dim indexes into the tail
        spec = [pp, None, None] + [None] * ndim_tail
        if m is not None and shard_dim is not None:
            spec[3 + shard_dim] = m
        return s(*spec)

    attn = {
        "wq": leaf(2, 1), "bq": leaf(1, 0),
        "wk": leaf(2, 1), "bk": leaf(1, 0),
        "wv": leaf(2, 1), "bv": leaf(1, 0),
        "wo": leaf(2, 0), "bo": leaf(1),
    }
    if cfg.use_s_aux:
        attn["sinks"] = leaf(1, 0)
    if cfg.mlp_type == "dense":
        # Megatron split: gate/up column-parallel, down row-parallel
        mlp = {"gate": leaf(2, 1), "up": leaf(2, 1), "down": leaf(2, 0)}
    else:
        mlp = {
            "router_w": leaf(2), "router_b": leaf(1),
            "gate_up": leaf(3, 0), "gate_up_b": leaf(2, 0),
            "down": leaf(3, 0), "down_b": leaf(2, 0),
        }
    stages = {
        "attn": attn,
        "mlp": mlp,
        "ln1": leaf(1),
        "ln2": leaf(1),
    }
    return {"embed": s(), "stages": stages, "final_norm": s(),
            "lm_head": s()}


def pipeline_forward(pp_params: dict, cfg: ModelConfig, input_ids,
                     num_stages: int, num_microbatches: int,
                     axis_name: str = "pipe",
                     seq_axis: Optional[str] = None,
                     model_axis: Optional[str] = None,
                     num_virtual: int = 1,
                     attn_impl=None,
                     interpret: Optional[bool] = None):
    """Pipelined logits. MUST run inside shard_map over ``axis_name`` (and
    ``seq_axis`` / ``model_axis`` if given).

    Args:
        pp_params: stacked params with the 'stages' leading dim sliced to
            this rank's stage (shape [1, V, L/(S*V), ...] inside the
            island), and head/expert dims sliced to this rank's TP shard
            when ``model_axis`` is set.
        input_ids: [B, N] token ids, replicated over the pipe/seq/model
            axes (the sequence is sliced locally here when seq_axis is
            set).
        attn_impl: attention op on [*, H_local, N_local, D] (default:
            plain Pallas kernel; pass a Ulysses wrapper for SP).
        num_virtual: virtual chunks per device (interleaved schedule);
            V>1 needs num_microbatches % num_stages == 0.

    Returns logits [B, N_local, V], identical on every pipe rank.
    """
    S, M, V = num_stages, num_microbatches, num_virtual
    per, _ = _stage_pattern(cfg, S * V)
    assert V >= 1
    if V > 1:
        assert M % S == 0, (
            f"interleaved schedule needs microbatches ({M}) to be a "
            f"multiple of stages ({S})")
    B, N = input_ids.shape
    assert B % M == 0, (B, M)
    mb = B // M

    tp = 1 if model_axis is None else jax.lax.axis_size(model_axis)
    cfg_local = tp_local_config(cfg, tp)

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
    stage_chunks = jax.tree_util.tree_map(lambda x: x[0],
                                          pp_params["stages"])  # [V, per,..]
    cos, sin = rope_cos_sin(cfg, positions)

    def stage_fn(x, v):
        chunk = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, v, keepdims=False),
            stage_chunks)
        for j in range(per):
            lp = jax.tree_util.tree_map(lambda a: a[j], chunk)
            window = cfg.window_for_layer(j, N)  # same pattern per chunk
            x = tp_decoder_layer(lp, cfg_local, x, cos, sin, window,
                                 attn_impl, model_axis)
        return x

    embed = pp_params["embed"]
    micro = ids_local.reshape(M, mb, n_local)

    def first_stage_input(m):
        ids = jax.lax.dynamic_index_in_dim(micro, m, keepdims=False)
        return embed[ids].astype(embed.dtype)

    H = cfg.hidden_size
    state = jnp.zeros((mb, n_local, H), embed.dtype)
    outs = jnp.zeros((M, mb, n_local, H), embed.dtype)

    def step(carry, t):
        state, outs = carry
        w = jnp.clip(t - s_idx, 0, V * M - 1)
        live = (t >= s_idx) & (t - s_idx < V * M)
        v = (w % (V * S)) // S
        m = (w // (V * S)) * S + w % S
        # Device 0 starts microbatch m at chunk 0 from a fresh embedding;
        # every other (s, v) consumes the ring state (the S-1 -> 0
        # wraparound carries chunk v-1 -> v handoffs when V > 1; at V == 1
        # it is always overwritten here).
        x_in = jnp.where((s_idx == 0) & (v == 0), first_stage_input(m),
                         state)
        x_out = stage_fn(x_in, v)
        # Last stage banks microbatch m after its final chunk.
        bank = live & (s_idx == S - 1) & (v == V - 1)
        banked = jax.lax.dynamic_update_index_in_dim(outs, x_out, m, axis=0)
        outs = jnp.where(bank, banked, outs)
        state = jax.lax.ppermute(
            x_out, axis_name, [(i, (i + 1) % S) for i in range(S)])
        return (state, outs), None

    (state, outs), _ = jax.lax.scan(step, (state, outs),
                                    jnp.arange(V * M + S - 1))

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
                       num_virtual: int = 1,
                       pipe_axis: str = "pipe",
                       interpret: Optional[bool] = None):
    """Jitted pipeline-parallel training step over mesh axes
    ('pipe'[, 'data'][, 'seq'][, 'model']).

    DP shards the batch over 'data'; Ulysses SP reshards sequence<->heads
    inside the attention op over 'seq'; TP/EP shards heads and experts
    over 'model' inside the pipeline island (parallel/tp.py);
    ``num_virtual`` > 1 enables the interleaved schedule (V-times smaller
    pipe bubble; needs num_microbatches % num_stages == 0). Returns
    (step_fn, shardings); ``step_fn(pp_params, opt_state, batch)`` with
    batch int32 [B, N+1] sharded over 'data'.
    """
    S = mesh.shape[pipe_axis]
    seq_axis = "seq" if mesh.shape.get("seq", 1) > 1 else None
    data_axis = "data" if mesh.shape.get("data", 1) > 1 else None
    model_axis = "model" if mesh.shape.get("model", 1) > 1 else None

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

    p_shardings = pipeline_param_shardings(cfg, mesh, pipe_axis,
                                           model_axis=model_axis)
    param_specs = jax.tree_util.tree_map(lambda sh: sh.spec, p_shardings)
    batch_spec = P(data_axis, None)

    def loss_fn(pp_params, batch):
        inputs, targets = batch[:, :-1], batch[:, 1:]
        logits = pipeline_forward(
            pp_params, cfg, inputs, num_stages=S,
            num_microbatches=num_microbatches, axis_name=pipe_axis,
            seq_axis=seq_axis, model_axis=model_axis,
            num_virtual=num_virtual, attn_impl=attn_impl,
            interpret=interpret)
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
        # (The model axis needs no such fixup: the tp.py conjugate
        # operators keep TP-sharded grads local and replicated-param
        # grads replica-identical.)
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
