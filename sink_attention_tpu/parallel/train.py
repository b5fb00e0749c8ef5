"""Sharded training step: DP x SP(Ulysses) x TP/EP over a named mesh.

The reference delegates all training parallelism to verl/FSDP
(SURVEY.md §2.3); here the sharded step is owned. Strategy:

* **DP**  — batch over the 'data' axis (jit auto-partitions; grads psum).
* **TP**  — attention heads and MoE experts over the 'model' axis:
  q/k/v projections shard their output dim, o_proj its input dim, experts
  shard the expert dim (expert parallelism), routers stay replicated —
  XLA inserts the all-reduces.
* **SP**  — the attention op runs in a shard_map island over
  ('data', 'model', 'seq'): heads are TP-local, the sequence axis is
  resharded head<->seq by Ulysses all_to_alls inside the island
  (parallel/ulysses.py), so the Pallas kernel always sees full sequences.
* **FSDP/ZeRO** — ``fsdp=True`` additionally shards every large weight's
  non-TP dimension over the 'data' axis. XLA all-gathers each layer's
  weights just-in-time at its use site and reduce-scatters its gradients
  (the ZeRO-3 schedule), and the optimizer state inherits the param
  shardings, so per-device optimizer memory drops by the DP degree — the
  TPU-native equivalent of the torch FSDP the reference delegates to
  (SURVEY.md §2.3 row 1).

Pipeline parallelism lives in ``parallel/pp.py`` (interleaved schedule,
TP/EP inside the pipeline island via ``parallel/tp.py``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..models.model import forward_prefill
from .ulysses import ulysses_sink_flash_attention

__all__ = ["param_shardings", "make_sharded_attn", "make_train_step",
           "cross_entropy_loss", "cross_entropy_loss_packed"]


def param_shardings(cfg: ModelConfig, mesh: Mesh, model_axis: str = "model",
                    fsdp_axis: Optional[str] = None):
    """NamedSharding pytree for the model parameters.

    TP/EP layout over ``model_axis``; with ``fsdp_axis`` set (usually
    'data'), every large weight's non-TP dimension is additionally sharded
    over that axis — FSDP/ZeRO-3: XLA all-gathers weights at their use
    sites, reduce-scatters their grads, and the optimizer state (which
    mirrors the param shardings) is partitioned over DP. Dimensions not
    divisible by the axis size fall back to unsharded (FSDP is a memory
    layout, not a semantics change — any subset may stay replicated).
    """
    m = model_axis
    f = fsdp_axis
    f_size = mesh.shape[fsdp_axis] if fsdp_axis else 1

    def s(*spec):
        return NamedSharding(mesh, P(*spec))

    def sf(shape, spec):
        """Like ``s`` but replaces the ``f`` entry with None when that
        dimension is not divisible by the fsdp axis size."""
        spec = tuple(None if (ax is f and d % f_size != 0) else ax
                     for ax, d in zip(spec, shape))
        return s(*spec)

    H, HQ, HKV = cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads
    D, I, E = cfg.head_dim, cfg.intermediate_size, cfg.num_experts
    attn = {
        "wq": sf((H, HQ * D), (f, m)), "bq": s(m),
        "wk": sf((H, HKV * D), (f, m)), "bk": s(m),
        "wv": sf((H, HKV * D), (f, m)), "bv": s(m),
        "wo": sf((HQ * D, H), (m, f)), "bo": s(),
    }
    if cfg.use_s_aux:
        attn["sinks"] = s(m)
    if cfg.mlp_type == "dense":
        # Megatron MLP split: gate/up column-parallel, down row-parallel
        mlp = {"gate": sf((H, I), (f, m)), "up": sf((H, I), (f, m)),
               "down": sf((I, H), (m, f))}
    else:
        mlp = {
            "router_w": s(), "router_b": s(),
            "gate_up": sf((E, H, 2 * I), (m, f, None)),
            "gate_up_b": s(m, None),
            "down": sf((E, I, H), (m, f, None)), "down_b": s(m, None),
        }
    layer = {
        "attn": attn,
        "mlp": mlp,
        "ln1": s(),
        "ln2": s(),
    }
    return {
        "embed": sf((cfg.vocab_size, H), (f, None)),
        "layers": [layer] * cfg.num_layers,
        "final_norm": s(),
        "lm_head": sf((H, cfg.vocab_size), (f, m)),
    }


def make_sharded_attn(mesh: Mesh, data_axis: str = "data",
                      seq_axis: str = "seq", model_axis: str = "model",
                      interpret: Optional[bool] = None):
    """Attention impl for ``forward_prefill``: a shard_map Ulysses island.

    Expects q/k/v logically [B, H, N, D] with B on data, H on model, N on
    seq. Inside the island each device holds [B/dp, H/tp, N/sp, D]; Ulysses
    all_to_alls over 'seq' reshard to full sequences before the kernel.
    """
    qkv_spec = P(data_axis, model_axis, seq_axis, None)
    aux_spec = P(model_axis)

    def island(q, k, v, s_aux, *, num_sink, window_size):
        if mesh.shape[seq_axis] == 1:
            from ..ops.flash import sink_flash_attention
            return sink_flash_attention(
                q, k, v, num_sink=num_sink, window_size=window_size,
                s_aux=s_aux, interpret=interpret)
        return ulysses_sink_flash_attention(
            q, k, v, num_sink=num_sink, window_size=window_size,
            s_aux=s_aux, axis_name=seq_axis, interpret=interpret)

    def attn(q, k, v, *, num_sink, window_size, s_aux):
        q = jax.lax.with_sharding_constraint(q, NamedSharding(mesh, qkv_spec))
        fn = jax.shard_map(
            functools.partial(island, num_sink=num_sink,
                              window_size=window_size),
            mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec, aux_spec),
            out_specs=qkv_spec,
            check_vma=False)
        return fn(q, k, v, s_aux)

    return attn


def cross_entropy_loss(params, cfg: ModelConfig, batch, attn_impl=None,
                       remat: bool = False):
    """Next-token CE loss. batch: int32 [B, N+1]."""
    inputs, targets = batch[:, :-1], batch[:, 1:]
    logits, _ = forward_prefill(params, cfg, inputs, attn_impl=attn_impl,
                                remat=remat)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return -jnp.mean(ll)


def cross_entropy_loss_packed(params, cfg: ModelConfig, batch, positions,
                              interpret: Optional[bool] = None):
    """Packed-batch next-token CE: per-segment sink attention + RoPE, with
    cross-segment targets masked out.

    batch: int32 [B, N] packed token ids; positions: int32 [B, N]
    segment-local positions (0 at each segment start — the position_ids a
    packed loop already has). Token t's target is token t+1 UNLESS t+1
    starts a new segment (positions[t+1] == 0); final tokens of each
    segment (and of the pack) contribute no loss — exactly the
    verl/HF packed-SFT convention. Attention runs the packed kernel
    (ops.sink_flash_attention_packed); the reference falls back to stock
    FA here and trains packed batches WITHOUT sink attention
    (verl_patch.py:73-93).
    """
    from ..ops import sink_flash_attention_packed

    def attn(q, k, v, *, num_sink, window_size, s_aux):
        return sink_flash_attention_packed(
            q, k, v, positions, num_sink, window_size, s_aux=s_aux,
            interpret=interpret)

    logits, _ = forward_prefill(params, cfg, batch, positions=positions,
                                attn_impl=attn)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    targets = batch[:, 1:]
    ll = jnp.take_along_axis(logp[:, :-1], targets[..., None],
                             axis=-1)[..., 0]
    # valid iff the next token continues the same segment
    valid = (positions[:, 1:] > 0).astype(jnp.float32)
    return -(ll * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def make_train_step(cfg: ModelConfig, mesh: Mesh, optimizer,
                    interpret: Optional[bool] = None, fsdp: bool = False,
                    remat: bool = False, accum_steps: int = 1):
    """Build a jitted (params, opt_state, batch) -> (params, opt_state, loss)
    training step with DP/SP/TP/EP shardings over ``mesh``.

    ``fsdp=True`` shards weights (and therefore grads and optimizer state,
    which mirror the param shardings) over the 'data' axis too — ZeRO-3
    memory at unchanged semantics. Initialize ``opt_state =
    optimizer.init(sharded_params)`` so its leaves inherit the layout.

    ``remat=True`` checkpoints each decoder layer (backward recomputes
    activations — the long-sequence memory trade). ``accum_steps=k``
    splits the batch's leading dim into k microbatches scanned
    sequentially with gradient accumulation: the effective batch grows
    k-fold at one microbatch's activation memory, exact mean-of-means
    semantics (every microbatch contributes equally).
    """
    attn_impl = make_sharded_attn(mesh, interpret=interpret)
    batch_sharding = NamedSharding(mesh, P("data", None))
    loss_fn = functools.partial(cross_entropy_loss, attn_impl=attn_impl,
                                remat=remat)

    def grads_of(params, batch):
        return jax.value_and_grad(loss_fn)(params, cfg, batch)

    def step(params, opt_state, batch):
        if accum_steps == 1:
            loss, grads = grads_of(params, batch)
        else:
            B = batch.shape[0]
            assert B % accum_steps == 0, (B, accum_steps)
            micro = batch.reshape(accum_steps, B // accum_steps,
                                  *batch.shape[1:])
            # keep each microbatch sharded over 'data'
            micro = jax.lax.with_sharding_constraint(
                micro, NamedSharding(mesh, P(None, "data", None)))

            def body(acc, mb):
                loss_sum, g_acc = acc
                loss, g = grads_of(params, mb)
                return (loss_sum + loss,
                        jax.tree_util.tree_map(jnp.add, g_acc, g)), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            (loss_sum, g_sum), _ = jax.lax.scan(body, (0.0, zeros), micro)
            loss = loss_sum / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, g_sum)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    p_shardings = param_shardings(
        cfg, mesh, fsdp_axis="data" if fsdp else None)
    return jax.jit(
        step,
        in_shardings=(p_shardings, None, batch_sharding),
        out_shardings=(p_shardings, None, None),
    ), p_shardings
