"""Tensor parallelism inside manual (shard_map) islands.

The pjit training path (parallel/train.py) gets TP "for free": params carry
NamedShardings and GSPMD inserts the all-reduces. Inside a *manual* island
— the pipeline-parallel program (parallel/pp.py), which must be shard_map'd
over 'pipe' for ppermute scheduling — GSPMD cannot help, so TP is expressed
with the classic pair of conjugate operators (the f/g operators of
Megatron-LM, arXiv:1909.08053 §3):

* :func:`tp_region_in`  — identity forward, **psum backward**. Applied to
  every replicated activation *entering* a head/expert-sharded region:
  each rank's backward produces only its shard's contribution to the
  input cotangent, so the transpose must sum them.
* :func:`tp_region_out` — **psum forward**, identity backward. Applied to
  the partial output *leaving* the region: ranks hold partial sums over
  heads/experts; after the psum the activation is replicated again, and
  the (replicated) output cotangent is already exactly what each rank's
  local transpose needs.

With every replicated value routed through ``tp_region_in`` and no
replicated *parameter* referenced inside a region, all gradients come out
exact without any per-leaf fixups: sharded-param grads are local, and
replicated-param grads are computed replica-identically on every rank.

The reference has no tensor parallelism at all (SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig
from ..models.model import (
    _glu_act,
    _mm,
    _qkv,
    apply_rope,
    moe_experts,
    moe_routing,
    rms_norm,
)

__all__ = ["tp_region_in", "tp_region_out", "tp_local_config",
           "tp_decoder_layer"]


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_region_in(x: jax.Array, axis_name: str) -> jax.Array:
    """Identity fwd / psum bwd (Megatron 'f'). Apply to replicated values
    entering a tensor-sharded region."""
    return x


def _in_fwd(x, axis_name):
    return x, None


def _in_bwd(axis_name, _, ct):
    return (jax.lax.psum(ct, axis_name),)


tp_region_in.defvjp(_in_fwd, _in_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_region_out(x: jax.Array, axis_name: str) -> jax.Array:
    """psum fwd / identity bwd (Megatron 'g'). Apply to partial sums
    leaving a tensor-sharded region."""
    return jax.lax.psum(x, axis_name)


def _out_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _out_bwd(axis_name, _, ct):
    return (ct,)


tp_region_out.defvjp(_out_fwd, _out_bwd)


def tp_local_config(cfg: ModelConfig, tp: int) -> ModelConfig:
    """Per-rank config: heads and experts divided by the TP degree."""
    if tp == 1:
        return cfg
    assert cfg.num_heads % tp == 0, (cfg.num_heads, tp)
    assert cfg.num_kv_heads % tp == 0, (cfg.num_kv_heads, tp)
    if cfg.mlp_type == "dense":
        assert cfg.intermediate_size % tp == 0, (cfg.intermediate_size, tp)
        return dataclasses.replace(
            cfg, num_heads=cfg.num_heads // tp,
            num_kv_heads=cfg.num_kv_heads // tp,
            intermediate_size=cfg.intermediate_size // tp)
    assert cfg.num_experts % tp == 0, (cfg.num_experts, tp)
    return dataclasses.replace(
        cfg, num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        num_experts=cfg.num_experts // tp)


def tp_decoder_layer(lp: dict, cfg_local: ModelConfig, x: jax.Array,
                     cos, sin, window: int, attn_impl,
                     axis_name: Optional[str]) -> jax.Array:
    """One transformer block with heads/experts sharded over ``axis_name``.

    ``lp`` holds this rank's shard: wq/wk/wv output-dim (= head) sharded,
    wo input-dim sharded, sinks (s_aux) head-sharded, experts
    expert-sharded; ln1/ln2/router/bo replicated. ``cfg_local`` must be
    :func:`tp_local_config`'s per-rank view. With axis_name=None this is
    exactly ``models.model.decoder_layer``.

    Structure (replicated values tagged on entry, partials psum'd on exit):

        h   = rms_norm(x)                       # replicated path
        a   = out_proj_nobias(attn(qkv(f(h))))  # head-sharded region
        x  += g(a) + bo
        h2  = rms_norm(x)                       # replicated path
        r   = moe_routing(h2)[:, local_cols]    # router replicated
        x  += g(moe_experts(f(h2), f(r)))       # expert-sharded region
    """
    if axis_name is None:
        from ..models.model import decoder_layer
        return decoder_layer(lp, cfg_local, x, cos, sin, window, attn_impl)

    B, N, H = x.shape
    ap = lp["attn"]

    # --- attention: head-sharded region -------------------------------
    h = rms_norm(x, lp["ln1"], cfg_local.rms_norm_eps)
    h_in = tp_region_in(h, axis_name)
    q, k, v = _qkv(ap, cfg_local, h_in)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    attn = attn_impl(
        q, k, v, num_sink=cfg_local.num_sink_tokens, window_size=window,
        s_aux=(ap["sinks"].astype(jnp.float32)
               if cfg_local.use_s_aux else None))
    y = attn.transpose(0, 2, 1, 3).reshape(B, N, -1)
    part = _mm(y, ap["wo"])                       # partial over head shards
    out = tp_region_out(part, axis_name)
    if cfg_local.o_bias:
        out = out + ap["bo"].astype(out.dtype)    # bias once, post-psum
    x = x + out

    h = rms_norm(x, lp["ln2"], cfg_local.rms_norm_eps)
    if cfg_local.mlp_type == "dense":
        # --- dense MLP: Megatron column/row split over intermediate ---
        # gate/up hold [H, I/tp] columns, down holds [I/tp, H] rows; the
        # partial down-products psum on exit.
        h_in = tp_region_in(h, axis_name)
        act = jax.nn.silu(_mm(h_in, lp["mlp"]["gate"])) * _mm(
            h_in, lp["mlp"]["up"])
        out = tp_region_out(_mm(act, lp["mlp"]["down"]), axis_name)
        return x + out.astype(x.dtype)

    # --- MoE: expert-sharded region -----------------------------------
    xt = h.reshape(B * N, H)
    routing = moe_routing(lp["mlp"], cfg_local, xt)   # [T, E_total]
    # Enter the region BEFORE slicing the local columns: the slice's
    # transpose zero-pads each rank's cotangent into its own columns, and
    # the region-entry psum then assembles the exact full-routing
    # cotangent. (Slicing first would psum cotangents of *different*
    # column ranges together.)
    routing = tp_region_in(routing, axis_name)
    e_local = cfg_local.num_experts
    rank = jax.lax.axis_index(axis_name)
    routing = jax.lax.dynamic_slice_in_dim(
        routing, rank * e_local, e_local, axis=1)
    part = moe_experts(lp["mlp"], cfg_local,
                       tp_region_in(xt, axis_name), routing)
    out = tp_region_out(part, axis_name)
    return x + out.reshape(B, N, H).astype(x.dtype)
