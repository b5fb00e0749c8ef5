"""gpt-oss-style causal LM built on the sink-attention Pallas kernels.

A functional (pure-pytree) implementation: parameters are nested dicts of
arrays, so they shard with ``jax.sharding.NamedSharding`` trees and map 1:1
from HF checkpoints. Semantics match HF ``GptOssForCausalLM`` (verified by
tests/test_model.py against a randomly-initialized HF model):

* attention sinks as a learnable per-head extra softmax logit (our s_aux)
* alternating sliding/full attention layers
* MoE with top-k-then-softmax routing and interleaved gate/up experts with
  the gpt-oss clamp activation: glu = gate * sigmoid(1.702 * gate),
  out = (up + 1) * glu, gate clamped to (-inf, 7], up to [-7, 7]
* chunk-convention RoPE with optional YaRN scaling

This replaces the reference's monkey-patch integration layer
(/root/reference/sink_attention/verl_patch.py, generate_patch.py) with an
owned model: prefill runs the Pallas prefill kernel; decode runs the Pallas
cached-decode kernel over the functional sink KV cache.
"""

from __future__ import annotations

import functools
import math
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..cache import SinkKVCache
from ..ops import sink_flash_attention, sink_decode_attention_cached
from .config import ModelConfig
from .quant import is_quantized, is_quantized4

ALPHA = 1.702  # gpt-oss glu activation alpha
LIMIT = 7.0    # gpt-oss activation clamp


def _mm(x: jax.Array, w) -> jax.Array:
    """Matmul accepting plain, int8 ({"q","s"}), or packed-int4
    ({"q4","s"}) weights.

    int8: ``(x @ q.astype(x.dtype)) * s`` — XLA fuses the int8->bf16
    convert into the dot's operand read, so only int8 bytes cross HBM
    (measured ~83% of the int8 roofline). int4: XLA-fused nibble decode
    (ops.int4) — at decode shapes it beats the int8 path in wall-clock
    while moving half the bytes (see ops/int4.py module doc).
    """
    if is_quantized4(w):
        from ..ops.int4 import int4_matmul
        lead = x.shape[:-1]
        y = int4_matmul(x.reshape(-1, x.shape[-1]), w["q4"], w["s"])
        return y.reshape(*lead, y.shape[-1])
    if is_quantized(w):
        return (x @ w["q"].astype(x.dtype)) * w["s"].astype(x.dtype)
    return x @ w.astype(x.dtype)


def _expert_mm(x: jax.Array, w, eq: str) -> jax.Array:
    """Einsum over stacked expert weights, plain or quantized.

    Supports the two MoE contractions "th,ehi->eti" (shared activations)
    and "eti,eih->eth" (per-expert activations); int4 weights route to
    ops.int4.int4_matmul_experts, which handles both via x's rank.
    """
    if is_quantized4(w):
        from ..ops.int4 import int4_matmul_experts
        assert eq in ("th,ehi->eti", "eti,eih->eth"), eq
        return int4_matmul_experts(x, w["q4"], w["s"])
    if is_quantized(w):
        return (jnp.einsum(eq, x, w["q"].astype(x.dtype)) *
                w["s"].astype(x.dtype))
    return jnp.einsum(eq, x, w.astype(x.dtype))


def _routed_expert_mm(xt: jax.Array, w, e) -> jax.Array:
    """One routed expert's matmul: dynamic-slice expert ``e`` (reading only
    its weights from HBM — see the moe() docstring) and apply it to the
    [K] vector or [T, K] matrix ``xt``; handles plain / int8 / packed-int4
    forms."""
    vec = xt.ndim == 1
    xm = xt[None] if vec else xt
    if is_quantized4(w):
        from ..ops.int4 import int4_matmul
        wq = jax.lax.dynamic_index_in_dim(w["q4"], e, keepdims=False)
        ws = jax.lax.dynamic_index_in_dim(w["s"], e, keepdims=False)
        y = int4_matmul(xm, wq, ws)
    elif is_quantized(w):
        wq = jax.lax.dynamic_index_in_dim(w["q"], e, keepdims=False)
        ws = jax.lax.dynamic_index_in_dim(w["s"], e, keepdims=False)
        y = (xm @ wq.astype(xm.dtype)) * ws[0].astype(xm.dtype)
    else:
        wf = jax.lax.dynamic_index_in_dim(w, e, keepdims=False)
        y = xm @ wf.astype(xm.dtype)
    return y[0] if vec else y


def _embed_lookup(embed, ids: jax.Array) -> jax.Array:
    if is_quantized(embed):
        # the scale dtype IS the model compute dtype (models.quant)
        ct = embed["s"].dtype
        return embed["q"][ids].astype(ct) * embed["s"][ids].astype(ct)
    return embed[ids].astype(embed.dtype)


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------


def init_params(cfg: ModelConfig, key: jax.Array,
                dtype: Any = jnp.float32) -> dict:
    """Random-init parameter pytree (normal(0, 0.02), biases/sinks zero)."""
    H, D = cfg.hidden_size, cfg.head_dim
    HQ, HKV = cfg.num_heads, cfg.num_kv_heads
    I, E = cfg.intermediate_size, cfg.num_experts
    keys = iter(jax.random.split(key, 8 + 12 * cfg.num_layers))

    def w(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32) *
                scale).astype(dtype)

    def zeros(shape):
        return jnp.zeros(shape, dtype)

    layers = []
    for _ in range(cfg.num_layers):
        attn = {
            "wq": w((H, HQ * D)), "bq": zeros((HQ * D,)),
            "wk": w((H, HKV * D)), "bk": zeros((HKV * D,)),
            "wv": w((H, HKV * D)), "bv": zeros((HKV * D,)),
            "wo": w((HQ * D, H)), "bo": zeros((H,)),
        }
        if cfg.use_s_aux:
            attn["sinks"] = w((HQ,), scale=1.0)
        if cfg.mlp_type == "dense":
            mlp = {
                "gate": w((H, I)), "up": w((H, I)), "down": w((I, H)),
            }
        else:
            mlp = {
                "router_w": w((H, E)), "router_b": zeros((E,)),
                "gate_up": w((E, H, 2 * I)), "gate_up_b": zeros((E, 2 * I)),
                "down": w((E, I, H)), "down_b": zeros((E, H)),
            }
        layers.append({
            "attn": attn,
            "mlp": mlp,
            "ln1": jnp.ones((H,), dtype),
            "ln2": jnp.ones((H,), dtype),
        })
    return {
        "embed": w((cfg.vocab_size, H)),
        "layers": layers,
        "final_norm": jnp.ones((H,), dtype),
        "lm_head": w((H, cfg.vocab_size)),
    }


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = weight.astype(jnp.float32) * (xf * jax.lax.rsqrt(var + eps))
    return y.astype(x.dtype)


def _yarn_inv_freq(cfg: ModelConfig) -> Tuple[jax.Array, float]:
    """YaRN rope (matches transformers ROPE_INIT_FUNCTIONS['yarn'])."""
    rs = cfg.rope_scaling
    D = cfg.head_dim
    base = cfg.rope_theta
    factor = rs.get("factor", 1.0)
    orig_max = rs.get("original_max_position_embeddings",
                      cfg.max_position_embeddings)
    beta_fast = rs.get("beta_fast", 32.0)
    beta_slow = rs.get("beta_slow", 1.0)
    mscale = rs.get("attention_factor")
    if mscale is None:
        mscale = 0.1 * math.log(factor) + 1.0 if factor > 1 else 1.0

    pos_freqs = base ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D)
    inv_freq_extrapolation = 1.0 / pos_freqs
    inv_freq_interpolation = 1.0 / (factor * pos_freqs)

    def find_dim(num_rotations):
        return (D * math.log(orig_max / (num_rotations * 2 * math.pi))
                ) / (2 * math.log(base))

    low = max(math.floor(find_dim(beta_fast)), 0)
    high = min(math.ceil(find_dim(beta_slow)), D - 1)
    if low == high:
        high += 0.001
    ramp = (jnp.arange(D // 2, dtype=jnp.float32) - low) / (high - low)
    ramp = jnp.clip(ramp, 0.0, 1.0)
    inv_freq_mask = 1.0 - ramp
    inv_freq = (inv_freq_interpolation * (1 - inv_freq_mask) +
                inv_freq_extrapolation * inv_freq_mask)
    return inv_freq, float(mscale)


def rope_cos_sin(cfg: ModelConfig, positions: jax.Array):
    """cos/sin [.., D/2] fp32 (chunk convention, HF GptOss parity)."""
    if cfg.rope_scaling and cfg.rope_scaling.get("rope_type") == "yarn":
        inv_freq, scaling = _yarn_inv_freq(cfg)
    else:
        D = cfg.head_dim
        inv_freq = 1.0 / (cfg.rope_theta ** (
            jnp.arange(0, D, 2, dtype=jnp.float32) / D))
        scaling = 1.0
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(freqs) * scaling, jnp.sin(freqs) * scaling


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, H, N, D]; cos/sin: [N, D/2] or [B, N, D/2]."""
    if cos.ndim == 2:
        cos = cos[None, None]
        sin = sin[None, None]
    else:
        cos = cos[:, None]
        sin = sin[:, None]
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out = jnp.concatenate(
        [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1)
    return out.astype(x.dtype)


def _qkv(p: dict, cfg: ModelConfig, x: jax.Array):
    """x: [B, N, H] -> q [B,HQ,N,D], k/v [B,HKV,N,D]."""
    B, N, _ = x.shape
    D = cfg.head_dim

    def proj(w, b, heads):
        y = _mm(x, w)
        if cfg.attention_bias:
            y = y + b.astype(y.dtype)
        return y.reshape(B, N, heads, D).transpose(0, 2, 1, 3)

    q = proj(p["wq"], p["bq"], cfg.num_heads)
    k = proj(p["wk"], p["bk"], cfg.num_kv_heads)
    v = proj(p["wv"], p["bv"], cfg.num_kv_heads)
    return q, k, v


def _out_proj(p: dict, cfg: ModelConfig, attn: jax.Array) -> jax.Array:
    """attn: [B, HQ, N, D] -> [B, N, H]."""
    B, HQ, N, D = attn.shape
    y = attn.transpose(0, 2, 1, 3).reshape(B, N, HQ * D)
    y = _mm(y, p["wo"])
    if cfg.o_bias:
        y = y + p["bo"].astype(y.dtype)
    return y


def _s_aux(lp: dict, cfg: ModelConfig):
    """Per-head learnable sink logits, or None for dense-family models
    (Qwen/Llama — no s_aux mechanism; their streaming 'sinks' are the
    num_sink_tokens cache-eviction kind, which the kernels handle via
    num_sink)."""
    if not cfg.use_s_aux:
        return None
    return lp["attn"]["sinks"].astype(jnp.float32)


def _glu_act(gate_up: jax.Array) -> jax.Array:
    """gpt-oss interleaved gate/up clamp activation."""
    gate = gate_up[..., ::2]
    up = gate_up[..., 1::2]
    gate = jnp.minimum(gate, LIMIT)
    up = jnp.clip(up, -LIMIT, LIMIT)
    glu = gate * jax.nn.sigmoid(gate * ALPHA)
    return (up + 1.0) * glu


def _moe_grouped(p: dict, cfg: ModelConfig, xt: jax.Array,
                 routing: jax.Array) -> jax.Array:
    """Grouped-expert MoE: one scan step per ACTIVE expert.

    ``routing``: [T, E] sparse combine weights (zeros for unrouted pairs).
    Active experts (nonzero routing column) are compacted to the front of
    the scan order; each step dynamic-slices ONE expert's weights and
    applies it to every token at once — so HBM weight traffic is
    ``distinct_routed_experts`` reads (vs E for the dense path, and vs
    T*k duplicate-heavy reads for a per-token gather), and trace size is
    constant in T (the round-1 per-token loop unrolled T*k slices).
    Inactive/duplicate-free steps skip the weight read via lax.cond.
    Exact for any T; intended for the HBM-bound decode regime.
    """
    T, H = xt.shape
    E, k = routing.shape[1], cfg.experts_per_tok
    n_steps = min(T * k, E)
    col_active = jnp.sum(routing, axis=0) > 0.0            # [E]
    # stable argsort of (inactive?) puts active expert ids first
    ids = jnp.argsort(jnp.where(col_active, 0, 1),
                      stable=True)[:n_steps].astype(jnp.int32)

    def step(acc, e):
        w_col = jax.lax.dynamic_slice_in_dim(
            routing, e, 1, axis=1)[:, 0]                   # [T]

        def compute(acc):
            gub = jax.lax.dynamic_index_in_dim(
                p["gate_up_b"], e, keepdims=False).astype(xt.dtype)
            pre = _routed_expert_mm(xt, p["gate_up"], e)   # [T, 2I]
            act = _glu_act(pre + gub)
            dwb = jax.lax.dynamic_index_in_dim(
                p["down_b"], e, keepdims=False).astype(act.dtype)
            down = _routed_expert_mm(act, p["down"], e)    # [T, H]
            return acc + w_col[:, None] * (down + dwb).astype(jnp.float32)

        acc = jax.lax.cond(jnp.any(w_col > 0.0), compute, lambda a: a, acc)
        return acc, None

    out, _ = jax.lax.scan(step, jnp.zeros((T, H), jnp.float32), ids)
    return out


def dense_mlp(p: dict, x: jax.Array) -> jax.Array:
    """Gated-SiLU MLP (Qwen/Llama family): down(silu(gate(x)) * up(x)).

    No biases (HF Qwen2MLP / LlamaMLP have none). Params: ``gate`` [H, I],
    ``up`` [H, I], ``down`` [I, H] — plain, int8, or packed-int4 forms via
    ``_mm``."""
    g = _mm(x, p["gate"])
    u = _mm(x, p["up"])
    return _mm(jax.nn.silu(g) * u, p["down"])


def mlp_block(p: dict, cfg: ModelConfig, x: jax.Array,
              active=None) -> jax.Array:
    """The per-layer MLP: MoE (gpt-oss) or dense gated-SiLU (Qwen/Llama),
    selected by ``cfg.mlp_type``. ``active`` (optional [B] bool) marks
    batch rows whose output is discarded — see ``moe``."""
    if cfg.mlp_type == "dense":
        return dense_mlp(p, x)
    return moe(p, cfg, x, active=active)


def moe(p: dict, cfg: ModelConfig, x: jax.Array, active=None) -> jax.Array:
    """gpt-oss MoE block. x: [B, N, H] -> [B, N, H].

    Two exact formulations, picked by token count:

    * **Dense-all-experts** (prefill/training): every token runs every
      expert, combined with the sparse routing weights — big batched
      matmuls, MXU-friendly, and every expert's weights are read anyway at
      large T.
    * **Grouped-by-expert** (decode, T <= moe_grouped_token_limit): decode
      is HBM-bound on weights, so scan over the distinct routed experts
      and batch all tokens per expert (see ``_moe_grouped``). At B=1,
      k=4, E=32 this cuts MoE weight traffic 8x; at 8 slots it reads only
      the ~20 distinct routed experts instead of all 32, in one fused
      scan instead of 32 sequential per-token matmuls.

    ``active`` ([B] bool, optional): rows whose output the caller discards
    (inactive continuous-batching slots). Their routing weights are zeroed
    so the grouped path does not read expert weights routed by stale
    tokens — the savings it exists for are per *active* slot.
    """
    B, N, H = x.shape
    T = B * N
    xt = x.reshape(T, H)
    routing = moe_routing(p, cfg, xt)
    if active is not None:
        act_t = jnp.repeat(active, N).astype(routing.dtype)      # [B*N]
        routing = routing * act_t[:, None]
    out = moe_experts(p, cfg, xt, routing)
    return out.reshape(B, N, H).astype(x.dtype)


def moe_routing(p: dict, cfg: ModelConfig, xt: jax.Array) -> jax.Array:
    """Router: xt [T, H] -> sparse combine weights [T, E_total].

    E_total comes from the (always-replicated) router weights, so under
    expert parallelism this is the FULL expert count even when ``p`` holds
    only a local expert slice — the TP layer slices the columns
    (parallel/tp.py)."""
    T = xt.shape[0]
    logits = (xt @ p["router_w"].astype(xt.dtype) +
              p["router_b"].astype(xt.dtype)).astype(jnp.float32)
    vals, idx = jax.lax.top_k(logits, cfg.experts_per_tok)
    weights = jax.nn.softmax(vals, axis=-1)
    routing = jnp.zeros((T, logits.shape[-1]), jnp.float32)
    return routing.at[jnp.arange(T)[:, None], idx].set(weights)


def moe_experts(p: dict, cfg: ModelConfig, xt: jax.Array,
                routing: jax.Array) -> jax.Array:
    """Expert compute+combine: xt [T, H], routing [T, E] (E = the expert
    count held in ``p`` — local under EP) -> [T, H] fp32."""
    T = xt.shape[0]
    if T <= cfg.moe_grouped_token_limit:
        return _moe_grouped(p, cfg, xt, routing)
    gate_up = _expert_mm(xt, p["gate_up"], "th,ehi->eti")
    gate_up = gate_up + p["gate_up_b"].astype(gate_up.dtype)[:, None, :]
    act = _glu_act(gate_up)
    out = _expert_mm(act, p["down"], "eti,eih->eth")
    out = out + p["down_b"].astype(out.dtype)[:, None, :]
    return jnp.einsum("eth,te->th", out,
                      routing.astype(out.dtype)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------


def decoder_layer(lp: dict, cfg: ModelConfig, x: jax.Array, cos, sin,
                  window: int, attn_impl) -> jax.Array:
    """One transformer block (attention + MoE) on [B, N, H] activations."""
    h = rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
    q, k, v = _qkv(lp["attn"], cfg, h)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    attn = attn_impl(
        q, k, v, num_sink=cfg.num_sink_tokens, window_size=window,
        s_aux=_s_aux(lp, cfg))
    x = x + _out_proj(lp["attn"], cfg, attn)
    h = rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
    return x + mlp_block(lp["mlp"], cfg, h)


def _layer_walk(params: dict, cfg: ModelConfig, x: jax.Array, cos, sin,
                attn_step, active=None) -> jax.Array:
    """THE decoder-layer walk: every forward variant routes through here.

    ``attn_step(li, lp, q, k, v) -> attn`` supplies the attention (and, via
    closure side effects, any cache advance / KV collection policy) for one
    layer; everything else — norms, QKV projection, RoPE, residuals, MoE —
    is shared, so a model change (new layer type, bias, norm placement)
    lands in prefill, decode, ragged decode, and the speculative verify at
    once instead of silently diverging per-path re-implementations.
    Returns logits [B, T, V].
    """
    for li, lp in enumerate(params["layers"]):
        h = rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
        q, k, v = _qkv(lp["attn"], cfg, h)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = attn_step(li, lp, q, k, v)
        x = x + _out_proj(lp["attn"], cfg, attn)
        h = rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
        x = x + mlp_block(lp["mlp"], cfg, h, active=active)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return _mm(x, params["lm_head"])


def forward_prefill(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,
    caches: Optional[List[SinkKVCache]] = None,
    positions: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
    attn_impl=None,
    collect_kv: bool = False,
    remat: bool = False,
):
    """Full-sequence forward. input_ids: [B, N] -> logits [B, N, V].

    If ``caches`` is given (one SinkKVCache per layer), each layer's KV is
    stored for subsequent decode, and the updated caches are returned.
    If ``collect_kv`` is set, the second return value is instead the raw
    per-layer (k, v) ([B,H_kv,N,D] each) — used by the continuous-batching
    engine to insert a prefilled request into a ragged cache slot.
    ``attn_impl(q, k, v, num_sink, window, s_aux)`` overrides the attention
    op (e.g. a shard_map'd Ulysses island for sharded training).
    ``remat=True`` wraps each decoder layer in ``jax.checkpoint`` so the
    backward pass recomputes layer activations instead of storing them —
    training-memory O(1) in depth (+ one extra forward of FLOPs), the
    standard long-sequence trade on HBM-bound TPUs. Inference-only paths
    (``caches``/``collect_kv``) ignore it.
    """
    B, N = input_ids.shape
    x = _embed_lookup(params["embed"], input_ids)
    if positions is None:
        positions = jnp.arange(N)
    cos, sin = rope_cos_sin(cfg, positions)
    if attn_impl is None:
        attn_impl = functools.partial(sink_flash_attention,
                                      interpret=interpret)

    if remat and caches is None and not collect_kv:
        for li, lp in enumerate(params["layers"]):
            window = cfg.window_for_layer(li, N)
            layer_fn = jax.checkpoint(functools.partial(
                decoder_layer, cfg=cfg, window=window, attn_impl=attn_impl))
            x = layer_fn(lp, x=x, cos=cos, sin=sin)
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return _mm(x, params["lm_head"]), None

    new_caches = [] if caches is not None else None
    kvs = [] if collect_kv else None

    def attn_step(li, lp, q, k, v):
        window = cfg.window_for_layer(li, N)
        if caches is not None:
            new_caches.append(caches[li].prefill(k, v))
        if collect_kv:
            kvs.append((k, v))
        return attn_impl(
            q, k, v, num_sink=cfg.num_sink_tokens, window_size=window,
            s_aux=_s_aux(lp, cfg))

    logits = _layer_walk(params, cfg, x, cos, sin, attn_step)
    return logits, (kvs if collect_kv else new_caches)


def forward_decode(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,
    caches: List[SinkKVCache],
    position: jax.Array,
    interpret: Optional[bool] = None,
    attn_impl=None,
    collect_kv: bool = False,
):
    """Single-token decode step. input_ids: [B, 1] -> logits [B, 1, V].

    Appends this token's KV to each layer cache and attends over the rolling
    sink cache with the Pallas decode kernel. ``attn_impl(q, cache, s_aux)``
    overrides the decode attention (e.g. a shard_map island for
    tensor-sharded serving — serving.sharded). ``collect_kv=True``
    additionally returns this step's per-layer post-RoPE (k, v)
    [B, H_kv, 1, D] — the speculative draft loop commits these directly
    instead of paying a second draft pass (generate.py round_body step 4).
    """
    B = input_ids.shape[0]
    x = _embed_lookup(params["embed"], input_ids)
    pos = jnp.broadcast_to(jnp.asarray(position).reshape(()), (1,))
    cos, sin = rope_cos_sin(cfg, pos)
    if attn_impl is None:
        attn_impl = functools.partial(sink_decode_attention_cached,
                                      interpret=interpret)

    new_caches = []
    kvs = []

    def attn_step(li, lp, q, k, v):
        cache = caches[li].append(k, v)
        new_caches.append(cache)
        if collect_kv:
            kvs.append((k, v))
        return attn_impl(q, cache, s_aux=_s_aux(lp, cfg))

    logits = _layer_walk(params, cfg, x, cos, sin, attn_step)
    if collect_kv:
        return logits, new_caches, kvs
    return logits, new_caches


def forward_decode_ragged(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,
    caches: list,
    positions: jax.Array,
    active: jax.Array,
    interpret: Optional[bool] = None,
    collect_kv: bool = False,
):
    """Ragged single-token decode: per-slot positions and active mask.

    The continuous-batching decode step: every batch slot holds its own
    sequence at its own length. input_ids: [B, 1]; positions: [B] int32
    (the global position of this token per slot, for RoPE); active: [B]
    bool. caches: list[RaggedSinkKVCache]. Returns (logits [B, 1, V],
    new caches) — plus per-layer (k, v) [B, H_kv, 1, D] when
    ``collect_kv`` (the engine's speculative draft commits those
    directly, never re-running the draft model).
    """
    from ..cache.ragged import RaggedSinkKVCache  # noqa: F401 (type)
    from ..ops import sink_decode_attention_ragged

    x = _embed_lookup(params["embed"], input_ids)
    cos, sin = rope_cos_sin(cfg, positions[:, None])  # [B, 1, D/2]

    new_caches = []
    kvs = []

    def attn_step(li, lp, q, k, v):
        cache = caches[li].append(k, v, active)
        new_caches.append(cache)
        if collect_kv:
            kvs.append((k, v))
        return sink_decode_attention_ragged(
            q, cache, s_aux=_s_aux(lp, cfg), interpret=interpret)

    logits = _layer_walk(params, cfg, x, cos, sin, attn_step,
                         active=active)
    if collect_kv:
        return logits, new_caches, kvs
    return logits, new_caches


def forward_verify_ragged(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,
    caches: list,
):
    """Per-slot multi-token verification forward (engine spec decode).

    (No ``interpret`` parameter: the ragged multi-token verify op is pure
    XLA, not a Pallas kernel — there is no interpreter mode to select.)

    input_ids: [B, T] — slot b's token i sits at global position
    ``caches[0].seen[b] + i``. Attends via
    ``ops.sink_decode_attention_ragged_multi`` against each slot's OWN
    pre-append ring view; caches are NOT advanced. Returns
    (logits [B, T, V], per-layer [(k, v)] with k/v [B, H_kv, T, D]) for
    ``RaggedSinkKVCache.append_many_counted`` commitment. Same
    :func:`_layer_walk` as every other forward.
    """
    from ..ops.decode import sink_decode_attention_ragged_multi

    B, T = input_ids.shape
    x = _embed_lookup(params["embed"], input_ids)
    pos = caches[0].seen[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    cos, sin = rope_cos_sin(cfg, pos)

    kvs = []

    def attn_step(li, lp, q, k, v):
        kvs.append((k, v))
        return sink_decode_attention_ragged_multi(
            q, k, v, caches[li], s_aux=_s_aux(lp, cfg))

    logits = _layer_walk(params, cfg, x, cos, sin, attn_step)
    return logits, kvs


def forward_verify(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,
    caches: List[SinkKVCache],
    start_pos: jax.Array,
):
    """Multi-token verification forward (speculative decoding's target pass).

    (No ``interpret`` parameter: the multi-token verify op is pure XLA,
    not a Pallas kernel — there is no interpreter mode to select.)

    Runs T draft tokens through the model against the PRE-append rolling
    caches using the fused multi-token decode attention
    (``ops.sink_decode_attention_cached_multi``). The caches are NOT
    advanced — returns (logits [B, T, V], per-layer [(k, v)] with k/v
    [B, H_kv, T, D]) so the caller commits only the accepted prefix via
    ``SinkKVCache.append_many_counted``. Shares :func:`_layer_walk` with
    every other forward, so model changes cannot diverge the verify path
    from plain decode.
    """
    from ..ops.decode import sink_decode_attention_cached_multi

    B, T = input_ids.shape
    x = _embed_lookup(params["embed"], input_ids)
    pos = start_pos + jnp.arange(T)
    cos, sin = rope_cos_sin(cfg, pos)

    kvs = []

    def attn_step(li, lp, q, k, v):
        kvs.append((k, v))
        attn, _ = sink_decode_attention_cached_multi(
            q, k, v, caches[li], s_aux=_s_aux(lp, cfg))
        return attn

    logits = _layer_walk(params, cfg, x, cos, sin, attn_step)
    return logits, kvs


def make_caches(cfg: ModelConfig, batch: int, max_len: int,
                dtype: Any = jnp.bfloat16, quant: Optional[str] = None,
                streaming: bool = False) -> List[SinkKVCache]:
    """Per-layer caches for serving.

    Sliding layers get a rolling window of ``sliding_window``; full layers
    keep everything up to ``max_len`` — unless ``streaming`` is set, in which
    case full layers also roll (StreamingLLM mode: num_sink_tokens sinks +
    window, accepting the approximation on full layers).
    """
    caches = []
    for li in range(cfg.num_layers):
        sliding = cfg.layer_types[li] == "sliding_attention"
        if sliding:
            ns, w = cfg.num_sink_tokens, cfg.sliding_window
        elif streaming:
            ns = max(cfg.num_sink_tokens, 4)
            w = max(cfg.sliding_window, 4096)
        else:
            ns, w = cfg.num_sink_tokens, max_len
        caches.append(SinkKVCache.init(
            batch, cfg.num_kv_heads, cfg.head_dim, num_sink=ns,
            window_size=w, dtype=dtype, quant=quant))
    return caches


def make_ragged_caches(cfg: ModelConfig, batch: int, max_len: int,
                       dtype: Any = jnp.bfloat16,
                       quant: Optional[str] = None,
                       streaming: bool = False) -> list:
    """Per-layer ``RaggedSinkKVCache`` for continuous batching (same window
    policy as :func:`make_caches`)."""
    from ..cache.ragged import RaggedSinkKVCache

    caches = []
    for li in range(cfg.num_layers):
        sliding = cfg.layer_types[li] == "sliding_attention"
        if sliding:
            ns, w = cfg.num_sink_tokens, cfg.sliding_window
        elif streaming:
            ns = max(cfg.num_sink_tokens, 4)
            w = max(cfg.sliding_window, 4096)
        else:
            ns, w = cfg.num_sink_tokens, max_len
        caches.append(RaggedSinkKVCache.init(
            batch, cfg.num_kv_heads, cfg.head_dim, num_sink=ns,
            window_size=w, dtype=dtype, quant=quant))
    return caches
