"""Functional rolling sink KV cache (pytree), with INT8/FP8 quantized storage.

Replaces the reference's mutable ``SinkCacheLayer``/``SinkAttentionCache``
(/root/reference/sink_attention/cache.py:29-330) with an immutable
``flax.struct`` pytree that works under ``jit``/``lax.scan`` and can be
checkpointed as plain arrays.

TPU-first design differences from the reference:

* One buffer per layer: slots ``[0, sink_cap)`` hold the sink tokens, slots
  ``[sink_cap, sink_cap + window_cap)`` are the circular window. Both regions
  are padded to 128-slot multiples so the decode kernel can tile the slot
  dimension directly.
* The decode kernel attends over the circular window *in place* — softmax is
  permutation-invariant over the KV set, so chronological linearization
  (reference cache.py:185-216, which copies the whole window every step) is
  unnecessary; a per-slot validity mask suffices.
* Optional quantized storage (int8 or float8_e4m3fn) with per-token,
  per-head scales; dequantization is fused into the decode kernel.

Like the reference (cache.py:11-13), cache state (write_pos, lengths) is
shared across the batch dimension — batched decode requires equal lengths.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

LANES = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


QUANT_MAX = {"int8": 127.0, "fp8": 448.0}
# fp8 stores e4m3 BIT PATTERNS in int8 buffers: float8 dtype buffers get no
# native handling on pre-v6 TPUs (and cannot cross the axon jit boundary),
# while an int8 buffer DMAs at full speed and the bitcast + convert to bf16
# is a single in-kernel VPU pass (ops/decode.py).
QUANT_DTYPE = {"int8": jnp.int8, "fp8": jnp.int8}


def quantize(x: jax.Array, quant: str, axis: int = -1):
    """Symmetric per-slice quantization along ``axis`` (usually head_dim).

    Returns (codes, scale) with x ≈ decode(codes) * scale[..., None].
    int8: codes are the int values; fp8: codes are float8_e4m3fn bit
    patterns bitcast into int8 (see QUANT_DTYPE note).
    """
    qmax = QUANT_MAX[quant]
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis)
    scale = amax / qmax
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    scaled = x.astype(jnp.float32) * inv[..., None]
    if quant == "int8":
        codes = jnp.round(jnp.clip(scaled, -qmax, qmax)).astype(jnp.int8)
    else:
        f8 = jnp.clip(scaled, -qmax, qmax).astype(jnp.float8_e4m3fn)
        codes = jax.lax.bitcast_convert_type(f8, jnp.int8)
        # Flush e4m3 subnormals (magnitude bits < 8, i.e. |x| < 2^-6 of
        # the per-token scale — ≤3.5e-5 of the row max) to zero: the
        # decode kernel's shift-add e4m3->bf16 construction is exact for
        # normals only (ops/decode.py _dequant_block), so keeping codes
        # normal-or-zero makes the kernel and dequantize() bit-identical.
        codes = jnp.where((codes & 0x7F) >= 8, codes, jnp.int8(0))
    return codes, scale


def dequantize(codes: jax.Array, scale: jax.Array,
               quant: str = "int8") -> jax.Array:
    if quant == "fp8":
        codes = jax.lax.bitcast_convert_type(codes, jnp.float8_e4m3fn)
    return codes.astype(jnp.float32) * scale[..., None].astype(jnp.float32)


@struct.dataclass
class SinkKVCache:
    """Per-layer rolling sink KV cache.

    Array fields (pytree leaves):
        k, v: [B, H_kv, S_total, D_pad] storage (model dtype or quantized)
        k_scale, v_scale: [B, H_kv, S_total] fp32 (all-ones when unquantized)
        sink_len, window_len, write_pos, seen: int32 scalars

    Static fields: num_sink, window_size, sink_cap, window_cap, quant.
    """

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array
    sink_len: jax.Array
    window_len: jax.Array
    write_pos: jax.Array
    seen: jax.Array
    num_sink: int = struct.field(pytree_node=False)
    window_size: int = struct.field(pytree_node=False)
    sink_cap: int = struct.field(pytree_node=False)
    window_cap: int = struct.field(pytree_node=False)
    quant: Optional[str] = struct.field(pytree_node=False)

    # -- constructors -----------------------------------------------------

    @classmethod
    def init(cls, batch: int, num_kv_heads: int, head_dim: int,
             num_sink: int = 4, window_size: int = 4096,
             dtype: Any = jnp.bfloat16, quant: Optional[str] = None,
             d_pad: Optional[int] = None) -> "SinkKVCache":
        assert quant in (None, "int8", "fp8"), quant
        sink_cap = LANES if num_sink > 0 else 0
        assert num_sink <= sink_cap, "num_sink > 128 not supported"
        window_cap = _round_up(max(window_size, 1), LANES)
        s_total = sink_cap + window_cap
        d_pad = d_pad or _round_up(head_dim, LANES)
        store_dtype = QUANT_DTYPE[quant] if quant else dtype
        shape = (batch, num_kv_heads, s_total, d_pad)
        # distinct buffers: aliased k/v break buffer donation downstream
        zk = jnp.zeros(shape, store_dtype)
        zv = jnp.zeros(shape, store_dtype)
        ok = jnp.ones((batch, num_kv_heads, s_total), jnp.float32)
        ov = jnp.ones((batch, num_kv_heads, s_total), jnp.float32)
        z = jnp.zeros((), jnp.int32)
        return cls(k=zk, v=zv, k_scale=ok, v_scale=ov,
                   sink_len=z, window_len=z, write_pos=z, seen=z,
                   num_sink=num_sink, window_size=window_size,
                   sink_cap=sink_cap, window_cap=window_cap, quant=quant)

    # -- helpers ----------------------------------------------------------

    @property
    def s_total(self) -> int:
        return self.sink_cap + self.window_cap

    @property
    def head_dim_padded(self) -> int:
        return self.k.shape[-1]

    def get_seq_length(self):
        """Number of valid cached tokens (sink + window)."""
        return self.sink_len + self.window_len

    def get_max_cache_shape(self) -> int:
        return self.num_sink + self.window_size

    def _store(self, x):
        """Quantize (if configured) a [B,H,N,D_pad] chunk for storage."""
        if self.quant:
            return quantize(x, self.quant)
        return x.astype(self.k.dtype), jnp.ones(x.shape[:-1], jnp.float32)

    # -- updates (pure; return a new cache) -------------------------------

    def prefill(self, k: jax.Array, v: jax.Array) -> "SinkKVCache":
        """Store a full prefill sequence [B, H_kv, N, D(<=D_pad)].

        Mirrors reference semantics (cache.py:80-127): first num_sink tokens
        into the sink region, last min(window_size, N - num_sink) tokens into
        the window region; the caller runs the prefill *kernel* on the full
        (unevicted) KV.
        """
        B, H, N, D = k.shape
        d_pad = self.head_dim_padded
        if D < d_pad:
            pad = ((0, 0), (0, 0), (0, 0), (0, d_pad - D))
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
        ns, W = self.num_sink, self.window_size
        n_sink = min(N, ns)
        rest = N - n_sink
        n_win = min(rest, W)

        new_k, new_v = self.k, self.v
        new_ks, new_vs = self.k_scale, self.v_scale
        if n_sink > 0:
            ck, sk = self._store(k[:, :, :n_sink])
            cv, sv = self._store(v[:, :, :n_sink])
            new_k = new_k.at[:, :, :n_sink].set(ck)
            new_v = new_v.at[:, :, :n_sink].set(cv)
            new_ks = new_ks.at[:, :, :n_sink].set(sk)
            new_vs = new_vs.at[:, :, :n_sink].set(sv)
        if n_win > 0:
            sc = self.sink_cap
            ck, sk = self._store(k[:, :, N - n_win:])
            cv, sv = self._store(v[:, :, N - n_win:])
            new_k = new_k.at[:, :, sc:sc + n_win].set(ck)
            new_v = new_v.at[:, :, sc:sc + n_win].set(cv)
            new_ks = new_ks.at[:, :, sc:sc + n_win].set(sk)
            new_vs = new_vs.at[:, :, sc:sc + n_win].set(sv)

        return self.replace(
            k=new_k, v=new_v, k_scale=new_ks, v_scale=new_vs,
            sink_len=jnp.int32(n_sink), window_len=jnp.int32(n_win),
            write_pos=jnp.int32(n_win % W if rest > 0 else 0),
            seen=jnp.int32(N))

    def append(self, k_new: jax.Array, v_new: jax.Array,
               keep=None) -> "SinkKVCache":
        """Append one decode token [B, H_kv, 1, D] to the circular window.

        ``keep`` (optional traced bool): when False the append is a no-op —
        the scalar ring state is frozen AND the slot data is preserved by
        reading the current slot back and selecting. The read-back matters:
        once the ring is full, the next-write slot holds the OLDEST LIVE
        token (every slot is valid to the decode kernel's circular-age
        mask, ops/decode.py), so an unconditional data write there would
        corrupt real cache contents. Used by ``append_many_counted`` to
        reject speculative draft tokens without copying the cache.
        """
        B, H, n, D = k_new.shape
        assert n == 1, "append handles one token; use append_many"
        d_pad = self.head_dim_padded
        if D < d_pad:
            pad = ((0, 0), (0, 0), (0, 0), (0, d_pad - D))
            k_new = jnp.pad(k_new, pad)
            v_new = jnp.pad(v_new, pad)
        ck, sk = self._store(k_new)
        cv, sv = self._store(v_new)
        W = self.window_size
        if self.num_sink > 0:
            # Sink promotion: a token at global position < num_sink goes
            # into the (still unfilled) sink region, not the ring — so a
            # prompt shorter than num_sink still ends up with its first
            # num_sink SEEN tokens pinned forever, exactly the
            # j < num_sink term the prefill kernels implement. (During
            # promotion the ring is empty, so multi-token decode's
            # eviction model is unaffected.) The reference cache never
            # promotes (its sinks are prefill-only), which diverges from
            # its own kernel mask once the ring wraps.
            promote = self.seen < self.num_sink
            pos = jnp.where(promote, self.seen,
                            self.sink_cap + self.write_pos)
            new_sink_len = jnp.where(promote, self.sink_len + 1,
                                     self.sink_len)
            new_write = jnp.where(promote, self.write_pos,
                                  (self.write_pos + 1) % W)
            new_win = jnp.where(promote, self.window_len,
                                jnp.minimum(self.window_len + 1, W))
        else:
            pos = self.sink_cap + self.write_pos
            new_sink_len = self.sink_len
            new_write = (self.write_pos + 1) % W
            new_win = jnp.minimum(self.window_len + 1, W)
        zero = jnp.int32(0)
        if keep is not None:
            # Preserve-on-reject: select between the new token and the
            # slot's current contents (a [B,H,1,D] slice — cheap) so a
            # rejected write leaves live data untouched even when the
            # full ring's next-write slot holds the oldest live token.
            old_k = jax.lax.dynamic_slice(
                self.k, (zero, zero, pos, zero), ck.shape)
            old_v = jax.lax.dynamic_slice(
                self.v, (zero, zero, pos, zero), cv.shape)
            old_ks = jax.lax.dynamic_slice(
                self.k_scale, (zero, zero, pos), sk.shape)
            old_vs = jax.lax.dynamic_slice(
                self.v_scale, (zero, zero, pos), sv.shape)
            ck = jnp.where(keep, ck, old_k)
            cv = jnp.where(keep, cv, old_v)
            sk = jnp.where(keep, sk, old_ks)
            sv = jnp.where(keep, sv, old_vs)
            new_sink_len = jnp.where(keep, new_sink_len, self.sink_len)
            new_write = jnp.where(keep, new_write, self.write_pos)
            new_win = jnp.where(keep, new_win, self.window_len)
        new_k = jax.lax.dynamic_update_slice(self.k, ck, (zero, zero, pos, zero))
        new_v = jax.lax.dynamic_update_slice(self.v, cv, (zero, zero, pos, zero))
        new_ks = jax.lax.dynamic_update_slice(self.k_scale, sk,
                                              (zero, zero, pos))
        new_vs = jax.lax.dynamic_update_slice(self.v_scale, sv,
                                              (zero, zero, pos))
        new_seen = self.seen + 1
        if keep is not None:
            new_seen = jnp.where(keep, new_seen, self.seen)
        return self.replace(
            k=new_k, v=new_v, k_scale=new_ks, v_scale=new_vs,
            sink_len=new_sink_len, write_pos=new_write,
            window_len=new_win, seen=new_seen)

    def append_many(self, k_new: jax.Array, v_new: jax.Array) -> "SinkKVCache":
        """Append N tokens one by one (speculative decode; reference
        cache.py:176-183)."""
        n = k_new.shape[2]
        cache = self
        for i in range(n):
            cache = cache.append(k_new[:, :, i:i + 1], v_new[:, :, i:i + 1])
        return cache

    def append_many_counted(self, k_new: jax.Array, v_new: jax.Array,
                            count) -> "SinkKVCache":
        """Append T tokens but advance state by only ``count`` (traced,
        0 <= count <= T) — the on-device speculative-decoding commit.

        Rejected tokens (i >= count) are full no-ops: ``append(keep=False)``
        freezes the scalar ring state AND preserves the target slot's data
        via a read-back select. The data gating is required, not just the
        scalar gating: once the ring is full, the frozen next-write slot
        holds the oldest LIVE window token (the decode kernel's circular-age
        mask treats every slot of a full ring as valid), so an ungated
        write there would silently corrupt it and break the exact-greedy
        guarantee of speculative decoding past the window length."""
        n = k_new.shape[2]
        cache = self
        for i in range(n):
            keep = jnp.asarray(i, jnp.int32) < count
            cache = cache.append(k_new[:, :, i:i + 1], v_new[:, :, i:i + 1],
                                 keep=keep)
        return cache

    def update(self, k_new: jax.Array, v_new: jax.Array) -> "SinkKVCache":
        """Prefill on first call (seen == 0 must hold statically via N>1
        convention), decode append otherwise — HF-style dispatch on N."""
        if k_new.shape[2] == 1:
            return self.append(k_new, v_new)
        return self.prefill(k_new, v_new)

    def reorder(self, beam_idx: jax.Array) -> "SinkKVCache":
        """Beam-search batch reorder (reference cache.py:230-238).

        Small batches unroll to per-row dynamic slices: a batched
        ``jnp.take`` of big rows lowers to a one-hot contraction on TPU
        (reads the WHOLE buffer per output row — the same trap as the
        expert gather, models/model.py), which matters because beam
        search reorders every layer's cache every decode step.
        """
        n = int(beam_idx.shape[0])
        if n <= 16:
            def take(x):
                return jnp.stack([
                    jax.lax.dynamic_index_in_dim(x, beam_idx[i],
                                                 keepdims=False)
                    for i in range(n)])
        else:
            take = lambda x: jnp.take(x, beam_idx, axis=0)
        return self.replace(k=take(self.k), v=take(self.v),
                            k_scale=take(self.k_scale),
                            v_scale=take(self.v_scale))

    # -- reads ------------------------------------------------------------

    def dequant_kv(self):
        """Full-capacity dequantized buffers [B,H,S_total,D_pad] fp32/bf16."""
        if self.quant:
            return (dequantize(self.k, self.k_scale, self.quant),
                    dequantize(self.v, self.v_scale, self.quant))
        return self.k, self.v

    def linearized_kv(self, head_dim: Optional[int] = None):
        """Chronological [B, H_kv, sink_len + window_len, D] KV.

        Eager-only (uses concrete lengths); for tests and HF-compat paths.
        The decode kernel does NOT use this — it reads the circular buffer
        in place.
        """
        sink_len = int(self.sink_len)
        window_len = int(self.window_len)
        write_pos = int(self.write_pos)
        kf, vf = self.dequant_kv()
        d = head_dim or kf.shape[-1]
        sc, W = self.sink_cap, self.window_size
        parts_k = [kf[:, :, :sink_len, :d]]
        parts_v = [vf[:, :, :sink_len, :d]]
        if window_len > 0:
            wk = kf[:, :, sc:sc + W, :d]
            wv = vf[:, :, sc:sc + W, :d]
            if window_len < W:
                parts_k.append(wk[:, :, :window_len])
                parts_v.append(wv[:, :, :window_len])
            else:
                parts_k.append(jnp.roll(wk, -write_pos, axis=2))
                parts_v.append(jnp.roll(wv, -write_pos, axis=2))
        return (jnp.concatenate(parts_k, axis=2),
                jnp.concatenate(parts_v, axis=2))
