"""Ragged (per-sequence) rolling sink KV cache for continuous batching.

The reference cache shares ``write_pos``/``window_len`` across the batch
and therefore requires equal-length sequences (reference cache.py:11-13,
README.md:479). This cache keeps that state **per batch slot**, so slots
can hold requests of different lengths, join mid-flight (a finished slot is
re-filled from the queue while the others keep decoding), and decode in a
single kernel launch via ``sink_decode_attention_ragged``.

Layout matches ``SinkKVCache`` (one [B, H_kv, sink_cap + window_cap, D_pad]
buffer per tensor) with one convention change: a slot's window contents may
sit at ANY ring phase. Validity is the circular-age test
``(write_pos - 1 - slot) mod window_size < window_len``, evaluated inside
the decode kernel — never by linearization copies.

Prefill insertion (``insert``) takes a right-aligned padded sequence and a
traced true length: the KV is rolled so the real tokens end at the buffer
edge, the last ``window_size`` slots are written as the full ring with
``write_pos = 0``, and the first ``num_sink`` real tokens land in the sink
region. No data-dependent shapes anywhere, so one compiled insert serves
every prompt length in a pad bucket.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from .sink_cache import (LANES, QUANT_DTYPE, _round_up, dequantize,
                         quantize)


@struct.dataclass
class RaggedSinkKVCache:
    """Per-layer rolling sink KV cache with per-sequence state.

    Array fields (pytree leaves):
        k, v: [B, H_kv, S_total, D_pad] storage (model dtype or quantized)
        k_scale, v_scale: [B, H_kv, S_total] fp32 (ones when unquantized)
        sink_len, window_len, write_pos, seen: int32 [B]

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

    @classmethod
    def init(cls, batch: int, num_kv_heads: int, head_dim: int,
             num_sink: int = 4, window_size: int = 4096,
             dtype: Any = jnp.bfloat16, quant: Optional[str] = None,
             d_pad: Optional[int] = None) -> "RaggedSinkKVCache":
        assert quant in (None, "int8", "fp8"), quant
        sink_cap = LANES if num_sink > 0 else 0
        assert num_sink <= sink_cap, "num_sink > 128 not supported"
        window_cap = _round_up(max(window_size, 1), LANES)
        s_total = sink_cap + window_cap
        d_pad = d_pad or _round_up(head_dim, LANES)
        store_dtype = QUANT_DTYPE[quant] if quant else dtype
        shape = (batch, num_kv_heads, s_total, d_pad)
        # distinct buffers per field: k/v (and the scales) must not alias,
        # or buffer donation in serving loops trips "donated twice"
        zk = jnp.zeros(shape, store_dtype)
        zv = jnp.zeros(shape, store_dtype)
        ok = jnp.ones((batch, num_kv_heads, s_total), jnp.float32)
        ov = jnp.ones((batch, num_kv_heads, s_total), jnp.float32)
        zb = jnp.zeros((batch,), jnp.int32)
        return cls(k=zk, v=zv, k_scale=ok, v_scale=ov,
                   sink_len=zb, window_len=zb, write_pos=zb, seen=zb,
                   num_sink=num_sink, window_size=window_size,
                   sink_cap=sink_cap, window_cap=window_cap, quant=quant)

    # -- helpers ----------------------------------------------------------

    @property
    def batch(self) -> int:
        return self.k.shape[0]

    @property
    def s_total(self) -> int:
        return self.sink_cap + self.window_cap

    @property
    def head_dim_padded(self) -> int:
        return self.k.shape[-1]

    def get_seq_length(self):
        """Valid cached tokens per slot: [B] int32."""
        return self.sink_len + self.window_len

    def _store(self, x):
        if self.quant:
            return quantize(x, self.quant)
        return x.astype(self.k.dtype), jnp.ones(x.shape[:-1], jnp.float32)

    # -- per-slot prefill insertion ----------------------------------------

    def insert(self, slot, k_seq: jax.Array, v_seq: jax.Array,
               true_len) -> "RaggedSinkKVCache":
        """Insert one prefilled sequence into batch slot ``slot``.

        Args:
            slot: traced/static int32 batch index.
            k_seq, v_seq: [H_kv, N_pad, D(<=D_pad)] right-padded KV
                (real tokens at [0, true_len), garbage after).
            true_len: traced int32 number of real tokens (>= 1).
        """
        H, n_pad, D = k_seq.shape
        d_pad = self.head_dim_padded
        W, ns, sc = self.window_size, self.num_sink, self.sink_cap
        if D < d_pad:
            k_seq = jnp.pad(k_seq, ((0, 0), (0, 0), (0, d_pad - D)))
            v_seq = jnp.pad(v_seq, ((0, 0), (0, 0), (0, d_pad - D)))
        if n_pad < max(W, ns):
            extra = max(W, ns) - n_pad
            k_seq = jnp.pad(k_seq, ((0, 0), (0, extra), (0, 0)))
            v_seq = jnp.pad(v_seq, ((0, 0), (0, extra), (0, 0)))
            n_pad += extra
        true_len = jnp.asarray(true_len, jnp.int32)
        slot = jnp.asarray(slot, jnp.int32)

        # Sinks: the input is right-padded (real tokens at [0, true_len)),
        # so the sink tokens are literally the first ns positions — a
        # static slice. (A previous version dynamic-sliced a rolled copy
        # relying on dynamic_slice start-clamping; XLA composes roll+slice
        # into a wrapped gather under jit, the clamp never materializes,
        # and short prompts stored their sink tokens rotated out of
        # [0, sink_len) — jit/eager divergence caught by code review.)
        sink_k = k_seq[:, :ns]
        sink_v = v_seq[:, :ns]
        n_sink = jnp.minimum(true_len, ns)

        # Window: roll so real tokens END at index n_pad, then the last W
        # slots are the ring contents (junk at the front when fewer than W
        # window tokens exist — masked out by window_len).
        shift = n_pad - true_len
        k_roll = jnp.roll(k_seq, shift, axis=1)
        v_roll = jnp.roll(v_seq, shift, axis=1)
        win_k = k_roll[:, n_pad - W:]
        win_v = v_roll[:, n_pad - W:]
        n_win = jnp.clip(true_len - ns, 0, W)

        row_k = jnp.zeros((H, self.s_total, d_pad), win_k.dtype)
        row_v = jnp.zeros_like(row_k)
        row_k = jax.lax.dynamic_update_slice(row_k, sink_k, (0, 0, 0))
        row_v = jax.lax.dynamic_update_slice(row_v, sink_v, (0, 0, 0))
        row_k = jax.lax.dynamic_update_slice(row_k, win_k, (0, sc, 0))
        row_v = jax.lax.dynamic_update_slice(row_v, win_v, (0, sc, 0))
        ck, sk = self._store(row_k)
        cv, sv = self._store(row_v)

        z = jnp.int32(0)
        new_k = jax.lax.dynamic_update_slice(self.k, ck[None], (slot, z, z, z))
        new_v = jax.lax.dynamic_update_slice(self.v, cv[None], (slot, z, z, z))
        new_ks = jax.lax.dynamic_update_slice(self.k_scale, sk[None],
                                              (slot, z, z))
        new_vs = jax.lax.dynamic_update_slice(self.v_scale, sv[None],
                                              (slot, z, z))

        def set1(x, val):
            return jax.lax.dynamic_update_slice(
                x, jnp.asarray(val, jnp.int32).reshape(1), (slot,))

        return self.replace(
            k=new_k, v=new_v, k_scale=new_ks, v_scale=new_vs,
            sink_len=set1(self.sink_len, n_sink),
            window_len=set1(self.window_len, n_win),
            write_pos=set1(self.write_pos, 0),
            seen=set1(self.seen, true_len))

    def clear(self, slot) -> "RaggedSinkKVCache":
        """Mark slot empty (its data stays but is never attended)."""
        slot = jnp.asarray(slot, jnp.int32)

        def set0(x):
            return jax.lax.dynamic_update_slice(
                x, jnp.zeros(1, jnp.int32), (slot,))

        return self.replace(sink_len=set0(self.sink_len),
                            window_len=set0(self.window_len),
                            write_pos=set0(self.write_pos),
                            seen=set0(self.seen))

    # -- batched decode append ---------------------------------------------

    def append(self, k_new: jax.Array, v_new: jax.Array,
               active: jax.Array) -> "RaggedSinkKVCache":
        """Append one decode token per ACTIVE slot.

        Args:
            k_new, v_new: [B, H_kv, 1, D] this step's KV.
            active: [B] bool; inactive slots keep their state and data
                (their token is parked in a never-valid ring slot).
        """
        B, H, n, D = k_new.shape
        assert n == 1
        d_pad = self.head_dim_padded
        if D < d_pad:
            pad = ((0, 0), (0, 0), (0, 0), (0, d_pad - D))
            k_new = jnp.pad(k_new, pad)
            v_new = jnp.pad(v_new, pad)
        ck, sk = self._store(k_new)
        cv, sv = self._store(v_new)
        W, sc = self.window_size, self.sink_cap
        # Inactive slots write to the ring slot their write_pos points at
        # anyway — but without advancing state. That slot is the OLDEST
        # (about to be evicted) when the window is full, or an unused slot
        # when it is not... except a full non-advancing window would clobber
        # its oldest live token. Park inactive writes in the last padding
        # slot of the window region instead when window_cap > window_size;
        # otherwise guard by value-select on the touched lane only.
        if self.window_cap > self.window_size:
            park = jnp.int32(self.window_size)  # a never-valid slot
        else:
            park = None
        pos = sc + self.write_pos
        # Sink promotion (matches SinkKVCache.append): a token at global
        # position < num_sink fills the next sink slot instead of the
        # ring, so short-prompt slots still pin their first num_sink SEEN
        # tokens forever. The ring is empty during promotion, so the
        # write_pos/window_len bookkeeping below is simply held.
        promote = (self.seen < self.num_sink) if self.num_sink > 0 else None
        if promote is not None:
            pos = jnp.where(promote, self.seen, pos)
        if park is not None:
            pos = jnp.where(active, pos, sc + park)
        else:
            # Read-modify-write the touched slot so inactive slots keep
            # their old token.
            old_k = jax.vmap(
                lambda buf, p: jax.lax.dynamic_slice(
                    buf, (0, p, 0), (H, 1, d_pad)))(self.k, pos)
            old_v = jax.vmap(
                lambda buf, p: jax.lax.dynamic_slice(
                    buf, (0, p, 0), (H, 1, d_pad)))(self.v, pos)
            old_ks = jax.vmap(
                lambda buf, p: jax.lax.dynamic_slice(
                    buf, (0, p), (H, 1)))(self.k_scale, pos)
            old_vs = jax.vmap(
                lambda buf, p: jax.lax.dynamic_slice(
                    buf, (0, p), (H, 1)))(self.v_scale, pos)
            sel = active[:, None, None, None]
            ck = jnp.where(sel, ck, old_k)
            cv = jnp.where(sel, cv, old_v)
            sk = jnp.where(active[:, None, None], sk, old_ks)
            sv = jnp.where(active[:, None, None], sv, old_vs)

        new_k = jax.vmap(lambda buf, tok, p: jax.lax.dynamic_update_slice(
            buf, tok, (0, p, 0)))(self.k, ck, pos)
        new_v = jax.vmap(lambda buf, tok, p: jax.lax.dynamic_update_slice(
            buf, tok, (0, p, 0)))(self.v, cv, pos)
        new_ks = jax.vmap(lambda buf, s, p: jax.lax.dynamic_update_slice(
            buf, s, (0, p)))(self.k_scale, sk, pos)
        new_vs = jax.vmap(lambda buf, s, p: jax.lax.dynamic_update_slice(
            buf, s, (0, p)))(self.v_scale, sv, pos)

        adv = active.astype(jnp.int32)
        if promote is not None:
            ring_adv = adv * (1 - promote.astype(jnp.int32))
            sink_adv = adv * promote.astype(jnp.int32)
        else:
            ring_adv, sink_adv = adv, 0
        return self.replace(
            k=new_k, v=new_v, k_scale=new_ks, v_scale=new_vs,
            sink_len=self.sink_len + sink_adv,
            write_pos=(self.write_pos + ring_adv) % W,
            window_len=jnp.minimum(self.window_len + ring_adv, W),
            seen=self.seen + adv)

    def append_many_counted(self, k_new: jax.Array, v_new: jax.Array,
                            counts: jax.Array) -> "RaggedSinkKVCache":
        """Append T tokens per slot, advancing slot ``b`` by only
        ``counts[b]`` (traced, 0 <= counts[b] <= T) — the per-slot
        speculative-decoding commit for the continuous-batching engine.

        ``k_new``/``v_new``: [B, H_kv, T, D]. Token i of slot b is a full
        no-op when ``i >= counts[b]``: :meth:`append`'s ``active`` gating
        freezes the scalar ring state AND preserves the touched slot's
        data (park slot or read-back select), so rejected draft tokens
        cannot corrupt the oldest live window entry of a full ring —
        the same guarantee as ``SinkKVCache.append_many_counted``.
        """
        T = k_new.shape[2]
        cache = self
        for i in range(T):
            keep = jnp.asarray(i, jnp.int32) < counts   # [B] bool
            cache = cache.append(k_new[:, :, i:i + 1],
                                 v_new[:, :, i:i + 1], keep)
        return cache

    # -- reads (eager/test helpers) -----------------------------------------

    def dequant_kv(self):
        if self.quant:
            return (dequantize(self.k, self.k_scale, self.quant),
                    dequantize(self.v, self.v_scale, self.quant))
        return self.k, self.v

    def linearized_kv_slot(self, slot: int, head_dim: Optional[int] = None):
        """Chronological [H_kv, sink_len + window_len, D] KV for one slot.

        Eager-only (concrete lengths); for tests.
        """
        sink_len = int(self.sink_len[slot])
        window_len = int(self.window_len[slot])
        write_pos = int(self.write_pos[slot])
        kf, vf = self.dequant_kv()
        kf, vf = kf[slot], vf[slot]
        d = head_dim or kf.shape[-1]
        sc, W = self.sink_cap, self.window_size
        parts_k = [kf[:, :sink_len, :d]]
        parts_v = [vf[:, :sink_len, :d]]
        if window_len > 0:
            wk = kf[:, sc:sc + W, :d]
            wv = vf[:, sc:sc + W, :d]
            # Oldest valid slot is (write_pos - window_len) mod W.
            start = (write_pos - window_len) % W
            wk = jnp.roll(wk, -start, axis=1)[:, :window_len]
            wv = jnp.roll(wv, -start, axis=1)[:, :window_len]
            parts_k.append(wk)
            parts_v.append(wv)
        return (jnp.concatenate(parts_k, axis=1),
                jnp.concatenate(parts_v, axis=1))
