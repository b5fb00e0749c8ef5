"""Measure int4 matmul decode variants on the real chip.

This script recorded the decision in ops/int4.py's module docstring:

  a) pallas      — (removed) Pallas kernel, signed-sum in-kernel decode:
                   1.901 ms @T=8 (18.6% of HBM roofline)
  b) xla_sum     — pure-XLA signed-sum float decode (byte = 16*hi + lo,
                   hi = round(b/16)): 1.248 ms @T=8 (28.3%)
  c) xla_nib     — pure-XLA nibble decode via int32 shifts — the
                   production path (ops.int4.int4_matmul):
                   0.779 ms @T=8 (45.4%)
  d) int8_ref    — XLA int8->bf16 fused dot, 2x the HBM bytes:
                   0.868 ms @T=8 (81.5% of the int8 roofline)

Shapes: gpt-oss-20b lm_head (K=2880, N=201088 padded to 201216) at
decode T=8 and prefill T=256.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sink_attention_tpu.ops.int4 import pack_int4, int4_matmul
from sink_attention_tpu.utils.timing import time_chained, V5E_HBM_BW

K, N = 2880, 201216


def chain(mm):
    """Wrap a matmul into an x -> x op for time_chained (N >= K here)."""
    def op(x, *consts):
        o = mm(x, *consts)
        return x + (o[:, :K] * jnp.bfloat16(1e-6)).astype(x.dtype)
    return op


def pack_signed_sum(w):
    """Signed-sum packing: byte = 16*hi + lo, both halves in [-7, 7]."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.where(amax == 0.0, 1.0, amax / 7.0)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    K2 = q.shape[0] // 2
    packed = (jnp.int8(16) * q[K2:] + q[:K2]).astype(jnp.int8)
    return packed, scale


def xla_sum(x, packed, scale):
    """Pure-XLA decode of signed-sum bytes with float arithmetic."""
    wf = packed.astype(jnp.float32)
    hi = jnp.round(wf * 0.0625)
    lo = wf - hi * 16.0
    K2 = packed.shape[0]
    acc = jnp.dot(x[:, :K2], lo.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(x[:, K2:], hi.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    return (acc * scale.reshape(1, -1)).astype(x.dtype)


def int8_ref(x, w8, scale):
    return (jnp.dot(x, w8.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            * scale.reshape(1, -1)).astype(x.dtype)


def main():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.02
    packed, scale = pack_int4(w, contract_axis=0)
    # grouped row: does the repeat+multiply scale application fuse into
    # the dot's operand read like the nibble decode does, or does it
    # materialize a [K, N] bf16 tensor (which would halve GB/s)?
    packed_g, scale_g = pack_int4(w, contract_axis=0, group_size=32)
    packed_ss, scale_ss = pack_signed_sum(w)
    w8 = jnp.clip(jnp.round(w / (jnp.max(jnp.abs(w), axis=0,
                  keepdims=True) / 127.0)), -127, 127).astype(jnp.int8)
    s8 = (jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0)

    for T in (8, 256):
        x = jax.random.normal(jax.random.PRNGKey(1), (T, K),
                              jnp.bfloat16)
        b4 = packed.size  # int8 bytes holding 2 nibbles
        b8 = w8.size
        rows = [
            ("prod_nib", chain(int4_matmul), (x, packed, scale), b4),
            ("grouped32", chain(int4_matmul), (x, packed_g, scale_g), b4),
            ("xla_sum", chain(xla_sum), (x, packed_ss, scale_ss), b4),
            ("int8", chain(int8_ref), (x, w8, s8), b8),
        ]
        out = [f"T={T:4d} "]
        for name, fn, a, nbytes in rows:
            t = time_chained(fn, *a)
            out.append(f" {name} {t*1e3:7.3f} ms "
                       f"({nbytes/t/1e9:6.1f} GB/s, "
                       f"{nbytes/t/V5E_HBM_BW*100:4.1f}% roof) ")
        print("".join(out))

    # correctness cross-check: production vs signed-sum variant
    x = jax.random.normal(jax.random.PRNGKey(1), (8, K), jnp.bfloat16)
    a = int4_matmul(x, packed, scale)
    b = xla_sum(x, packed_ss, scale_ss)
    print("prod vs xla_sum max|d|:",
          float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                b.astype(jnp.float32)))))


if __name__ == "__main__":
    main()
