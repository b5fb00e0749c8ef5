"""Direct kernel usage: prefill, packed, decode over the rolling cache.

    python examples/kernels.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sink_attention_tpu import (SinkKVCache, eager_sink_attention,
                                sink_decode_attention_cached,
                                sink_flash_attention,
                                sink_flash_attention_packed)


def main():
    B, Hq, Hkv, N, D = 1, 8, 2, 512, 64
    ns, W = 4, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, Hq, N, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, Hkv, N, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, Hkv, N, D), jnp.bfloat16)
    aux = jax.random.normal(ks[3], (Hq,), jnp.float32)

    # prefill / training attention (differentiable, s_aux included)
    out = sink_flash_attention(q, k, v, num_sink=ns, window_size=W,
                               s_aux=aux)
    ref = eager_sink_attention(q, k, v, ns, W, s_aux=aux)
    print("prefill max err vs oracle:",
          float(jnp.max(jnp.abs(out.astype(jnp.float32) -
                                ref.astype(jnp.float32)))))

    # packed batch: two 1024-token segments, per-segment sinks/windows
    pos = jnp.concatenate([jnp.arange(N // 2), jnp.arange(N // 2)])[None]
    out_p = sink_flash_attention_packed(q, k, v, pos.astype(jnp.int32),
                                        ns, W, s_aux=aux)
    print("packed out:", out_p.shape)

    # rolling cache + decode kernel
    cache = SinkKVCache.init(B, Hkv, D, num_sink=ns, window_size=W,
                             dtype=jnp.bfloat16)
    cache = cache.prefill(k, v)
    q1 = jax.random.normal(jax.random.PRNGKey(9), (B, Hq, 1, D),
                           jnp.bfloat16)
    k1 = q1[:, :Hkv]
    cache = cache.append(k1, k1)
    o1 = sink_decode_attention_cached(q1, cache, s_aux=aux)
    print("decode out:", o1.shape)


if __name__ == "__main__":
    main()
