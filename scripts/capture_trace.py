"""Capture jax.profiler traces of the hot paths (SURVEY.md §5).

The roofline/ablation numbers (utils/timing.py, scripts/mfu_ablation.py)
are wall-clock; this captures the XLA/TPU profiler's per-op view so
claims like "the forward kernel is VPU-bound between matmuls" can be
checked against a real trace instead of subtraction. Writes a
TensorBoard-loadable trace directory:

    python scripts/capture_trace.py [outdir]   # default /tmp/sink_trace
    tensorboard --logdir <outdir>              # -> Profile tab

Sections traced (one block each, annotated with TraceAnnotation):
  prefill_fwd   — headline config B=1 GQA 32/8 D=128 sink=4 W=4096 N=8192
  train_fwdbwd  — same config, dQ/dK/dV backward
  decode_scan   — 64 decode steps (cache append + attention) in a scan
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sink_trace"
    from sink_attention_tpu.cache import SinkKVCache
    from sink_attention_tpu.ops import (sink_decode_attention_cached,
                                        sink_flash_attention)

    B, HQ, HKV, D, NS, W, N = 1, 32, 8, 128, 4, 4096, 8192
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, HQ, N, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, N, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, N, D), jnp.bfloat16)
    aux = jax.random.normal(jax.random.PRNGKey(3), (HQ,))

    fwd = jax.jit(lambda q, k, v: sink_flash_attention(q, k, v, NS, W))

    def loss(q, k, v):
        return jnp.sum(sink_flash_attention(q, k, v, NS, W,
                                            s_aux=aux).astype(jnp.float32)
                       ** 2)

    bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    cache = SinkKVCache.init(B, HKV, D, num_sink=NS, window_size=W,
                             dtype=jnp.bfloat16)
    cache = cache.prefill(k[:, :, :W + NS], v[:, :, :W + NS])

    @jax.jit
    def decode_scan(q0, cache):
        def body(carry, _):
            qq, c = carry
            c = c.append(qq[:, :HKV], qq[:, :HKV])
            o = sink_decode_attention_cached(qq, c, s_aux=aux)
            return (o, c), ()
        (o, _), _ = jax.lax.scan(body, (q0, cache), None, length=64)
        return o

    q0 = jax.random.normal(ks[2], (B, HQ, 1, D), jnp.bfloat16)

    # compile everything OUTSIDE the trace so it records steady-state
    jax.block_until_ready(fwd(q, k, v))
    jax.block_until_ready(bwd(q, k, v))
    jax.block_until_ready(decode_scan(q0, cache))

    with jax.profiler.trace(outdir):
        with jax.profiler.TraceAnnotation("prefill_fwd"):
            jax.block_until_ready(fwd(q, k, v))
        with jax.profiler.TraceAnnotation("train_fwdbwd"):
            jax.block_until_ready(bwd(q, k, v))
        with jax.profiler.TraceAnnotation("decode_scan_64"):
            jax.block_until_ready(decode_scan(q0, cache))
    print(f"trace written to {outdir}")
    for root, _dirs, files in os.walk(outdir):
        for f in files:
            print(" ", os.path.join(root, f))


if __name__ == "__main__":
    main()
