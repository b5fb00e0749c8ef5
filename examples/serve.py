"""Serve a gpt-oss-style model with continuous batching on one TPU chip.

    python examples/serve.py            # random-init 4-layer 20b geometry
    python examples/serve.py --bits 8   # int8 weights (~1.4-1.7x decode)
    python examples/serve.py --bits 4 --layers 24  # full 20b on one v5e

With real weights: load an HF checkpoint via
``sink_attention_tpu.models.load_hf_checkpoint`` and (optionally)
``quantize_params(params, inplace=True)`` before building the engine.
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sink_attention_tpu.models import (ModelConfig, init_params,
                                       init_quantized_params,
                                       quantize_params)
from sink_attention_tpu.serving import ContinuousBatchingEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=16, choices=(16, 8, 4))
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--tokens", type=int, default=32)
    args = ap.parse_args()

    cfg = ModelConfig.gpt_oss_20b(num_layers=args.layers)
    key = jax.random.PRNGKey(0)
    if args.bits == 16:
        params = init_params(cfg, key, jnp.bfloat16)
    elif args.bits == 8:
        params = quantize_params(init_params(cfg, key, jnp.bfloat16),
                                 inplace=True)
    else:
        params = init_quantized_params(cfg, key, bits=4)

    eng = ContinuousBatchingEngine(params, cfg, max_batch=args.slots,
                                   max_len=4096, prefill_bucket=64)
    rids = [eng.submit(list(range(1, 40 + 7 * i)),
                       max_new_tokens=args.tokens)
            for i in range(args.slots)]
    out = eng.run(chunk=16)
    for rid in rids:
        print(f"request {rid}: {out[rid]}")


if __name__ == "__main__":
    main()
