"""gpt-oss-20b golden logits criterion — the reference's flagship validation.

Mirrors /root/reference/tests/test_gpt_oss_model.py:16-164 + README.md:90-99:
load the real released MXFP4 checkpoint, run N random-token prompts through

  (a) HF transformers eager attention (the ground truth — honors s_aux and
      per-layer sliding windows exactly, materialized softmax),
  (b) OUR sink-flash kernel stack (sink_attention_tpu model + Pallas kernels),
  (c) a full-causal/no-sink ablation of our own stack (window = N,
      num_sink = 0, s_aux dropped) — the stand-in for FA2, which ignores
      both the sink logits and the sliding window,

and report mean/max abs logit diff, cosine similarity, and top-1 token
agreement of (b) and (c) against (a). Verdict: the kernel must be strictly
closer to eager than the ablation (the reference measures 0.013 vs 1.993
mean abs diff — 159x closer — on an H200).

Memory reality on one 16 GB v5e: the 20B model fits only at --quant int4
(weights ~11 GB). For the bit-honest bf16-vs-bf16 comparison run with
--platform cpu (the host has 125 GB RAM); that is also where HF eager runs.

Usage:
  python scripts/golden_gpt_oss.py --model-path /path/to/gpt-oss-20b \
      [--num-prompts 5] [--seq-len 512] [--quant int4|int8|none] \
      [--platform tpu|cpu] [--skip-hf] [--out GOLDEN.md]

If --model-path is omitted the script looks for a cached HF snapshot
(~/.cache/huggingface/hub/models--openai--gpt-oss-20b) or the
SINK_GPT_OSS_PATH env var, and exits 0 with a SKIP message when no
weights are present (zero-egress environments cannot download them).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_checkpoint(explicit: str | None) -> str | None:
    if explicit:
        return explicit if os.path.isdir(explicit) else None
    env = os.environ.get("SINK_GPT_OSS_PATH")
    if env and os.path.isdir(env):
        return env
    pat = os.path.expanduser(
        "~/.cache/huggingface/hub/models--openai--gpt-oss-20b/snapshots/*")
    for cand in sorted(glob.glob(pat)):
        if glob.glob(os.path.join(cand, "*.safetensors")):
            return cand
    return None


def _metrics(ours, theirs):
    import numpy as np
    a = np.asarray(ours, np.float32).reshape(-1)
    b = np.asarray(theirs, np.float32).reshape(-1)
    diff = np.abs(a - b)
    cos = float((a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
    return dict(mean_abs=float(diff.mean()), max_abs=float(diff.max()),
                cos=cos)


def run(model_path: str, num_prompts: int, seq_len: int, quant: str | None,
        skip_hf: bool, out_path: str | None, dtype: str = "bf16"):
    import gc

    import numpy as np
    import jax
    import jax.numpy as jnp
    import functools

    from sink_attention_tpu.models import forward_prefill
    from sink_attention_tpu.models.hf_loader import load_hf_checkpoint
    from sink_attention_tpu.ops import sink_flash_attention

    jdtype = jnp.float32 if dtype == "f32" else jnp.bfloat16
    print(f"[golden] loading {model_path} (quant={quant}, dtype={dtype}) "
          "...", flush=True)
    cfg, params = load_hf_checkpoint(model_path, quant=quant, dtype=jdtype)
    print(f"[golden] cfg: layers={cfg.num_layers} H={cfg.num_heads}/"
          f"{cfg.num_kv_heads} d={cfg.head_dim} vocab={cfg.vocab_size} "
          f"window={cfg.sliding_window}", flush=True)

    rng = np.random.default_rng(42)
    prompts = rng.integers(0, min(cfg.vocab_size, 50000),
                           size=(num_prompts, seq_len), dtype=np.int64)

    # Full-causal / no-sink ablation = the FA2 stand-in: same weights, same
    # RoPE/MoE stack, attention ignores s_aux and the sliding window.
    def fa2_standin(q, k, v, num_sink, window_size, s_aux=None, **kw):
        return sink_flash_attention(q, k, v, num_sink=0,
                                    window_size=q.shape[2], s_aux=None)

    # params as a jit ARGUMENT, never a closure: closure-captured weights
    # become inline constants (41.8 GB at the 20b geometry) and stall or
    # OOM lowering/compile.
    @jax.jit
    def ours_fn(params, ids):
        return forward_prefill(params, cfg, ids)[0]

    @jax.jit
    def ablation_fn(params, ids):
        return forward_prefill(params, cfg, ids, attn_impl=fa2_standin)[0]

    ours, ablation = [], []
    for i, p in enumerate(prompts):
        ids = jnp.asarray(p)[None]
        ours.append(np.asarray(ours_fn(params, ids)[0], np.float32))
        ablation.append(np.asarray(ablation_fn(params, ids)[0], np.float32))
        print(f"[golden] prompt {i + 1}/{num_prompts}: kernel+ablation done",
              flush=True)

    # free our params before the HF load: at fp32 x 20B each stack is
    # ~84 GB — both resident would exceed the 125 GB host
    del params
    gc.collect()

    eager = None
    if not skip_hf:
        try:
            import torch
            from transformers import AutoModelForCausalLM
            print(f"[golden] loading HF eager model (cpu, {dtype})...",
                  flush=True)
            hf = AutoModelForCausalLM.from_pretrained(
                model_path,
                torch_dtype=(torch.float32 if dtype == "f32"
                             else torch.bfloat16),
                attn_implementation="eager", local_files_only=True,
                low_cpu_mem_usage=True)  # stream-convert: fp32 from bf16
                # shards must not hold both copies (~126 GB)
            hf.eval()
            eager = []
            for i, p in enumerate(prompts):
                with torch.no_grad():
                    out = hf(torch.from_numpy(p)[None]).logits[0]
                eager.append(out.float().numpy())
                print(f"[golden] prompt {i + 1}/{num_prompts}: eager done",
                      flush=True)
        except Exception as e:  # noqa: BLE001 - report, fall back
            print(f"[golden] HF eager unavailable ({type(e).__name__}: {e});"
                  " reporting kernel-vs-ablation divergence only.",
                  flush=True)

    lines = [
        "# GOLDEN: gpt-oss-20b logits criterion",
        "",
        f"Checkpoint: `{model_path}`  quant={quant}  dtype={dtype}  "
        f"prompts={num_prompts}"
        f" seq_len={seq_len}  backend={jax.default_backend()}",
        "",
        "Protocol: reference test_gpt_oss_model.py:16-164 — eager vs "
        "sink-kernel vs full-causal-no-sink ablation (FA2 stand-in).",
        "",
    ]
    if eager is not None:
        mk = _metrics(np.stack(ours), np.stack(eager))
        ma = _metrics(np.stack(ablation), np.stack(eager))
        top1_k = float(np.mean([
            (o.argmax(-1) == e.argmax(-1)).mean()
            for o, e in zip(ours, eager)]))
        top1_a = float(np.mean([
            (a.argmax(-1) == e.argmax(-1)).mean()
            for a, e in zip(ablation, eager)]))
        ratio = ma["mean_abs"] / max(mk["mean_abs"], 1e-12)
        lines += [
            "| run | mean abs diff | max abs diff | cos sim | top-1 agree |",
            "|---|---|---|---|---|",
            f"| kernel vs eager | {mk['mean_abs']:.4g} | {mk['max_abs']:.4g}"
            f" | {mk['cos']:.6f} | {top1_k:.3f} |",
            f"| ablation (FA2 stand-in) vs eager | {ma['mean_abs']:.4g} | "
            f"{ma['max_abs']:.4g} | {ma['cos']:.6f} | {top1_a:.3f} |",
            "",
            f"**Kernel is {ratio:.1f}x closer to eager than the ablation**"
            f" (reference: 159x on H200).",
        ]
        verdict = mk["mean_abs"] < ma["mean_abs"]
        lines.append("")
        lines.append(f"Verdict: {'PASS' if verdict else 'FAIL'} — kernel "
                     f"{'is' if verdict else 'is NOT'} strictly closer to "
                     "eager than full-causal.")
    else:
        md = _metrics(np.stack(ours), np.stack(ablation))
        lines += [
            "(HF eager unavailable — divergence of the two attention "
            "patterns on the same weights; a large gap is what makes the "
            "criterion meaningful.)",
            "",
            f"kernel vs ablation: mean abs {md['mean_abs']:.4g}, max abs "
            f"{md['max_abs']:.4g}, cos {md['cos']:.6f}",
        ]
        verdict = True

    report = "\n".join(lines) + "\n"
    print(report)
    if out_path:
        with open(out_path, "w") as f:
            f.write(report)
        print(f"[golden] wrote {out_path}")
    return 0 if verdict else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", default=None)
    ap.add_argument("--num-prompts", type=int, default=5)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--quant", default="int4",
                    choices=["int4", "int8", "none"])
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--skip-hf", action="store_true",
                    help="skip the HF eager baseline (e.g. no torch RAM)")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"],
                    help="compute dtype for BOTH stacks; f32 separates "
                         "attention-pattern error from bf16 rounding noise "
                         "(random-init weights amplify bf16 noise "
                         "chaotically through 24 layers)")
    ap.add_argument("--out", default="GOLDEN.md")
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        # The axon TPU plugin overrides JAX_PLATFORMS; force it through
        # the config API too (must happen before any jax use).
        import jax
        jax.config.update("jax_platforms", args.platform)

    path = find_checkpoint(args.model_path)
    if path is None:
        print("[golden] SKIP: no gpt-oss-20b checkpoint found (looked at "
              "--model-path, $SINK_GPT_OSS_PATH, ~/.cache/huggingface). "
              "This environment has no network egress; place the released "
              "checkpoint locally to run the golden criterion.")
        return 0
    quant = None if args.quant == "none" else args.quant
    return run(path, args.num_prompts, args.seq_len, quant, args.skip_hf,
               args.out, dtype=args.dtype)


if __name__ == "__main__":
    sys.exit(main())
