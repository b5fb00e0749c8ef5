"""Generate README benchmark figures from measured results.

Unlike the reference's plot script (which hardcodes its benchmark numbers
— reference scripts/plot_benchmarks.py:13-32 — and absolute home-dir
output paths :149), this reads the JSON written by

    python scripts/bench_suite.py --json bench_results.json

and renders docs/performance.png (prefill latency + MFU) and
docs/decode.png (decode step latency by KV storage format).

Usage: python scripts/plot_benchmarks.py [results.json] [out_dir]
"""

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_results.json"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "docs"
    with open(path) as f:
        r = json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    dev = r.get("device", "TPU")

    # --- prefill latency + MFU ---
    pre = r["prefill"]
    ns = [p["N"] for p in pre]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    ax1.plot(ns, [p["ms"] for p in pre], "o-", label=f"{dev} (this work)")
    ref = [(p["N"], p["ref_h200_ms"]) for p in pre if p.get("ref_h200_ms")]
    if ref:
        ax1.plot([x for x, _ in ref], [y for _, y in ref], "s--",
                 label="reference Triton (H200)")
    ax1.set_xscale("log", base=2)
    ax1.set_yscale("log")
    ax1.set_xlabel("sequence length N")
    ax1.set_ylabel("forward latency (ms)")
    ax1.set_title("Prefill sink attention\n(B=1, GQA 32/8, D=128, W=4096)")
    ax1.legend()
    ax1.grid(alpha=0.3)

    ax2.plot(ns, [100 * p["mfu"] for p in pre], "o-",
             label=f"{dev} (this work)")
    if ref:
        # reference MFU on its own chip: useful_flops / t / H200 peak
        h200 = 990e12
        ax2.plot([x for x, _ in ref],
                 [100 * (p["tflops"] * 1e12 * p["ms"] /
                         p["ref_h200_ms"]) / h200
                  for p in pre if p.get("ref_h200_ms")],
                 "s--", label="reference MFU (H200)")
    ax2.set_xscale("log", base=2)
    ax2.set_xlabel("sequence length N")
    ax2.set_ylabel("model FLOPs utilization (%)")
    ax2.set_title("Silicon efficiency (useful FLOPs / peak)")
    ax2.legend()
    ax2.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "performance.png"), dpi=120)
    print(f"wrote {out_dir}/performance.png")

    # --- decode ---
    dec = r.get("decode", [])
    if dec:
        fig, ax = plt.subplots(figsize=(6, 4))
        kvs = [d["kv"] for d in dec]
        ax.bar(kvs, [d["ms_per_step"] for d in dec], width=0.55,
               label=f"{dev} (this work)")
        refs = [d.get("ref_h200_ms") for d in dec]
        if any(refs):
            ax.axhline(next(x for x in refs if x), ls="--", c="gray",
                       label="reference (H200, bf16)")
        ax.set_ylabel("ms / decode step (cache append + attention)")
        ax.set_title(f"Decode step, W={dec[0]['window']} "
                     "(B=1, GQA 32/8, D=128)")
        ax.legend()
        ax.grid(axis="y", alpha=0.3)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "decode.png"), dpi=120)
        print(f"wrote {out_dir}/decode.png")


if __name__ == "__main__":
    main()
