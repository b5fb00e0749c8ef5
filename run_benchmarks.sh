#!/usr/bin/env bash
# Performance suite on the attached TPU: prefill/train/decode tables +
# bench_results.json + README figures. Add --engine for serving throughput.
set -euo pipefail
cd "$(dirname "$0")"
python scripts/bench_suite.py --json bench_results.json "$@"
python scripts/plot_benchmarks.py bench_results.json docs
python bench.py
