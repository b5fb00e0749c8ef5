#!/usr/bin/env bash
# Block-size sweep for the Pallas kernels (run on TPU hardware).
set -euo pipefail
cd "$(dirname "$0")"
python scripts/tune_block_sizes.py "$@"
