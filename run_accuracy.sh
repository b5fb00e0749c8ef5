#!/usr/bin/env bash
# Numerical accuracy tables (kernel vs fp32 eager oracle).
# Default: CPU interpret mode; pass --tpu to run on hardware.
set -euo pipefail
cd "$(dirname "$0")"
python scripts/numerical_accuracy.py "$@"
