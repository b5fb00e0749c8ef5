#!/usr/bin/env bash
# Full test suite on a virtual 8-device CPU mesh (no hardware needed).
# TPU-hardware variant: SINK_ATTN_TEST_TPU=1 ./run_tests.sh
# (Counterpart of the reference's SLURM sbatch runners - run_tests.sh etc. -
# which request an H200 per suite; here CI needs no accelerator.)
set -euo pipefail
cd "$(dirname "$0")"
python -m pytest tests/ -q "$@"
