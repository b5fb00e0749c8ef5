#!/usr/bin/env bash
# Full test suite on a virtual 8-device CPU mesh (no hardware needed).
# TPU-hardware variant: SINK_ATTN_TEST_TPU=1 ./run_tests.sh
# (Counterpart of the reference's SLURM sbatch runners - run_tests.sh etc. -
# which request an H200 per suite; here CI needs no accelerator.)
#
# Two phases, two processes. The tests that import torch/transformers
# (HF-parity checks) are quarantined into their own pytest process:
# loading torch's runtime (OpenMP/MKL thread pools, its own LLVM) into
# the same process as XLA's CPU backend intermittently segfaults later
# heavy XLA compiles (observed deterministically at suite scale inside
# backend_compile_and_load during test_parallel.py, round 4). Process
# isolation removes the shared-runtime interaction entirely; each phase
# is still plain pytest.
set -euo pipefail
cd "$(dirname "$0")"

echo "=== Phase 0: README perf tables match bench_results.json ==="
python scripts/readme_tables.py --check

TORCH_TESTS=(tests/test_model.py tests/test_dense_model.py tests/test_hf_mxfp4.py)

IGNORES=()
for t in "${TORCH_TESTS[@]}"; do IGNORES+=("--ignore=$t"); done

echo "=== Phase 1/2: JAX-only suite ==="
python -m pytest tests/ -q "${IGNORES[@]}" "$@"

echo "=== Phase 2/2: torch/transformers parity suite (isolated process) ==="
python -m pytest "${TORCH_TESTS[@]}" -q "$@"
