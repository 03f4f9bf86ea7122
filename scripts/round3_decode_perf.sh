#!/bin/bash
# Round-3 decode perf session (sequential — one TPU chip).
#
# Measures bench.py decode variants after the cond-skip early-exit rewrite:
#   1. default (exit_check_every=8): f32 early/fixed, bf16 early, pallas fused
#   2. exit_check_every sweep (4 / 16 / 32) for the cond-skip block size
set -uo pipefail
cd "$(dirname "$0")/.."

L=documentation/perf_round3.txt
echo "=== decode perf session $(date) ===" >> "$L"

echo "--- bench.py default (exit_check_every=8) ---" >> "$L"
timeout 1800 python bench.py 2>&1 | grep -aE "^bench:|^\{" >> "$L"

for K in 4 16 32; do
  echo "--- bench.py exit_check_every=$K ---" >> "$L"
  BENCH_EXIT_CHECK_EVERY=$K timeout 1800 python bench.py 2>&1 \
    | grep -aE "^bench:|^\{" >> "$L"
done

echo "=== decode perf session done $(date) ===" >> "$L"
