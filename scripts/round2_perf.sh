#!/bin/bash
# Post-campaign single-chip perf session (run when the TPU is free):
#   1. device-time breakdown of the resident scanned trainer
#   2. steps_per_execution sweep (short real trains on the r10 dataset)
#   3. bench.py decode batch-size sweep
# Results land in documentation/perf_round2.txt for PERFORMANCE.md.
set -uo pipefail
cd "$(dirname "$0")/.."

export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}."   # scripts/*.py import the package
OUT=documentation/perf_round2.txt
S="python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq"
D=data/compositional_splits_r10

{
  echo "=== device-time breakdown (scripts/bench_chunk.py) $(date -u) ==="
  timeout 1200 python scripts/bench_chunk.py

  echo
  echo "=== steps_per_execution sweep (10k iters each, batch 200) ==="
  for K in 1 50 250 500; do
    rm -rf /tmp/sweep_k$K
    timeout 1200 $S --mode=train --data_directory=$D \
      --output_directory=/tmp/sweep_k$K --conditional_attention \
      --no_auxiliary_task --training_batch_size=200 \
      --max_training_iterations=10000 --seed=1 --generate_vocabularies \
      --evaluate_every=100000 --print_every=500 --max_decoding_steps=120 \
      --steps_per_execution=$K 2>&1 | grep -E 'steps/s' \
      | tail -5 | sed "s/^/K=$K /"
  done

  echo
  echo "=== bench.py decode batch-size sweep ==="
  for B in 512 1024 2048 4096; do
    echo "--- BENCH_BATCH_SIZE=$B"
    BENCH_BATCH_SIZE=$B timeout 1200 python bench.py
  done
} >> "$OUT" 2>&1
echo "PERF SESSION COMPLETE -> $OUT"
