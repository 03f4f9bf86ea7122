#!/bin/bash
# Round-3 stratified-chunk perf session (sequential — one TPU chip).
#
# Measures, on the real chip:
#   1. bench.py with the raised scoped-VMEM limit (pallas fused decode at
#      batch 4096 previously failed to compile at the 16 MiB default).
#   2. A real 10k-iteration training run through the stratified width-sliced
#      resident path (xla teacher-forced impl, the default) — steps/s vs the
#      147 steps/s full-width round-2 baseline, plus the EM trajectory as a
#      training-quality check (full-width runs reach train EM ~65-70 at 10k).
#   3. The same run with --teacher_forced_impl=pallas (fused kernels, now one
#      full-batch block per kernel under the raised scoped-VMEM limit).
set -uo pipefail
cd "$(dirname "$0")/.."

S="python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq"
D=data/compositional_splits_r10
L=documentation/perf_round3.txt

run10k () {  # name extra...
  local name=$1; shift
  rm -rf "/tmp/$name"
  $S --mode=train --data_directory=$D --output_directory="/tmp/$name" \
    --conditional_attention --no_auxiliary_task --training_batch_size=200 \
    --max_training_iterations=10000 --seed=66 --generate_vocabularies \
    --evaluate_every=4000 --print_every=500 --max_testing_examples=2000 \
    --max_decoding_steps=120 "$@" > "/tmp/$name.log" 2>&1
  grep -E "Iteration 000[01].000,|Evaluation" "/tmp/$name.log" \
    | grep -v DEBUG >> "$L"
}

echo "=== stratified perf session $(date) ===" >> "$L"

echo "--- bench.py (raised scoped-VMEM for the pallas fused decode) ---" >> "$L"
python bench.py 2>&1 | grep -aE "^bench:|^\{" >> "$L"

echo "--- 10k stratified run, teacher_forced=xla (default) ---" >> "$L"
run10k strat_xla

echo "--- 10k stratified run, teacher_forced=pallas (full-batch block) ---" >> "$L"
run10k strat_pallas --teacher_forced_impl=pallas

echo "=== stratified perf session done $(date) ===" >> "$L"
