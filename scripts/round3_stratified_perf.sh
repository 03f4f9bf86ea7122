#!/bin/bash
# Round-3 stratified-chunk perf session (sequential — one TPU chip).
#
# Measures, on the real chip:
#   1. bench.py with the raised scoped-VMEM limit (pallas fused decode at
#      batch 4096 previously failed to compile at the 16 MiB default).
#   2. A real 10k-iteration training run through the stratified width-sliced
#      resident path (xla teacher-forced impl) — steps/s vs the 147 steps/s
#      full-width round-2 baseline, plus the EM trajectory as a
#      training-quality check (full-width runs reach train EM ~65-70 at 10k).
#   3. The same run with --teacher_forced_impl=pallas (fused kernels, now one
#      full-batch block per kernel under the raised scoped-VMEM limit).
#   4. A full-width control run on the same build for the steps/s comparison.
#
# Env overrides (CPU smoke: tests/test_session_script.py): R3_DATA, R3_LOG,
# R3_ITERS, R3_EVAL, R3_PRINT, R3_BATCH, R3_EXTRA, R3_SKIP_BENCH=1,
# R3_SKIP_PALLAS=1.
set -uo pipefail
cd "$(dirname "$0")/.."

S="python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq"
D=${R3_DATA:-data/compositional_splits_r10}
L=${R3_LOG:-documentation/perf_round3.txt}
ITERS=${R3_ITERS:-10000}
EVAL=${R3_EVAL:-4000}
PRINT=${R3_PRINT:-500}
BATCH=${R3_BATCH:-200}
EXTRA=${R3_EXTRA:-}

run10k () {  # name extra...
  local name=$1; shift
  rm -rf "/tmp/$name"
  $S --mode=train --data_directory="$D" --output_directory="/tmp/$name" \
    --conditional_attention --no_auxiliary_task \
    --training_batch_size="$BATCH" \
    --max_training_iterations="$ITERS" --seed=66 --generate_vocabularies \
    --evaluate_every="$EVAL" --print_every="$PRINT" \
    --max_testing_examples=2000 \
    --max_decoding_steps=120 "$@" $EXTRA > "/tmp/$name.log" 2>&1
  grep -E "Iteration 000[01].000,|Evaluation|steps/s" "/tmp/$name.log" \
    | grep -v DEBUG >> "$L"
}

echo "=== stratified perf session $(date) ===" >> "$L"

if [ -z "${R3_SKIP_BENCH:-}" ]; then
  echo "--- bench.py (raised scoped-VMEM for the pallas fused decode) ---" >> "$L"
  python bench.py 2>&1 | grep -aE "^bench:|^\{" >> "$L"
fi

echo "--- 10k stratified run, teacher_forced=xla ---" >> "$L"
run10k strat_xla --chunk_layout=stratified

if [ -z "${R3_SKIP_PALLAS:-}" ]; then
  echo "--- 10k stratified run, teacher_forced=pallas (full-batch block) ---" >> "$L"
  run10k strat_pallas --chunk_layout=stratified --teacher_forced_impl=pallas
fi

echo "--- 10k full-width run (steps/s control, same build) ---" >> "$L"
run10k full_xla --chunk_layout=full

echo "=== stratified perf session done $(date) ===" >> "$L"
