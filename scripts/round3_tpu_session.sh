#!/bin/bash
# Round-3 consolidated TPU session: run everything that was queued during the
# tunnel outage, strictly sequentially (one TPU client at a time).
#
#   1. scripts/round3_decode_perf.sh   — bench variants + exit_check_every sweep
#   2. scripts/round3_stratified_perf.sh — bench + 2x 10k stratified train runs
#   3. a full 200k-iteration stratified-path run (seed 66, r10 dataset) as
#      end-to-end validation that the width-sliced chunks train to parity,
#      tested over all splits like scripts/round2_runs.sh.
set -uo pipefail
cd "$(dirname "$0")/.."

L=documentation/perf_round3.txt
S="python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq"
D=data/compositional_splits_r10
NAME=r3_strat_seed66
RUN=runs/$NAME
SPLITS=test,dev,visual,situational_1,situational_2,contextual,adverb_1,adverb_2,visual_easier

echo "=== round3 consolidated TPU session $(date) ===" >> "$L"

bash scripts/round3_decode_perf.sh
bash scripts/round3_stratified_perf.sh

if [ ! -f "$RUN/.done" ]; then
  echo "--- full 200k stratified run (seed 66) ---" >> "$L"
  mkdir -p "$RUN" documentation/training_logs
  RESUME=()
  [ -f "$RUN/checkpoint.msgpack" ] && \
    RESUME=("--resume_from_file=$RUN/checkpoint.msgpack")
  $S --mode=train --data_directory=$D --output_directory="$RUN" \
    --conditional_attention --no_auxiliary_task --training_batch_size=200 \
    --max_training_iterations=200000 --seed=66 --generate_vocabularies \
    --evaluate_every=10000 --print_every=1000 --max_testing_examples=2000 \
    --max_decoding_steps=120 "${RESUME[@]}" \
    >> "documentation/training_logs/$NAME.txt" 2>&1
  touch "$RUN/.done"
  grep -E "Evaluation Accuracy" "documentation/training_logs/$NAME.txt" \
    | tail -20 >> "$L"
fi

if [ ! -f "$RUN/.tested" ]; then
  echo "--- full-split test of the 200k stratified run ---" >> "$L"
  $S --mode=test --data_directory=$D --output_directory="$RUN" \
    --conditional_attention --no_auxiliary_task \
    --resume_from_file="$RUN/model_best.msgpack" \
    --splits=$SPLITS --max_decoding_steps=120 --test_batch_size=512 \
    --max_testing_examples=2000 \
    >> "documentation/training_logs/${NAME}_test.txt" 2>&1
  touch "$RUN/.tested"
  python scripts/summarize_results.py "$RUN" \
    --out "documentation/results_r3_strat_seed66.json" >> "$L" 2>&1 || true
fi

echo "=== round3 consolidated TPU session done $(date) ===" >> "$L"
