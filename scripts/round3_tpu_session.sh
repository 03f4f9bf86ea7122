#!/bin/bash
# Round-3 consolidated TPU session: run everything that was queued during the
# tunnel outage, strictly sequentially (one TPU client at a time).
#
#   1. scripts/round3_decode_perf.sh   — bench variants + exit_check_every sweep
#   2. scripts/round3_stratified_perf.sh — bench + 10k stratified train runs
#   3. a full 200k-iteration stratified-path run (seed 66, r10 dataset) as
#      end-to-end validation that the width-sliced chunks train to parity,
#      tested over all splits like scripts/round2_runs.sh.
#
# Every knob has an R3_* env override so the whole session's plumbing can be
# smoke-run on CPU against a tiny dataset (tests/test_session_script.py):
#   R3_DATA / R3_RUN / R3_LOG / R3_ITERS / R3_EVAL / R3_PRINT / R3_BATCH /
#   R3_SPLITS / R3_EXTRA (extra CLI flags) / R3_SKIP_PERF=1 (skip the perf
#   sub-scripts, which carry their own overrides).
set -uo pipefail
cd "$(dirname "$0")/.."

L=${R3_LOG:-documentation/perf_round3.txt}
S="python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq"
D=${R3_DATA:-data/compositional_splits_r10}
RUN=${R3_RUN:-runs/r3_strat_seed66}
NAME=$(basename "$RUN")
ITERS=${R3_ITERS:-200000}
EVAL=${R3_EVAL:-10000}
PRINT=${R3_PRINT:-1000}
BATCH=${R3_BATCH:-200}
SPLITS=${R3_SPLITS:-test,dev,visual,situational_1,situational_2,contextual,adverb_1,adverb_2,visual_easier}
EXTRA=${R3_EXTRA:-}
TLOG=${R3_TRAINLOG_DIR:-documentation/training_logs}
OUTJSON=${R3_RESULTS:-documentation/results_${NAME}.json}

echo "=== round3 consolidated TPU session $(date) ===" >> "$L"

if [ -z "${R3_SKIP_PERF:-}" ]; then
  bash scripts/round3_decode_perf.sh
  bash scripts/round3_stratified_perf.sh
fi

if [ ! -f "$RUN/.done" ]; then
  echo "--- full ${ITERS}-iteration stratified run (seed 66) ---" >> "$L"
  mkdir -p "$RUN" "$TLOG"
  RESUME=()
  [ -f "$RUN/checkpoint.msgpack" ] && \
    RESUME=("--resume_from_file=$RUN/checkpoint.msgpack")
  $S --mode=train --data_directory="$D" --output_directory="$RUN" \
    --conditional_attention --no_auxiliary_task \
    --training_batch_size="$BATCH" \
    --max_training_iterations="$ITERS" --seed=66 --generate_vocabularies \
    --evaluate_every="$EVAL" --print_every="$PRINT" \
    --max_testing_examples=2000 \
    --max_decoding_steps=120 --chunk_layout=stratified \
    "${RESUME[@]}" $EXTRA \
    >> "$TLOG/$NAME.txt" 2>&1
  touch "$RUN/.done"
  grep -E "Evaluation Accuracy" "$TLOG/$NAME.txt" \
    | tail -20 >> "$L"
fi

if [ ! -f "$RUN/.tested" ]; then
  echo "--- full-split test of the stratified run ---" >> "$L"
  BEST="$RUN/model_best.msgpack"
  [ -f "$BEST" ] || BEST="$RUN/checkpoint.msgpack"  # no dev improvement yet
  $S --mode=test --data_directory="$D" --output_directory="$RUN" \
    --conditional_attention --no_auxiliary_task \
    --resume_from_file="$BEST" \
    --splits="$SPLITS" --max_decoding_steps=120 --test_batch_size=512 \
    --max_testing_examples=2000 $EXTRA \
    >> "$TLOG/${NAME}_test.txt" 2>&1
  touch "$RUN/.tested"
  python scripts/summarize_results.py "$RUN" \
    --out "$OUTJSON" >> "$L" 2>&1 || true
fi

echo "=== round3 consolidated TPU session done $(date) ===" >> "$L"
