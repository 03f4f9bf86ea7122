#!/bin/bash
# Round-4 consolidated TPU session: the training-side measurements the
# round-3 VERDICT asked for, strictly sequential (one TPU client at a time).
# The decode-side questions are already settled by scripts/decode_ab.py
# (documentation/perf_round4.txt).
#
#   0. GUARD: the dataset must exist. The Aug 19 between-rounds session
#      burned its whole TPU window because data/*/dataset.txt is gitignored
#      and the fresh checkout had none — fail fast with the regen command.
#   1. bench.py — validates the chained device-resident methodology + the
#      dependent-read fence on the real chip and refreshes the headline.
#   2. 10k stratified run (teacher_forced=xla): steps/s vs full-width plus
#      an EM-trajectory check (full-width reaches train EM ~65-70 at 10k).
#   3. 10k stratified run with --teacher_forced_impl=pallas (fused kernels).
#   4. 10k full-width control run on the same build.
#   5. Full 200k-iteration stratified run (seed 66) + full-split test — the
#      end-to-end EM-parity validation the stratified default needs.
#
# Every knob has an R4_* env override so the plumbing is CPU-smoke-testable
# (tests/test_session_script.py): R4_DATA / R4_RUN / R4_LOG / R4_ITERS /
# R4_EVAL / R4_PRINT / R4_BATCH / R4_SPLITS / R4_EXTRA / R4_SKIP_BENCH=1 /
# R4_SKIP_10K=1 / R4_SKIP_PALLAS=1 / R4_TENK_ITERS.
set -uo pipefail
cd "$(dirname "$0")/.."

L=${R4_LOG:-documentation/perf_round4.txt}
S="python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq"
D=${R4_DATA:-data/compositional_splits_r10}
RUN=${R4_RUN:-runs/r4_strat_seed66}
NAME=$(basename "$RUN")
ITERS=${R4_ITERS:-200000}
TENK=${R4_TENK_ITERS:-10000}
EVAL=${R4_EVAL:-10000}
TENK_EVAL=${R4_TENK_EVAL:-4000}
PRINT=${R4_PRINT:-1000}
BATCH=${R4_BATCH:-200}
SPLITS=${R4_SPLITS:-test,dev,visual,situational_1,situational_2,contextual,adverb_1,adverb_2,visual_easier}
EXTRA=${R4_EXTRA:-}
TLOG=${R4_TRAINLOG_DIR:-documentation/training_logs}
OUTJSON=${R4_RESULTS:-documentation/results_${NAME}.json}

if [ ! -f "$D/dataset.txt" ]; then
  echo "FATAL: $D/dataset.txt missing (gitignored — lost on fresh checkouts)."
  echo "Regenerate first (~30 min CPU):"
  echo "  PYTHONHASHSEED=0 python -m multimodal_seq2seq_gscan_tpu.cli.gscan \\"
  echo "    --mode=generate --output_directory=$D \\"
  echo "    --split=generalization --num_resampling=10 --make_dev_set"
  exit 1
fi

echo "=== round4 consolidated TPU session $(date) ===" >> "$L"

if [ -z "${R4_SKIP_BENCH:-}" ]; then
  echo "--- bench.py (chained device-resident methodology) ---" >> "$L"
  python bench.py 2>&1 | grep -aE "^bench:|^\{" >> "$L"
fi

run10k () {  # name extra...
  local name=$1; shift
  rm -rf "/tmp/$name"
  $S --mode=train --data_directory="$D" --output_directory="/tmp/$name" \
    --conditional_attention --no_auxiliary_task \
    --training_batch_size="$BATCH" \
    --max_training_iterations="$TENK" --seed=66 --generate_vocabularies \
    --evaluate_every="$TENK_EVAL" --print_every="$PRINT" \
    --max_testing_examples=2000 \
    --max_decoding_steps=120 "$@" $EXTRA > "/tmp/$name.log" 2>&1
  grep -aE "Iteration|Evaluation|steps/s|Exact" "/tmp/$name.log" \
    | grep -av DEBUG | tail -30 >> "$L"
}

if [ -z "${R4_SKIP_10K:-}" ]; then
  echo "--- 10k stratified run, teacher_forced=xla ---" >> "$L"
  run10k r4_strat_xla --chunk_layout=stratified
  if [ -z "${R4_SKIP_PALLAS:-}" ]; then
    echo "--- 10k stratified run, teacher_forced=pallas ---" >> "$L"
    run10k r4_strat_pallas --chunk_layout=stratified \
      --teacher_forced_impl=pallas
  fi
  echo "--- 10k full-width control run ---" >> "$L"
  run10k r4_full_xla --chunk_layout=full
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
  grep -aE "Evaluation Accuracy" "$TLOG/$NAME.txt" | tail -20 >> "$L"
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

echo "=== round4 consolidated TPU session done $(date) ===" >> "$L"
