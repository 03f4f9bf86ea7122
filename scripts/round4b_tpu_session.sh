#!/bin/bash
# Round-4b consolidated TPU session: stratified-quality experiments.
#
# The round-4 200k stratified run (runs/r4_strat_seed66) plateaued at dev
# EM 97.35 — below the 98.15 reference bar — while full-width round-2/3
# campaigns reached 98.4-99.4.  Two confounders must be separated and the
# fix validated:
#
#   1. 200k FULL-width control (seed 66) on the REGENERATED r10 dataset —
#      the shipped default path on the canonical dataset.  If this lands
#      ~98.5 the gap is the stratified layout, not the new dataset.
#   2. 10k trajectory A/Bs of stratified variants (dev eval every 2k;
#      the 10k full-width control reached dev EM 58.45 at 8k, plain
#      stratified only 18.25):
#        v2  --stratified_widths=32                (coarse 2-class)
#        v3  --stratified_widths=32 --stratified_wide_mix=0.5
#        v6  --stratified_widths=48 --stratified_wide_mix=0.5
#        il  --stratified_interleave               (multiple-16 classes)
#   3. (run separately once a winner is picked) 200k winner run + test:
#        R4B_SKIP_10K=1 R4B_SKIP_CONTROL=1 R4B_RUN=runs/r4b_<winner> \
#          R4B_WINNER_EXTRA="--chunk_layout=stratified ..." \
#          bash scripts/round4b_tpu_session.sh
#
# Strictly sequential (one TPU client at a time), every phase resumable,
# every knob env-overridable so the plumbing is CPU-smoke-testable
# (tests/test_session_script.py).
set -uo pipefail
cd "$(dirname "$0")/.."

L=${R4B_LOG:-documentation/perf_round4.txt}
S="python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq"
D=${R4B_DATA:-data/compositional_splits_r10}
CONTROL_RUN=${R4B_CONTROL_RUN:-runs/r4_full_seed66}
ITERS=${R4B_ITERS:-200000}
TENK=${R4B_TENK_ITERS:-10000}
EVAL=${R4B_EVAL:-10000}
TENK_EVAL=${R4B_TENK_EVAL:-2000}
PRINT=${R4B_PRINT:-1000}
BATCH=${R4B_BATCH:-200}
SPLITS=${R4B_SPLITS:-test,dev,visual,situational_1,situational_2,contextual,adverb_1,adverb_2,visual_easier}
EXTRA=${R4B_EXTRA:-}
TLOG=${R4B_TRAINLOG_DIR:-documentation/training_logs}
TMPD=${R4B_TMP:-/tmp}
WINNER_EXTRA=${R4B_WINNER_EXTRA:-}
RUN=${R4B_RUN:-}
SEED=${R4B_SEED:-66}
RESULTS_DIR=${R4B_RESULTS_DIR:-documentation}

if [ ! -f "$D/dataset.txt" ]; then
  echo "FATAL: $D/dataset.txt missing (gitignored — lost on fresh checkouts)."
  echo "Regenerate first (~30 min CPU):"
  echo "  PYTHONHASHSEED=0 python -m multimodal_seq2seq_gscan_tpu.cli.gscan \\"
  echo "    --mode=generate --output_directory=$D \\"
  echo "    --split=generalization --num_resampling=10 --make_dev_set"
  exit 1
fi

echo "=== round4b TPU session $(date) ===" >> "$L"

train_full () {  # rundir logname extra...
  local rundir=$1 logname=$2; shift 2
  mkdir -p "$rundir" "$TLOG"
  local resume=()
  [ -f "$rundir/checkpoint.msgpack" ] && \
    resume=("--resume_from_file=$rundir/checkpoint.msgpack")
  $S --mode=train --data_directory="$D" --output_directory="$rundir" \
    --conditional_attention --no_auxiliary_task \
    --training_batch_size="$BATCH" \
    --max_training_iterations="$ITERS" --seed="$SEED" --generate_vocabularies \
    --evaluate_every="$EVAL" --print_every="$PRINT" \
    --max_testing_examples=2000 \
    --max_decoding_steps=120 "${resume[@]}" "$@" $EXTRA \
    >> "$TLOG/$logname.txt" 2>&1
}

test_full () {  # rundir logname outjson
  local rundir=$1 logname=$2 outjson=$3
  local best="$rundir/model_best.msgpack"
  [ -f "$best" ] || best="$rundir/checkpoint.msgpack"
  $S --mode=test --data_directory="$D" --output_directory="$rundir" \
    --conditional_attention --no_auxiliary_task \
    --resume_from_file="$best" \
    --splits="$SPLITS" --max_decoding_steps=120 --test_batch_size=512 \
    --max_testing_examples=2000 $EXTRA \
    >> "$TLOG/${logname}_test.txt" 2>&1
  python scripts/summarize_results.py "$rundir" \
    --out "$outjson" >> "$L" 2>&1 || true
}

# --- phase 1: 200k full-width control on the regenerated dataset ---
if [ -z "${R4B_SKIP_CONTROL:-}" ]; then
  if [ ! -f "$CONTROL_RUN/.done" ]; then
    echo "--- 200k FULL-width control run (seed 66, regenerated r10) ---" >> "$L"
    train_full "$CONTROL_RUN" "$(basename "$CONTROL_RUN")" --chunk_layout=full
    touch "$CONTROL_RUN/.done"
    grep -aE "Evaluation Accuracy" "$TLOG/$(basename "$CONTROL_RUN").txt" \
      | tail -20 >> "$L"
  fi
  if [ ! -f "$CONTROL_RUN/.tested" ]; then
    echo "--- full-split test of the full-width control ---" >> "$L"
    test_full "$CONTROL_RUN" "$(basename "$CONTROL_RUN")" \
      "$RESULTS_DIR/results_$(basename "$CONTROL_RUN").json"
    touch "$CONTROL_RUN/.tested"
  fi
fi

# --- phase 2: 10k stratified-variant A/Bs ---
run10k () {  # name extra...
  local name=$1; shift
  [ -f "$TMPD/$name.log" ] && \
    grep -aq "Finished training" "$TMPD/$name.log" && return 0
  rm -rf "${TMPD:?}/$name"
  $S --mode=train --data_directory="$D" --output_directory="$TMPD/$name" \
    --conditional_attention --no_auxiliary_task \
    --training_batch_size="$BATCH" \
    --max_training_iterations="$TENK" --seed=66 --generate_vocabularies \
    --evaluate_every="$TENK_EVAL" --print_every="$PRINT" \
    --max_testing_examples=2000 \
    --max_decoding_steps=120 "$@" $EXTRA > "$TMPD/$name.log" 2>&1
  grep -aE "Iteration|Evaluation|steps/s|Exact" "$TMPD/$name.log" \
    | grep -av DEBUG | tail -30 >> "$L"
}

if [ -z "${R4B_SKIP_10K:-}" ]; then
  echo "--- 10k stratified v2: widths=32 ---" >> "$L"
  run10k r4b_v2 --chunk_layout=stratified --stratified_widths=32
  echo "--- 10k stratified v3: widths=32 wide_mix=0.5 ---" >> "$L"
  run10k r4b_v3 --chunk_layout=stratified --stratified_widths=32 \
    --stratified_wide_mix=0.5
  echo "--- 10k stratified v6: widths=48 wide_mix=0.5 ---" >> "$L"
  run10k r4b_v6 --chunk_layout=stratified --stratified_widths=48 \
    --stratified_wide_mix=0.5
  echo "--- 10k stratified il: multiple-16 interleaved ---" >> "$L"
  run10k r4b_il --chunk_layout=stratified --stratified_interleave
fi

# --- phase 3: 200k winner run (opt-in via R4B_RUN + R4B_WINNER_EXTRA) ---
if [ -n "$RUN" ] && [ -n "$WINNER_EXTRA" ]; then
  NAME=$(basename "$RUN")
  if [ ! -f "$RUN/.done" ]; then
    echo "--- 200k winner run: $NAME ($WINNER_EXTRA) ---" >> "$L"
    train_full "$RUN" "$NAME" $WINNER_EXTRA
    touch "$RUN/.done"
    grep -aE "Evaluation Accuracy" "$TLOG/$NAME.txt" | tail -20 >> "$L"
  fi
  if [ ! -f "$RUN/.tested" ]; then
    echo "--- full-split test of $NAME ---" >> "$L"
    test_full "$RUN" "$NAME" "$RESULTS_DIR/results_$NAME.json"
    touch "$RUN/.tested"
  fi
fi

echo "=== round4b TPU session done $(date) ===" >> "$L"
