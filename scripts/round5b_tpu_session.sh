#!/bin/bash
# Round-5b TPU session: the 200k multi-seed vmap campaign (VERDICT r4 item 4).
#
#   1. Train seeds 66/49/50 SIMULTANEOUSLY in one vmapped program on one chip
#      (reference protocol: 3 seeds per family, all_experiments.sh:5-7, each
#      a separate 26 h job). Done-bar: campaign wall-clock ~= one single-seed
#      run, per-seed best dev EM matching individually-trained runs
#      (full-width individual: 98.55/98.50/98.40 on seeds 66/49/50).
#   2. Per-split test (9 splits x 2000) for each seed's model_best.
#
# Resumable via marker files; one TPU client at a time.
set -uo pipefail
cd "$(dirname "$0")/.."

L=${R5B_LOG:-documentation/perf_round5.txt}
S="python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq"
D=${R5B_DATA:-data/compositional_splits_r10}
RUN=${R5B_RUN:-runs/r5_multiseed_200k}
ITERS=${R5B_ITERS:-200000}
SEEDS=${R5B_SEEDS:-66,49,50}
SPLITS=${R5B_SPLITS:-test,dev,visual,situational_1,situational_2,contextual,adverb_1,adverb_2,visual_easier}
CACHE=${R5B_CACHE:-$HOME/.cache/jax_gscan}
TLOG=${R5B_TLOG:-documentation/training_logs/r5_multiseed_200k.txt}
BATCH=${R5B_BATCH:-200}
EVAL=${R5B_EVAL:-4000}
PRINT=${R5B_PRINT:-500}
TESTN=${R5B_TESTN:-2000}
MAXDEC=${R5B_MAXDEC:-120}
TESTBATCH=${R5B_TESTBATCH:-512}
EXTRA=${R5B_EXTRA:-}

mkdir -p "$RUN" "$(dirname "$L")" "$(dirname "$TLOG")"
echo "=== round5b TPU session $(date) ===" >> "$L"

if [ ! -f "$D/dataset.txt" ]; then
  echo "FATAL: $D/dataset.txt missing." | tee -a "$L"
  exit 1
fi

# --- phase 1: the 200k 3-seed campaign ---
if [ ! -f "$RUN/.done" ]; then
  echo "--- multiseed 200k campaign: seeds=$SEEDS ---" >> "$L"
  # Resume an interrupted campaign: every seed checkpoints at each eval
  # boundary, so if the first seed has a running checkpoint they all do.
  RESUME=""
  if [ -f "$RUN/seed_${SEEDS%%,*}/checkpoint.msgpack" ]; then
    RESUME="--resume_from_file=$RUN"
    echo "(resuming from per-seed checkpoints in $RUN)" >> "$L"
  fi
  start=$(date +%s)
  $S --mode=train --data_directory="$D" --output_directory="$RUN" $RESUME \
    --conditional_attention --no_auxiliary_task \
    --training_batch_size="$BATCH" \
    --max_training_iterations="$ITERS" --seeds="$SEEDS" \
    --generate_vocabularies --evaluate_every="$EVAL" --print_every="$PRINT" \
    --max_testing_examples="$TESTN" --max_decoding_steps="$MAXDEC" \
    --compilation_cache_dir="$CACHE" $EXTRA >> "$TLOG" 2>&1
  rc=$?
  echo "multiseed 200k: rc=$rc, $(( $(date +%s) - start ))s wall" >> "$L"
  if [ $rc -ne 0 ]; then exit $rc; fi
  touch "$RUN/.done"
  # Final + best lines for each seed into the session log.
  grep -E "Evaluation \[seed" "$TLOG" | tail -3 >> "$L"
fi

# --- phase 2: per-split tests for each seed ---
for s in ${SEEDS//,/ }; do
  SD="$RUN/seed_$s"
  if [ -f "$SD/.tested" ]; then continue; fi
  if [ ! -f "$SD/model_best.msgpack" ]; then
    echo "WARN: $SD/model_best.msgpack missing, skipping test" >> "$L"
    continue
  fi
  echo "--- test seed $s ($SPLITS) ---" >> "$L"
  $S --mode=test --data_directory="$D" --output_directory="$SD" \
    --conditional_attention --no_auxiliary_task \
    --resume_from_file="$SD/model_best.msgpack" \
    --splits="$SPLITS" --max_decoding_steps="$MAXDEC" \
    --test_batch_size="$TESTBATCH" \
    --max_testing_examples="$TESTN" --compilation_cache_dir="$CACHE" \
    $EXTRA >> "$TLOG" 2>&1 && touch "$SD/.tested"
done

echo "=== round5b session done $(date) ===" >> "$L"
