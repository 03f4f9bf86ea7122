#!/bin/bash
# Round-2 training campaign (sequential — one TPU chip):
#   1. compositional baseline seed 66, 400k iters (EM-parity run)
#   2. compositional seeds 49 / 50, 200k iters (3-seed matrix)
#   3. k=5 / k=10 adverb runs, 200k iters (k-shot progression)
#   4. per-split testing for every trained run
# Mirrors the reference protocol (all_experiments.sh:5-17) on the
# num_resampling=10 regenerated dataset.
set -euo pipefail
cd "$(dirname "$0")/.."

S="python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq"
D=data/compositional_splits_r10
L=documentation/training_logs
SPLITS=test,dev,visual,situational_1,situational_2,contextual,adverb_1,adverb_2,visual_easier
mkdir -p "$L" runs

train () {  # name iters seed extra...
  local name=$1 iters=$2 seed=$3; shift 3
  if [ -f "runs/$name/.done" ]; then echo "skip $name"; return; fi
  local resume=()
  if [ -f "runs/$name/checkpoint.msgpack" ]; then
    resume=("--resume_from_file=runs/$name/checkpoint.msgpack")
    echo "resuming $name from its checkpoint"
  fi
  $S --mode=train --data_directory=$D --output_directory="runs/$name" \
    --conditional_attention --no_auxiliary_task --training_batch_size=200 \
    --max_training_iterations="$iters" --seed="$seed" --generate_vocabularies \
    --evaluate_every=4000 --print_every=500 --max_testing_examples=2000 \
    --max_decoding_steps=120 "${resume[@]}" "$@" >> "$L/$name.txt" 2>&1
  touch "runs/$name/.done"
}

run_test () {  # name extra...
  local name=$1; shift
  if [ -f "runs/$name/.tested" ]; then echo "skip test $name"; return; fi
  $S --mode=test --data_directory=$D --output_directory="runs/$name" \
    --conditional_attention --no_auxiliary_task \
    --resume_from_file="runs/$name/model_best.msgpack" \
    --splits=$SPLITS --max_decoding_steps=120 --test_batch_size=512 \
    --max_testing_examples=2000 "$@" \
    >> "$L/${name}_test.txt" 2>&1
  touch "runs/$name/.tested"
}

train r2_adverb_seed66 400000 66
run_test r2_adverb_seed66
train r2_adverb_seed49 200000 49
run_test r2_adverb_seed49
train r2_adverb_seed50 200000 50
run_test r2_adverb_seed50
train r2_adverb_k5_seed66 200000 66 --k=5
run_test r2_adverb_k5_seed66 --k=5
train r2_adverb_k10_seed66 200000 66 --k=10
run_test r2_adverb_k10_seed66 --k=10
echo "ALL ROUND-2 RUNS COMPLETE"
