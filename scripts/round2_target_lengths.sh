#!/bin/bash
# Target-lengths experiment, remaining reference seeds (all_experiments.sh:25-32:
# seeds 106/116/126, cnn_kernel_size=13; round-1 ran seed 106 -> dev EM 99.20).
# Resumable: skips runs with .done/.tested markers.
set -euo pipefail
cd "$(dirname "$0")/.."

S="python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq"
D=data/target_length_split
L=documentation/training_logs
mkdir -p "$L" runs

run () {  # seed
  local seed=$1 name="r2_target_lengths_seed$1"
  if [ ! -f "runs/$name/.done" ]; then
    local resume=()
    if [ -f "runs/$name/checkpoint.msgpack" ]; then
      resume=("--resume_from_file=runs/$name/checkpoint.msgpack")
    fi
    $S --mode=train --data_directory=$D --output_directory="runs/$name" \
      --conditional_attention --no_auxiliary_task --training_batch_size=200 \
      --max_training_iterations=200000 --seed="$seed" --generate_vocabularies \
      --cnn_kernel_size=13 --evaluate_every=4000 --print_every=500 \
      --max_testing_examples=2000 --max_decoding_steps=120 "${resume[@]}" \
      >> "$L/$name.txt" 2>&1
    touch "runs/$name/.done"
  fi
  if [ ! -f "runs/$name/.tested" ]; then
    $S --mode=test --data_directory=$D --output_directory="runs/$name" \
      --conditional_attention --no_auxiliary_task --cnn_kernel_size=13 \
      --resume_from_file="runs/$name/model_best.msgpack" \
      --splits=test,dev --max_decoding_steps=120 --test_batch_size=512 \
      --max_testing_examples=2000 \
      >> "$L/${name}_test.txt" 2>&1
    touch "runs/$name/.tested"
  fi
}

run 116
run 126
echo "TARGET-LENGTHS RUNS COMPLETE"
