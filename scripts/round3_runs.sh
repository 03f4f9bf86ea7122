#!/bin/bash
# Round-3 training campaign (sequential — one TPU chip). Completes the
# reference seed matrices (reference all_experiments.sh:9-12,19-21):
#   k=5  seeds 66/67/82   (66 done round 2)
#   k=10 seeds 84/94/104  (round-2 k=10 used non-reference seed 66)
#   k=50 seeds 104/105/106 (104 done rounds 1-2)
#   GECA seeds 77/81/83   (81 done round 2; 66 was a non-reference extra)
# plus 3 extra compositional baseline seeds (51/52/67) to resolve the
# visual_easier variance question (VERDICT round 2, weak #2).
# Resumable: each run skips itself when runs/<name>/.done exists.
set -euo pipefail
cd "$(dirname "$0")/.."

S="python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq"
D=data/compositional_splits_r10
GD=data/geca_splits
L=documentation/training_logs
SPLITS=test,dev,visual,situational_1,situational_2,contextual,adverb_1,adverb_2,visual_easier
mkdir -p "$L" runs

train () {  # name data_dir iters seed extra...
  local name=$1 data=$2 iters=$3 seed=$4; shift 4
  if [ -f "runs/$name/.done" ]; then echo "skip $name"; return; fi
  local resume=()
  if [ -f "runs/$name/checkpoint.msgpack" ]; then
    resume=("--resume_from_file=runs/$name/checkpoint.msgpack")
    echo "resuming $name from its checkpoint"
  fi
  $S --mode=train --data_directory="$data" --output_directory="runs/$name" \
    --conditional_attention --no_auxiliary_task --training_batch_size=200 \
    --max_training_iterations="$iters" --seed="$seed" --generate_vocabularies \
    --evaluate_every=4000 --print_every=500 --max_testing_examples=2000 \
    --max_decoding_steps=120 "${resume[@]}" "$@" >> "$L/$name.txt" 2>&1
  touch "runs/$name/.done"
}

run_test () {  # name data_dir extra...
  local name=$1 data=$2; shift 2
  if [ -f "runs/$name/.tested" ]; then echo "skip test $name"; return; fi
  $S --mode=test --data_directory="$data" --output_directory="runs/$name" \
    --conditional_attention --no_auxiliary_task \
    --resume_from_file="runs/$name/model_best.msgpack" \
    --splits=$SPLITS --max_decoding_steps=120 --test_batch_size=512 \
    --max_testing_examples=2000 "$@" \
    >> "$L/${name}_test.txt" 2>&1
  touch "runs/$name/.tested"
}

# -- k=10 on the reference's own seeds (fixes round-2 protocol deviation) --
train r3_adverb_k10_seed84 $D 200000 84 --k=10
run_test r3_adverb_k10_seed84 $D --k=10
train r3_adverb_k10_seed94 $D 200000 94 --k=10
run_test r3_adverb_k10_seed94 $D --k=10
train r3_adverb_k10_seed104 $D 200000 104 --k=10
run_test r3_adverb_k10_seed104 $D --k=10

# -- k=5 remaining reference seeds --
train r3_adverb_k5_seed67 $D 200000 67 --k=5
run_test r3_adverb_k5_seed67 $D --k=5
train r3_adverb_k5_seed82 $D 200000 82 --k=5
run_test r3_adverb_k5_seed82 $D --k=5

# -- k=50 remaining reference seeds --
train r3_adverb_k50_seed105 $D 200000 105 --k=50
run_test r3_adverb_k50_seed105 $D --k=50
train r3_adverb_k50_seed106 $D 200000 106 --k=50
run_test r3_adverb_k50_seed106 $D --k=50

# -- GECA remaining reference seeds (same augmented dataset as round 2) --
train r3_geca_seed77 $GD 200000 77
run_test r3_geca_seed77 $GD
train r3_geca_seed83 $GD 200000 83
run_test r3_geca_seed83 $GD

# -- visual_easier investigation: 3 extra compositional baseline seeds --
train r3_adverb_seed51 $D 200000 51
run_test r3_adverb_seed51 $D
train r3_adverb_seed52 $D 200000 52
run_test r3_adverb_seed52 $D
train r3_adverb_seed67 $D 200000 67
run_test r3_adverb_seed67 $D

echo "ALL ROUND-3 RUNS COMPLETE"
