#!/bin/bash
# GECA experiment (reference all_experiments.sh:19-21, geca_run_1.txt:
# dev EM 92.05 after 26 h): the reference trains on an externally produced
# GECA-augmented dataset that was never shipped; ours synthesizes the
# augmentation with cli.gscan --mode=augment_geca (oracle-verified GECA,
# gscan/geca.py) and then runs the same training protocol.
set -euo pipefail
cd "$(dirname "$0")/.."

G="python -m multimodal_seq2seq_gscan_tpu.cli.gscan"
S="python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq"
SRC=data/compositional_splits
D=data/geca_splits
L=documentation/training_logs
SPLITS=test,dev,visual,situational_1,situational_2,contextual,adverb_1,adverb_2,visual_easier
mkdir -p "$D" "$L" runs

if [ ! -f "$SRC/dataset.txt" ]; then
  echo "GECA source dataset $SRC/dataset.txt missing" >&2
  exit 1
fi
if [ ! -f "$D/dataset.txt" ]; then
  $G --mode=augment_geca --load_dataset_from="$SRC/dataset.txt" \
    --output_directory="$D" --max_augmented=100000 --seed=66 \
    >> "$L/geca_augment.txt" 2>&1
fi

if [ ! -f runs/r2_geca_seed66/.done ]; then
  $S --mode=train --data_directory="$D" --output_directory=runs/r2_geca_seed66 \
    --conditional_attention --no_auxiliary_task --training_batch_size=200 \
    --max_training_iterations=200000 --seed=66 --generate_vocabularies \
    --evaluate_every=4000 --print_every=500 --max_testing_examples=2000 \
    --max_decoding_steps=120 > "$L/r2_geca_seed66.txt" 2>&1
  touch runs/r2_geca_seed66/.done
fi

if [ ! -f runs/r2_geca_seed66/.tested ]; then
  $S --mode=test --data_directory="$D" --output_directory=runs/r2_geca_seed66 \
    --conditional_attention --no_auxiliary_task \
    --resume_from_file=runs/r2_geca_seed66/model_best.msgpack \
    --splits=$SPLITS --max_decoding_steps=120 --test_batch_size=512 \
    --max_testing_examples=2000 \
    >> "$L/r2_geca_seed66_test.txt" 2>&1
  touch runs/r2_geca_seed66/.tested
fi
echo "GECA RUN COMPLETE"
