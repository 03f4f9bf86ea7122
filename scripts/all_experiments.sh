#!/bin/bash
# Canonical experiment commands (the TPU equivalent of the reference's
# all_experiments.sh): compositional-splits baseline, k-shot adverb runs,
# GECA data runs, and target-lengths runs, each over 3 seeds.
#
# Expects datasets generated with cli.gscan (or the published gSCAN datasets)
# in data/compositional_splits, data/GECA and data/target_length_split.
set -euo pipefail

SEQ2SEQ="python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq"

# Experiment 1: compositional splits baseline (3 seeds).
for seed in 66 49 50; do
  $SEQ2SEQ --mode=train --data_directory=data/compositional_splits \
    --attention_type=bahdanau --max_decoding_steps=120 --no_auxiliary_task \
    --conditional_attention --output_directory=adverb_run_seed${seed} \
    --training_batch_size=200 --max_training_iterations=200000 --seed=${seed} \
    --generate_vocabularies
done

# Experiment 1b: k-shot adverb runs (k examples of 'cautiously' in train).
# Reference seeds per k (reference all_experiments.sh:9-12):
#   k=5: 66/67/82, k=10: 84/94/104, k=50: 104/105/106.
k_seeds() { case $1 in 5) echo "66 67 82";; 10) echo "84 94 104";;
            50) echo "104 105 106";; esac; }
for k in 5 10 50; do
  for seed in $(k_seeds $k); do
    $SEQ2SEQ --mode=train --data_directory=data/compositional_splits \
      --attention_type=bahdanau --max_decoding_steps=120 --no_auxiliary_task \
      --conditional_attention --output_directory=adverb_run_k${k}_seed${seed} \
      --training_batch_size=200 --max_training_iterations=200000 \
      --seed=${seed} --k=${k} --generate_vocabularies
  done
done

# Testing over all splits.
for seed in 66 49 50; do
  $SEQ2SEQ --mode=test --data_directory=data/compositional_splits \
    --attention_type=bahdanau --no_auxiliary_task --conditional_attention \
    --output_directory=adverb_run_seed${seed} \
    --resume_from_file=adverb_run_seed${seed}/model_best.msgpack \
    --splits=test,dev,visual,situational_1,situational_2,contextual,adverb_1,adverb_2,visual_easier \
    --max_decoding_steps=120
done

# Experiment 2: GECA-augmented data (3 seeds).
for seed in 77 81 83; do
  $SEQ2SEQ --mode=train --data_directory=data/GECA \
    --attention_type=bahdanau --max_decoding_steps=120 --no_auxiliary_task \
    --conditional_attention --output_directory=geca_run_seed${seed} \
    --training_batch_size=200 --max_training_iterations=200000 --seed=${seed} \
    --generate_vocabularies
done

# Experiment 3: target lengths (wider CNN kernel, 3 seeds;
# reference all_experiments.sh:25-32 seeds).
for seed in 106 116 126; do
  $SEQ2SEQ --mode=train --data_directory=data/target_length_split \
    --attention_type=bahdanau --max_decoding_steps=120 --no_auxiliary_task \
    --conditional_attention --cnn_kernel_size=13 \
    --output_directory=target_lengths_run_seed${seed} \
    --training_batch_size=200 --max_training_iterations=200000 --seed=${seed} \
    --generate_vocabularies
done
