#!/bin/bash
# Canonical experiment commands (the TPU equivalent of the reference's
# all_experiments.sh): compositional-splits baseline, k-shot adverb runs,
# GECA data runs, and target-lengths runs, each over 3 seeds.
#
# Campaign layout (settled round 5, documentation/PERFORMANCE.md): each
# 3-seed family trains as ONE vmapped multi-seed program on one chip
# (--seeds=a,b,c): one launch, one compile, one HBM-resident dataset per
# family, per-seed trajectories identical to individually trained runs,
# +3.4% aggregate throughput (per-seed step time scales near-linearly with
# stacked seeds — the step is throughput-bound, not latency-bound; see
# PERFORMANCE.md). Per-seed results land in <output>/seed_<s>/ with
# single-seed-compatible checkpoints/logs. Interrupted campaigns resume
# with --resume_from_file=<output dir> (exact trajectory replay). The
# fastest validated wall-clock path is --chunk_layout=stratified, which
# composes with --seeds (3-seed x 200k family in 46 min, 308 aggregate
# seed-steps/s, all seeds ≥ the 98.15 bar at 200k) but gives up
# ~0.3-0.4 pp dev EM vs full-width — the canonical commands keep
# full-width for reference-exact quality.
#
# Expects datasets generated with cli.gscan (or the published gSCAN datasets)
# in data/compositional_splits, data/GECA and data/target_length_split.
set -euo pipefail

SEQ2SEQ="python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq"
SPLITS=test,dev,visual,situational_1,situational_2,contextual,adverb_1,adverb_2,visual_easier

# Experiment 1: compositional splits baseline (3 seeds, one program).
$SEQ2SEQ --mode=train --data_directory=data/compositional_splits \
  --attention_type=bahdanau --max_decoding_steps=120 --no_auxiliary_task \
  --conditional_attention --output_directory=adverb_run \
  --training_batch_size=200 --max_training_iterations=200000 \
  --seeds=66,49,50 --generate_vocabularies

# Experiment 1b: k-shot adverb runs (k examples of 'cautiously' in train).
# Reference seeds per k (reference all_experiments.sh:9-12):
#   k=5: 66/67/82, k=10: 84/94/104, k=50: 104/105/106.
k_seeds() { case $1 in 5) echo "66,67,82";; 10) echo "84,94,104";;
            50) echo "104,105,106";; esac; }
for k in 5 10 50; do
  $SEQ2SEQ --mode=train --data_directory=data/compositional_splits \
    --attention_type=bahdanau --max_decoding_steps=120 --no_auxiliary_task \
    --conditional_attention --output_directory=adverb_run_k${k} \
    --training_batch_size=200 --max_training_iterations=200000 \
    --seeds=$(k_seeds $k) --k=${k} --generate_vocabularies
done

# Testing over all splits (per-seed model_best from the campaign dirs).
for seed in 66 49 50; do
  $SEQ2SEQ --mode=test --data_directory=data/compositional_splits \
    --attention_type=bahdanau --no_auxiliary_task --conditional_attention \
    --output_directory=adverb_run/seed_${seed} \
    --resume_from_file=adverb_run/seed_${seed}/model_best.msgpack \
    --splits=$SPLITS --max_decoding_steps=120
done

# Experiment 2: GECA-augmented data (3 seeds, one program).
$SEQ2SEQ --mode=train --data_directory=data/GECA \
  --attention_type=bahdanau --max_decoding_steps=120 --no_auxiliary_task \
  --conditional_attention --output_directory=geca_run \
  --training_batch_size=200 --max_training_iterations=200000 \
  --seeds=77,81,83 --generate_vocabularies

# Experiment 3: target lengths (wider CNN kernel, 3 seeds, one program;
# reference all_experiments.sh:25-32 seeds).
$SEQ2SEQ --mode=train --data_directory=data/target_length_split \
  --attention_type=bahdanau --max_decoding_steps=120 --no_auxiliary_task \
  --conditional_attention --cnn_kernel_size=13 \
  --output_directory=target_lengths_run \
  --training_batch_size=200 --max_training_iterations=200000 \
  --seeds=106,116,126 --generate_vocabularies
