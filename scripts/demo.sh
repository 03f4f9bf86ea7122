#!/bin/bash
# Demo: generate a small gSCAN dataset, train the demo-size model, test it.
# Mirrors the reference README demo flow (README.md "Demo: training a model on
# a dummy dataset") at grid size 4 with walk-only commands.
set -euo pipefail

DATA_DIR=${1:-data/demo_dataset}
OUTPUT_DIR=${2:-output}

python -m multimodal_seq2seq_gscan_tpu.cli.gscan \
  --mode=generate --output_directory="$DATA_DIR" \
  --split=generalization --grid_size=4 --num_resampling=2 \
  --type_grammar=simple_intrans --intransitive_verbs=walk --transitive_verbs="" \
  --adverbs="" --nouns=circle,square,cylinder \
  --color_adjectives=red,green,yellow,blue --size_adjectives=big,small \
  --percentage_train=0.8 --make_dev_set

python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq \
  --mode=train --data_directory="$DATA_DIR" --output_directory="$OUTPUT_DIR" \
  --embedding_dimension=5 --encoder_hidden_size=20 --decoder_hidden_size=20 \
  --max_training_iterations=1000 --training_batch_size=5 --print_every=100 \
  --evaluate_every=500 --generate_vocabularies --max_decoding_steps=50

python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq \
  --mode=test --data_directory="$DATA_DIR" --output_directory="$OUTPUT_DIR" \
  --embedding_dimension=5 --encoder_hidden_size=20 --decoder_hidden_size=20 \
  --resume_from_file="$OUTPUT_DIR/model_best.msgpack" \
  --splits=test,visual,situational_1 --max_decoding_steps=50 \
  --input_vocab_path=training_input_vocab.txt \
  --target_vocab_path=training_target_vocab.txt --load_vocabularies
