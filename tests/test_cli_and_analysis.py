"""CLI + analysis-tool integration: generate -> train -> test -> analyze.

Drives both CLIs through their ``main(flags)`` entry points on a tiny
generated dataset and validates the analysis outputs (error analysis txt/xls,
position analysis, prediction GIF visualization, renderer).
"""

import json
import os
import random

import numpy as np
import pytest

from multimodal_seq2seq_gscan_tpu.cli import gscan as gscan_cli
from multimodal_seq2seq_gscan_tpu.cli import seq2seq as seq2seq_cli


def _gscan_flags(**overrides):
    flags = {a.dest: a.default for a in gscan_cli.build_parser()._actions
             if a.dest != "help"}
    flags.update(overrides)
    return flags


def _seq2seq_flags(**overrides):
    flags = {a.dest: a.default for a in seq2seq_cli.build_parser()._actions
             if a.dest != "help"}
    flags.update(overrides)
    return flags


@pytest.fixture(scope="module")
def generated_dir(tmp_path_factory):
    directory = str(tmp_path_factory.mktemp("cli_gscan"))
    random.seed(5)
    np.random.seed(5)
    gscan_cli.main(_gscan_flags(
        mode="generate", output_directory=directory, split="uniform",
        grid_size=6, num_resampling=1, max_examples=300,
        intransitive_verbs="walk", transitive_verbs="push", adverbs="",
        nouns="circle,square", color_adjectives="red,green",
        size_adjectives="big,small", type_grammar="normal",
        make_dev_set=True, visualize_per_template=1))
    assert os.path.exists(os.path.join(directory, "dataset.txt"))
    assert os.path.exists(os.path.join(directory, "train_dataset_stats.txt"))
    return directory


def test_generate_and_visualize(generated_dir):
    # visualize_data_examples wrote at least one GIF
    gifs = []
    for root, _, files in os.walk(generated_dir):
        gifs += [os.path.join(root, f) for f in files if f.endswith(".gif")]
    assert gifs, "expected at least one visualization GIF"


@pytest.fixture(scope="module")
def trained_dir(generated_dir):
    seq2seq_cli.main(_seq2seq_flags(
        mode="train", data_directory=generated_dir,
        output_directory=generated_dir, generate_vocabularies=True,
        input_vocab_path="input_vocab.txt",
        target_vocab_path="target_vocab.txt", training_batch_size=32,
        max_training_iterations=40, print_every=10, evaluate_every=20,
        max_decoding_steps=25, embedding_dimension=12,
        encoder_hidden_size=16, decoder_hidden_size=16, cnn_kernel_size=3,
        cnn_hidden_num_channels=8, max_testing_examples=50,
        test_batch_size=32, seed=1))
    assert os.path.exists(os.path.join(generated_dir, "checkpoint.msgpack"))
    return generated_dir


def test_cli_test_mode_writes_predict_json(trained_dir):
    # Two splits: the second reuses the first's parsed dataset (the test-mode
    # counterpart of the train loop's shared-engine load).
    seq2seq_cli.main(_seq2seq_flags(
        mode="test", data_directory=trained_dir, output_directory=trained_dir,
        generate_vocabularies=False, input_vocab_path="input_vocab.txt",
        target_vocab_path="target_vocab.txt", splits="test,dev",
        resume_from_file=os.path.join(trained_dir, "checkpoint.msgpack"),
        max_decoding_steps=25, embedding_dimension=12, encoder_hidden_size=16,
        decoder_hidden_size=16, cnn_kernel_size=3, cnn_hidden_num_channels=8,
        test_batch_size=32, seed=1))
    for split in ("test", "dev"):
        predict_path = os.path.join(trained_dir,
                                    "{}_predict.json".format(split))
        assert os.path.exists(predict_path)
        with open(predict_path) as f:
            records = json.load(f)
        assert len(records) > 0


def test_cli_test_mode_bf16_decode(trained_dir):
    """--decode_dtype=bfloat16 must flow through test mode end to end."""
    seq2seq_cli.main(_seq2seq_flags(
        mode="test", data_directory=trained_dir, output_directory=trained_dir,
        generate_vocabularies=False, input_vocab_path="input_vocab.txt",
        target_vocab_path="target_vocab.txt", splits="dev",
        resume_from_file=os.path.join(trained_dir, "checkpoint.msgpack"),
        max_decoding_steps=25, embedding_dimension=12, encoder_hidden_size=16,
        decoder_hidden_size=16, cnn_kernel_size=3, cnn_hidden_num_channels=8,
        test_batch_size=32, seed=1, decode_dtype="bfloat16",
        output_file_name="bf16_predict.json"))
    with open(os.path.join(trained_dir, "dev_bf16_predict.json")) as f:
        records = json.load(f)
    assert len(records) > 0
    # Attention weights must have been cast back to f32-native floats and
    # stay a valid distribution per step.
    for record in records[:5]:
        for step in record["attention_weights_situation"]:
            assert abs(sum(step[0]) - 1.0) < 1e-2


def test_error_analysis_cli(trained_dir):
    gscan_cli.main(_gscan_flags(
        mode="error_analysis",
        load_dataset_from=os.path.join(trained_dir, "dataset.txt"),
        output_directory=trained_dir,
        predicted_commands_files="test_predict.json"))
    out_dir = os.path.join(trained_dir, "test_predict")
    assert os.path.exists(os.path.join(out_dir, "error_analysis.txt"))
    assert os.path.exists(os.path.join(out_dir, "error_analysis.xls"))


def test_cli_train_with_fused_teacher_forced(generated_dir, tmp_path):
    """--teacher_forced_impl=pallas drives the fused kernel pair through the
    whole CLI train loop (interpret mode on CPU)."""
    out = str(tmp_path / "tf_pallas")
    seq2seq_cli.main(_seq2seq_flags(
        mode="train", data_directory=generated_dir,
        output_directory=out, generate_vocabularies=True,
        input_vocab_path="input_vocab.txt",
        target_vocab_path="target_vocab.txt", training_batch_size=16,
        max_training_iterations=2, print_every=1, evaluate_every=2,
        max_decoding_steps=25, embedding_dimension=12,
        encoder_hidden_size=16, decoder_hidden_size=16, cnn_kernel_size=3,
        cnn_hidden_num_channels=8, max_testing_examples=8,
        max_training_examples=32, test_batch_size=16, seed=1,
        steps_per_execution=1, teacher_forced_impl="pallas"))
    assert os.path.exists(os.path.join(out, "checkpoint.msgpack"))


def test_position_analysis_cli(trained_dir):
    gscan_cli.main(_gscan_flags(
        mode="position_analysis",
        load_dataset_from=os.path.join(trained_dir, "dataset.txt"),
        output_directory=trained_dir,
        predicted_commands_files="test_predict.json"))
    assert os.path.exists(os.path.join(trained_dir, "position_analysis.xls"))


def test_execute_commands_cli(trained_dir):
    # Visualize only a couple of predictions to keep the test fast.
    predict_path = os.path.join(trained_dir, "test_predict.json")
    with open(predict_path) as f:
        records = json.load(f)
    small_path = os.path.join(trained_dir, "small_predict.json")
    with open(small_path, "w") as f:
        json.dump(records[:2], f)
    gscan_cli.main(_gscan_flags(
        mode="execute_commands",
        load_dataset_from=os.path.join(trained_dir, "dataset.txt"),
        output_directory=trained_dir,
        predicted_commands_files="small_predict.json"))
    found_movie = False
    for root, _, files in os.walk(trained_dir):
        if "movie.gif" in files and ("errors" in root
                                     or "exact_matches" in root):
            found_movie = True
    assert found_movie


def test_read_gscan_standalone(generated_dir):
    from multimodal_seq2seq_gscan_tpu.data.read_gscan import data_loader
    data = data_loader(os.path.join(generated_dir, "dataset.txt"))
    assert "train" in data and len(data["train"]) > 0
    example = data["train"][0]
    assert set(example.keys()) == {"input", "target", "situation"}
    situation = np.array(example["situation"])
    assert situation.shape[0] == situation.shape[1] == 6


def test_resume_resident_training_alignment_and_tail(trained_dir):
    """Resume from iteration 40 with 10-step chunks up to 75: exercises the
    misaligned single-step prologue (40), the chunk grid (41-70), and the
    sub-chunk tail (71-75) of the device-resident path."""
    seq2seq_cli.main(_seq2seq_flags(
        mode="train", data_directory=trained_dir,
        output_directory=trained_dir, generate_vocabularies=False,
        input_vocab_path="input_vocab.txt",
        target_vocab_path="target_vocab.txt", training_batch_size=32,
        max_training_iterations=75, print_every=10, evaluate_every=20,
        resume_from_file=os.path.join(trained_dir, "checkpoint.msgpack"),
        max_decoding_steps=25, embedding_dimension=12, encoder_hidden_size=16,
        decoder_hidden_size=16, cnn_kernel_size=3, cnn_hidden_num_channels=8,
        max_testing_examples=50, test_batch_size=32, seed=1,
        steps_per_execution=10))
    meta_path = os.path.join(trained_dir, "checkpoint.msgpack.json")
    with open(meta_path) as f:
        meta = json.load(f)
    # Resume re-runs the checkpointed iteration (reference semantics), so by
    # the last evaluate_every boundary (60) the optimizer has applied
    # 40 + (40..60) = 61 steps.
    assert meta["iteration"] == 61
