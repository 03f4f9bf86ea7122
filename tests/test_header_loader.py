"""load_dataset_header must reconstruct the same vocabulary/grammar/world
machinery as the full loader without reading any examples, and the analysis
entry points must produce identical output through it."""

import random

import numpy as np
import pytest

from multimodal_seq2seq_gscan_tpu.gscan import GroundedScan


@pytest.fixture(scope="module")
def saved_dataset(tmp_path_factory):
    directory = str(tmp_path_factory.mktemp("header_ds"))
    random.seed(3)
    np.random.seed(3)
    dataset = GroundedScan(
        intransitive_verbs=["walk"], transitive_verbs=["push", "pull"],
        adverbs=["cautiously", "while spinning"],
        nouns=["circle", "square"], color_adjectives=["red", "yellow"],
        size_adjectives=["big", "small"], percentage_train=0.8,
        min_object_size=1, max_object_size=4, sample_vocabulary="default",
        save_directory=directory, grid_size=6, type_grammar="adverb")
    dataset.get_data_pairs(max_examples=200, num_resampling=1,
                           split_type="uniform", make_dev_set=True)
    return dataset, dataset.save_dataset("dataset.txt")


def test_header_matches_full_loader(saved_dataset, tmp_path):
    _, path = saved_dataset
    full = GroundedScan.load_dataset_from_file(path, str(tmp_path))
    header = GroundedScan.load_dataset_header(path, str(tmp_path))
    assert str(header._grammar) == str(full._grammar)
    assert (header._vocabulary.to_representation()
            == full._vocabulary.to_representation())
    assert header._world.grid_size == full._world.grid_size
    assert header.num_examples("train") == 0  # no examples were read


def test_header_loader_one_line_empty_examples(saved_dataset, tmp_path):
    """A one-line '"examples": {},' block is self-closing; the skip state
    machine must not swallow the vocabulary keys that follow it."""
    import json
    import os

    _, path = saved_dataset
    with open(path) as f:
        data = json.load(f)
    data["examples"] = {}
    empty_path = os.path.join(str(tmp_path), "empty_examples.txt")
    with open(empty_path, "w") as f:
        json.dump(data, f, indent=4)
    header = GroundedScan.load_dataset_header(empty_path, str(tmp_path))
    full = GroundedScan.load_dataset_header(path, str(tmp_path))
    assert (header._vocabulary.to_representation()
            == full._vocabulary.to_representation())
    assert header._world.grid_size == full._world.grid_size


def test_analysis_identical_via_header_loader(saved_dataset, tmp_path):
    dataset, path = saved_dataset
    example = dataset._data_pairs["test"][0]
    # demonstrate_target_commands is the core machinery position_analysis and
    # visualize_prediction drive; it must behave identically on the
    # header-loaded dataset.
    full = GroundedScan.load_dataset_from_file(path, str(tmp_path))
    header = GroundedScan.load_dataset_header(path, str(tmp_path))
    command, _, _, situation, target_commands, _, _ = \
        dataset.parse_example(example)
    out_full = full.demonstrate_target_commands(
        command, situation, target_commands)
    out_header = header.demonstrate_target_commands(
        command, situation, target_commands)
    assert out_full[0] == out_header[0]
