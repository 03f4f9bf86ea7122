"""Native C++ loader vs engine loader: identical arrays and lazy strings."""

import os
import random
import subprocess


import numpy as np
import pytest

from multimodal_seq2seq_gscan_tpu.data import native_loader
from multimodal_seq2seq_gscan_tpu.data.dataset import GroundedScanDataset
from multimodal_seq2seq_gscan_tpu.gscan import GroundedScan

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not native_loader.is_available():
        subprocess.run(["bash", os.path.join(REPO_ROOT, "scripts",
                                             "build_native.sh")], check=True)
    assert native_loader.is_available()


@pytest.fixture(scope="module")
def dataset_path(tmp_path_factory):
    directory = str(tmp_path_factory.mktemp("native_ds"))
    random.seed(9)
    np.random.seed(9)
    dataset = GroundedScan(
        intransitive_verbs=["walk"], transitive_verbs=["push"],
        adverbs=[], nouns=["circle", "square"],
        color_adjectives=["red", "green"], size_adjectives=["big", "small"],
        percentage_train=0.8, min_object_size=1, max_object_size=4,
        sample_vocabulary="default", save_directory=directory, grid_size=6,
        type_grammar="normal")
    dataset.get_data_pairs(max_examples=300, num_resampling=1,
                           split_type="uniform", make_dev_set=True)
    return dataset.save_dataset("dataset.txt"), directory


def _load(path, directory, backend):
    ds = GroundedScanDataset(
        path, directory, k=0, split="train",
        input_vocabulary_file="iv.txt", target_vocabulary_file="tv.txt",
        generate_vocabulary=True, backend=backend)
    ds.read_dataset()
    return ds

def test_native_equals_engine(dataset_path):
    path, directory = dataset_path
    engine = _load(path, directory, "engine")
    native = _load(path, directory, "native")

    assert native.num_examples == engine.num_examples
    assert native.input_vocabulary.to_dict() == \
        engine.input_vocabulary.to_dict()
    assert native.target_vocabulary.to_dict() == \
        engine.target_vocabulary.to_dict()
    assert native.image_dimensions == engine.image_dimensions
    assert native.image_channels == engine.image_channels
    np.testing.assert_array_equal(native._input_lengths,
                                  engine._input_lengths)
    np.testing.assert_array_equal(native._target_lengths,
                                  engine._target_lengths)
    np.testing.assert_array_equal(native._agent_positions,
                                  engine._agent_positions)
    np.testing.assert_array_equal(native._target_positions,
                                  engine._target_positions)
    for i in range(native.num_examples):
        np.testing.assert_array_equal(native._input_ids[i],
                                      engine._input_ids[i])
        np.testing.assert_array_equal(native._target_ids[i],
                                      engine._target_ids[i])
        np.testing.assert_array_equal(native._situations[i],
                                      engine._situations[i])
        assert native._derivation_representations[i] == \
            engine._derivation_representations[i]
    # Lazy situation dicts decode to the engine's dicts.
    for i in (0, native.num_examples - 1):
        assert native._situation_representations[i] == \
            engine._situation_representations[i]


def test_native_dataset_splits(dataset_path):
    path, _ = dataset_path
    nd = native_loader.NativeDataset(path)
    assert nd.grid_size == 6
    assert set(nd.splits.keys()) >= {"train", "test", "dev"}
    assert len(nd.splits["train"]) > 0

def test_native_k_shot_move_is_seed_deterministic(dataset_path):
    """k-shot selection must be reproducible from a seeded rng
    (round-1 verdict item 9: the native path previously consumed the
    unseeded global random module)."""
    path, _ = dataset_path

    def load(seed):
        nd = native_loader.NativeDataset(path)
        before_train = len(nd.splits["train"])
        before_test = len(nd.splits["test"])
        nd.move_k_examples_to_train_and_dev(2, random.Random(seed),
                                            split="test")
        assert len(nd.splits["train"]) == before_train + 2
        assert len(nd.splits["test"]) == before_test - 2
        return (nd.splits["train"].offsets.tolist(),
                nd.splits["test"].offsets.tolist())

    assert load(7) == load(7)
    assert load(7) != load(8)

@pytest.mark.parametrize("payload", [
    # truncated mid-example
    '{"grid_size": 6, "examples": {"train": [{"command": "walk',
    # agent position outside the grid
    '{"grid_size": 6, "examples": {"train": [{"command": "walk,walk", '
    '"derivation": "d", "target_commands": "walk", "situation": '
    '{"grid_size": 6, "agent_position": {"row": 99, "column": 0}, '
    '"agent_direction": 0, "target_object": null, "placed_objects": '
    '{"0": {"vector": "10000000000", "position": {"row": 1, "column": 1}}}'
    '}}]}}',
    # agent direction out of range
    '{"grid_size": 6, "examples": {"train": [{"command": "walk,walk", '
    '"derivation": "d", "target_commands": "walk", "situation": '
    '{"grid_size": 6, "agent_position": {"row": 0, "column": 0}, '
    '"agent_direction": 7, "target_object": null, "placed_objects": '
    '{"0": {"vector": "10000000000", "position": {"row": 1, "column": 1}}}'
    '}}]}}',
    # object placed outside the grid
    '{"grid_size": 6, "examples": {"train": [{"command": "walk,walk", '
    '"derivation": "d", "target_commands": "walk", "situation": '
    '{"grid_size": 6, "agent_position": {"row": 0, "column": 0}, '
    '"agent_direction": 0, "target_object": null, "placed_objects": '
    '{"0": {"vector": "10000000000", "position": {"row": 1, "column": 44}}}'
    '}}]}}',
])
def test_native_loader_rejects_corrupt_files(tmp_path, payload):
    """Corrupt / truncated / out-of-bounds dataset.txt must raise a clean
    ValueError, never write out of bounds (round-1 advisor, medium)."""
    path = tmp_path / "dataset.txt"
    path.write_text(payload)
    with pytest.raises(ValueError, match="native loader failed"):
        native_loader.NativeDataset(str(path))
