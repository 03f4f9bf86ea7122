"""Golden test for the dense situation grid encoding.

Pins the canonical [grid, grid, D+5] tensor layout (mirrors reference
GroundedScan/dataset_test.py:666-693) and verifies the vectorized fast path
equals the world-simulated encoding.
"""

import numpy as np
import pytest

from multimodal_seq2seq_gscan_tpu.gscan import (
    GroundedScan, INT_TO_DIR, Object, Position, PositionedObject, Situation,
    encode_situation_from_representation)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    save_dir = str(tmp_path_factory.mktemp("gscan_enc"))
    return GroundedScan(
        intransitive_verbs=["walk"], transitive_verbs=["push", "pull"],
        adverbs=["cautiously"], nouns=["circle", "cylinder", "square"],
        color_adjectives=["red", "blue", "green", "yellow"],
        size_adjectives=["big", "small"], percentage_train=0.8,
        min_object_size=1, max_object_size=4, sample_vocabulary="default",
        save_directory=save_dir, grid_size=15, type_grammar="adverb")


def _test_situation(dataset):
    ov = dataset._object_vocabulary
    return Situation(
        grid_size=15, agent_position=Position(row=7, column=2),
        agent_direction=INT_TO_DIR[0],
        target_object=PositionedObject(
            object=Object(size=2, color="red", shape="circle"),
            position=Position(row=10, column=4),
            vector=ov.get_object_vector("circle", "red", 2)),
        placed_objects=[
            PositionedObject(object=Object(size=2, color="red", shape="circle"),
                             position=Position(row=10, column=4),
                             vector=ov.get_object_vector("circle", "red", 2)),
            PositionedObject(object=Object(size=4, color="green", shape="circle"),
                             position=Position(row=3, column=12),
                             vector=ov.get_object_vector("circle", "green", 4))],
        carrying=None)


def test_encode_situation_golden(dataset):
    """Hand-built expected grid == world encoding (reference golden test)."""
    situation = _test_situation(dataset)
    dataset._world.clear_situation()
    dataset.initialize_world(situation)
    ov = dataset._object_vocabulary
    num_attrs = ov.num_object_attributes

    expected = np.zeros([15, 15, num_attrs + 1 + 4], dtype="uint8")
    expected[7, 2, -5] = 1
    expected[7, 2, -4:] = np.array([1, 0, 0, 0])
    expected[10, 4, :-5] = ov.get_object_vector(shape="circle", color="red",
                                                size=2)
    expected[3, 12, :-5] = ov.get_object_vector(shape="circle", color="green",
                                                size=4)
    encoded = dataset._world.get_current_situation_grid_repr()
    assert np.array_equal(expected, encoded)


def test_vectorized_encoding_equals_world_encoding(dataset):
    """The fast sparse->dense path must equal the world-simulated encoding."""
    situation = _test_situation(dataset)
    dataset._world.clear_situation()
    dataset.initialize_world(situation)
    world_grid = dataset._world.get_current_situation_grid_repr()
    fast_grid = encode_situation_from_representation(
        situation.to_representation(), grid_size=15)
    assert np.array_equal(world_grid, fast_grid)


def test_vectorized_encoding_agent_on_object(dataset):
    """An object sharing the agent's cell keeps its attribute bits."""
    ov = dataset._object_vocabulary
    situation = Situation(
        grid_size=6, agent_position=Position(row=2, column=3),
        agent_direction=INT_TO_DIR[2],
        target_object=PositionedObject(
            object=Object(size=2, color="red", shape="circle"),
            position=Position(row=4, column=1),
            vector=ov.get_object_vector("circle", "red", 2)),
        placed_objects=[
            PositionedObject(object=Object(size=2, color="red", shape="circle"),
                             position=Position(row=4, column=1),
                             vector=ov.get_object_vector("circle", "red", 2)),
            PositionedObject(object=Object(size=1, color="blue", shape="square"),
                             position=Position(row=2, column=3),
                             vector=ov.get_object_vector("square", "blue", 1))],
        carrying=None)
    grid = encode_situation_from_representation(situation.to_representation(),
                                                grid_size=6)
    num_attrs = ov.num_object_attributes
    assert np.array_equal(grid[2, 3, :num_attrs],
                          ov.get_object_vector("square", "blue", 1))
    assert grid[2, 3, num_attrs] == 1
    assert grid[2, 3, num_attrs + 1 + 2] == 1

    dataset._world.clear_situation()
    world = dataset._world
    grid_size_backup = world.grid_size
    world.grid_size = 6
    try:
        dataset.initialize_world(situation)
        assert np.array_equal(world.get_current_situation_grid_repr(), grid)
    finally:
        world.grid_size = grid_size_backup
        world.clear_situation()


def test_dataset_save_load_roundtrip(dataset, tmp_path):
    """Generated examples survive a save/load cycle with identical tensors."""
    dataset.get_data_pairs(max_examples=50)
    dataset.save_directory = str(tmp_path)
    path = dataset.save_dataset("test.txt")
    loaded = GroundedScan.load_dataset_from_file(path, str(tmp_path))
    n_checked = 0
    for ex1, ex2 in zip(dataset.get_examples_with_image("train", True),
                        loaded.get_examples_with_image("train", True)):
        assert ex1["input_command"] == ex2["input_command"]
        assert ex1["target_command"] == ex2["target_command"]
        assert np.array_equal(ex1["situation_image"], ex2["situation_image"])
        assert ex1["input_meaning"] == ex2["input_meaning"]
        n_checked += 1
    assert n_checked > 0
