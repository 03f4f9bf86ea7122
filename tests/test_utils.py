"""Unit tests for host-side scoring and the renderer."""

import numpy as np

from multimodal_seq2seq_gscan_tpu.analysis.render import render_situation
from multimodal_seq2seq_gscan_tpu.gscan.types import (
    INT_TO_DIR, Object, Position, PositionedObject, Situation)
from multimodal_seq2seq_gscan_tpu.utils.metrics import sequence_accuracy


def test_sequence_accuracy_exact():
    assert sequence_accuracy([4, 5, 6], [4, 5, 6]) == 100.0


def test_sequence_accuracy_short_prediction_padded_with_zero():
    # prediction [4] vs target [4, 0]: padded pred [4, 0] -> both match!
    assert sequence_accuracy([4], [4, 0]) == 100.0
    # but vs non-zero target the padding is wrong
    assert sequence_accuracy([4], [4, 5]) == 50.0


def test_sequence_accuracy_long_prediction_counts_against():
    # target padded with -1 -> extra predictions always wrong
    assert sequence_accuracy([4, 5, 6, 7], [4, 5]) == 50.0


def test_sequence_accuracy_empty():
    assert sequence_accuracy([], []) == 0.0


def test_render_situation_shapes_and_agent():
    ov_vec = np.array([1, 0, 1])
    situation = Situation(
        grid_size=4, agent_position=Position(row=1, column=2),
        agent_direction=INT_TO_DIR[1],
        target_object=PositionedObject(
            object=Object(size=3, color="red", shape="circle"),
            position=Position(row=0, column=0), vector=ov_vec),
        placed_objects=[
            PositionedObject(object=Object(size=3, color="red", shape="circle"),
                             position=Position(row=0, column=0), vector=ov_vec),
            PositionedObject(object=Object(size=2, color="blue",
                                           shape="square"),
                             position=Position(row=3, column=3),
                             vector=ov_vec),
            PositionedObject(object=Object(size=4, color="green",
                                           shape="cylinder"),
                             position=Position(row=2, column=1),
                             vector=ov_vec)],
        carrying=None)
    image = render_situation(situation)
    assert image.shape == (240, 240, 3)
    # Red circle pixels near cell (0,0) center.
    assert (image[20:40, 20:40] == np.array([128, 0, 0])).all(axis=-1).any()
    # Agent (pink) around cell (row 1, col 2).
    assert (image[60:120, 120:180] == np.array([255, 192, 203])).all(
        axis=-1).any()
    # Attention shading darkens unattended cells.
    attention = np.zeros(16)
    attention[0] = 1.0
    shaded = render_situation(situation, attention_weights=attention)
    assert shaded.shape == (240, 240, 3)
    assert shaded.mean() < image.mean()
