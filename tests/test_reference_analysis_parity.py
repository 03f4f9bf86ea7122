"""Golden parity with the ACTUAL reference analysis code (verdict item 8).

Runs the reference implementation of ``error_analysis`` (reference
GroundedScan/dataset.py:657-811) and ``position_analysis`` (dataset.py:813-874)
side by side with ours, on the SAME generated dataset.txt and the SAME
predict.json, and asserts:

  * the error-analysis .txt reports are byte-identical, and
  * the per-dimension workbook tables are cell-for-cell identical.

The reference needs ``xlwt``, ``gym`` and ``pronounceable``, none of which are
installed; they are satisfied with minimal in-test stubs.  The xlwt stub is
backed by our BIFF8 ``Workbook`` so both sides' .xls files can be decoded by
the same independent reader (tests/test_workbook.py).
"""

import json
import os
import random
import sys
import types

import numpy as np
import pytest

from multimodal_seq2seq_gscan_tpu.analysis import workbook as workbook_module
from multimodal_seq2seq_gscan_tpu.cli import gscan as gscan_cli
from multimodal_seq2seq_gscan_tpu.cli import seq2seq as seq2seq_cli
from multimodal_seq2seq_gscan_tpu.gscan.dataset import (
    GroundedScan as OurGroundedScan)

from tests.test_workbook import _read_xls

REFERENCE_ROOT = "/root/reference"


def _flags(parser, **overrides):
    flags = {a.dest: a.default for a in parser._actions if a.dest != "help"}
    flags.update(overrides)
    return flags


@pytest.fixture(scope="module")
def reference_gscan():
    """Import the reference GroundedScan with stubbed third-party deps."""
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "GroundedScan")):
        pytest.skip("reference checkout not available")

    xlwt = types.ModuleType("xlwt")
    xlwt.Workbook = workbook_module.Workbook

    gym = types.ModuleType("gym")

    class _Env(object):
        pass

    spaces = types.ModuleType("gym.spaces")
    spaces.Discrete = lambda n: None
    utils = types.ModuleType("gym.utils")
    seeding = types.ModuleType("gym.utils.seeding")
    seeding.np_random = lambda seed=None: (np.random.RandomState(seed), seed)
    utils.seeding = seeding
    gym.Env = _Env
    gym.spaces = spaces
    gym.utils = utils

    pronounceable = types.ModuleType("pronounceable")
    pronounceable.generate_word = lambda: "nonce"

    stubs = {"xlwt": xlwt, "gym": gym, "gym.spaces": spaces,
             "gym.utils": utils, "gym.utils.seeding": seeding,
             "pronounceable": pronounceable}
    saved = {name: sys.modules.get(name) for name in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from GroundedScan.dataset import GroundedScan
        yield GroundedScan
    finally:
        sys.path.remove(REFERENCE_ROOT)
        for name, module in saved.items():
            if module is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = module


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    """Tiny dataset + trained-for-a-few-steps predictions."""
    directory = str(tmp_path_factory.mktemp("parity"))
    random.seed(7)
    np.random.seed(7)
    gscan_cli.main(_flags(
        gscan_cli.build_parser(), mode="generate", output_directory=directory,
        split="uniform", grid_size=6, num_resampling=1, max_examples=250,
        intransitive_verbs="walk", transitive_verbs="push",
        adverbs="while spinning", nouns="circle,square",
        color_adjectives="red,green", size_adjectives="big,small",
        type_grammar="adverb", make_dev_set=True, visualize_per_template=0))
    seq2seq_cli.main(_flags(
        seq2seq_cli.build_parser(), mode="train", data_directory=directory,
        output_directory=directory, generate_vocabularies=True,
        input_vocab_path="input_vocab.txt",
        target_vocab_path="target_vocab.txt", training_batch_size=32,
        max_training_iterations=30, print_every=10, evaluate_every=20,
        max_decoding_steps=25, embedding_dimension=12, encoder_hidden_size=16,
        decoder_hidden_size=16, cnn_kernel_size=3, cnn_hidden_num_channels=8,
        max_testing_examples=50, test_batch_size=32, seed=3))
    seq2seq_cli.main(_flags(
        seq2seq_cli.build_parser(), mode="test", data_directory=directory,
        output_directory=directory, generate_vocabularies=False,
        input_vocab_path="input_vocab.txt",
        target_vocab_path="target_vocab.txt", splits="test",
        resume_from_file=os.path.join(directory, "checkpoint.msgpack"),
        max_decoding_steps=25, embedding_dimension=12, encoder_hidden_size=16,
        decoder_hidden_size=16, cnn_kernel_size=3, cnn_hidden_num_channels=8,
        test_batch_size=32, seed=3))
    predict_path = os.path.join(directory, "test_predict.json")
    assert os.path.exists(predict_path)
    with open(predict_path) as infile:
        records = json.load(infile)
    # Both analyses aggregate whatever score fields predict.json carries; a
    # deterministic mixture exercises every branch (a 30-iteration model would
    # otherwise produce all-False exact matches).
    for i, record in enumerate(records):
        record["exact_match"] = i % 3 == 0
        record["accuracy"] = (100.0 if record["exact_match"]
                              else round(37.5 + (i % 7) * 7.3, 2))
        record["position_accuracy"] = 100.0 if i % 2 == 0 else 60.0
    with open(predict_path, "w") as outfile:
        json.dump(records, outfile)
    return directory


def test_error_analysis_matches_reference(reference_gscan, fixture_dir,
                                          tmp_path):
    dataset_path = os.path.join(fixture_dir, "dataset.txt")
    predict_path = os.path.join(fixture_dir, "test_predict.json")
    ref_dir = str(tmp_path / "ref")
    our_dir = str(tmp_path / "ours")
    os.makedirs(ref_dir)
    os.makedirs(our_dir)

    ref_dataset = reference_gscan.load_dataset_from_file(dataset_path, ref_dir)
    ref_out = os.path.join(ref_dir, "error_analysis.txt")
    ref_dataset.error_analysis(predict_path, ref_out, ref_dir)

    our_dataset = OurGroundedScan.load_dataset_from_file(dataset_path, our_dir)
    our_out = os.path.join(our_dir, "error_analysis.txt")
    our_dataset.error_analysis(predict_path, our_out, our_dir)

    with open(ref_out) as f:
        ref_text = f.read()
    with open(our_out) as f:
        our_text = f.read()
    assert our_text == ref_text

    ref_names, ref_sheets = _read_xls(ref_out.replace(".txt", ".xls"))
    our_names, our_sheets = _read_xls(our_out.replace(".txt", ".xls"))
    assert our_names == ref_names
    assert len(our_sheets) == len(ref_sheets)
    for name, ours, refs in zip(ref_names, our_sheets, ref_sheets):
        assert ours == refs, "sheet {}".format(name)


def test_position_analysis_matches_reference(reference_gscan, fixture_dir,
                                             tmp_path):
    dataset_path = os.path.join(fixture_dir, "dataset.txt")
    # The reference derives the sheet name from the path's second component,
    # so hand it a relative path with a stable shape.
    cwd = os.getcwd()
    os.chdir(fixture_dir)
    try:
        predict_rel = os.path.join("analysis", "test_predict.json")
        os.makedirs("analysis", exist_ok=True)
        if not os.path.exists(predict_rel):
            os.link("test_predict.json", predict_rel)

        ref_dataset = reference_gscan.load_dataset_from_file(
            dataset_path, str(tmp_path))
        ref_workbook = workbook_module.Workbook()
        ref_dataset.position_analysis(predict_rel, workbook=ref_workbook)
        ref_path = str(tmp_path / "ref_position.xls")
        ref_workbook.save(ref_path)

        our_dataset = OurGroundedScan.load_dataset_from_file(
            dataset_path, str(tmp_path))
        our_workbook = workbook_module.Workbook()
        our_dataset.position_analysis(predict_rel, workbook=our_workbook)
        our_path = str(tmp_path / "our_position.xls")
        our_workbook.save(our_path)
    finally:
        os.chdir(cwd)

    _, ref_sheets = _read_xls(ref_path)
    _, our_sheets = _read_xls(our_path)
    assert len(ref_sheets) == 1 and len(our_sheets) == 1
    assert our_sheets[0] == ref_sheets[0]
