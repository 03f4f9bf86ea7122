"""Multi-seed vmapped campaign training (train/multiseed.py): the stacked
chunk must match per-seed single chunks numerically, and a CLI campaign run
must produce per-seed checkpoints identical (to float-association noise) to
individually-trained runs with the same --seed.
"""

import logging
import os

import jax
import numpy as np
import pytest

from multimodal_seq2seq_gscan_tpu.train.multiseed import (
    make_multiseed_train_chunk, slice_train_state, stack_train_states)
from multimodal_seq2seq_gscan_tpu.train.resident import (
    ResidentData, index_block_stream, make_train_chunk)
from multimodal_seq2seq_gscan_tpu.train.state import (
    create_train_state, make_optimizer)

from tests.test_resident import _toy_problem


def test_multiseed_chunk_matches_per_seed_chunks():
    config, host = _toy_problem()
    optimizer = make_optimizer()
    k, batch, seeds = 3, 8, (7, 8)
    data = ResidentData(*(jax.device_put(a) for a in host))
    blocks = np.stack([
        next(index_block_stream(host.num_examples, batch, k,
                                np.random.default_rng(s)))
        for s in seeds])

    multi = make_multiseed_train_chunk(config, optimizer, donate=False)
    states = [create_train_state(jax.random.PRNGKey(s), config, optimizer)
              for s in seeds]
    stacked = stack_train_states(states)
    stacked, metrics = multi(stacked, data, blocks)
    assert metrics["loss"].shape == (len(seeds), k)

    single = make_train_chunk(config, optimizer, donate=False)
    for i, s in enumerate(seeds):
        state_s, metrics_s = single(states[i], data, blocks[i])
        np.testing.assert_allclose(np.asarray(metrics["loss"][i]),
                                   np.asarray(metrics_s["loss"]), rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
            slice_train_state(stacked, i).params, state_s.params)


def test_multiseed_chunk_with_segments():
    """The stratified (segmented) chunk under vmap: same static spec across
    seeds, per-seed index blocks laid out for it."""
    from multimodal_seq2seq_gscan_tpu.train.resident import (
        stratified_index_block_stream)

    config, host = _toy_problem()
    config = config._replace(auxiliary_task=False)
    optimizer = make_optimizer()
    k, batch, seeds = 2, 8, (3, 4)
    data = ResidentData(*(jax.device_put(a) for a in host))
    cut = int(np.median(host.target_lengths))
    pairs = [next(stratified_index_block_stream(
        host.target_lengths, batch, k, np.random.default_rng(s),
        cuts=(cut,))) for s in seeds]
    spec = pairs[0][1]
    assert all(p[1] == spec for p in pairs)
    blocks = np.stack([p[0] for p in pairs])

    multi = make_multiseed_train_chunk(config, optimizer, donate=False)
    states = [create_train_state(jax.random.PRNGKey(s), config, optimizer)
              for s in seeds]
    stacked, metrics = multi(stack_train_states(states), data, blocks, spec)
    assert metrics["loss"].shape == (len(seeds), k)

    single = make_train_chunk(config, optimizer, donate=False)
    for i in range(len(seeds)):
        _, metrics_s = single(states[i], data, blocks[i], spec)
        np.testing.assert_allclose(np.asarray(metrics["loss"][i]),
                                   np.asarray(metrics_s["loss"]), rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_dataset_dir(tmp_path_factory):
    import random

    from multimodal_seq2seq_gscan_tpu.gscan import GroundedScan

    directory = str(tmp_path_factory.mktemp("tiny_gscan_ms"))
    random.seed(11)
    np.random.seed(11)
    dataset = GroundedScan(
        intransitive_verbs=["walk"], transitive_verbs=["push"],
        adverbs=[], nouns=["circle", "square"],
        color_adjectives=["red", "green"], size_adjectives=["big", "small"],
        percentage_train=0.8, min_object_size=1, max_object_size=4,
        sample_vocabulary="default", save_directory=directory, grid_size=6,
        type_grammar="normal")
    dataset.get_data_pairs(max_examples=300, num_resampling=1,
                           split_type="uniform", make_dev_set=True)
    dataset.save_dataset("dataset.txt")
    return directory


def _train_flags(data_dir, out_dir, **overrides):
    from multimodal_seq2seq_gscan_tpu.cli import seq2seq as cli

    flags = {a.dest: a.default for a in cli.build_parser()._actions
             if a.dest != "help"}
    flags.update(
        mode="train", data_directory=data_dir, output_directory=out_dir,
        generate_vocabularies=True, max_training_iterations=6,
        training_batch_size=16, test_batch_size=16, print_every=3,
        evaluate_every=3, steps_per_execution=4, max_decoding_steps=20,
        embedding_dimension=12, encoder_hidden_size=16,
        decoder_hidden_size=16, cnn_kernel_size=3,
        cnn_hidden_num_channels=8, max_testing_examples=32,
        compilation_cache_dir="")
    flags.update(overrides)
    return flags


def test_cli_multiseed_matches_individual_runs(tiny_dataset_dir, tmp_path,
                                               caplog):
    """--seeds=7,8 must write per-seed best checkpoints whose parameters and
    dev metrics match individually-trained --seed=7 / --seed=8 runs (same
    init, same per-seed data order; vmap only changes float association)."""
    from multimodal_seq2seq_gscan_tpu.cli import seq2seq as cli
    from multimodal_seq2seq_gscan_tpu.train import checkpoint as ckpt
    from multimodal_seq2seq_gscan_tpu.train.state import create_train_state
    from multimodal_seq2seq_gscan_tpu.models import ModelConfig

    campaign = str(tmp_path / "campaign")
    with caplog.at_level(logging.INFO):
        cli.main(_train_flags(tiny_dataset_dir, campaign, seeds="7,8"))
    assert "[seed 7]" in caplog.text and "[seed 8]" in caplog.text

    singles = {}
    for s in (7, 8):
        out = str(tmp_path / "single_{}".format(s))
        cli.main(_train_flags(tiny_dataset_dir, out, seed=s,
                              generate_vocabularies=False))
        singles[s] = out

    from multimodal_seq2seq_gscan_tpu.data.dataset import GroundedScanDataset

    probe_set = GroundedScanDataset(
        os.path.join(tiny_dataset_dir, "dataset.txt"), tiny_dataset_dir,
        k=0, split="dev", input_vocabulary_file="training_input_vocab.txt",
        target_vocabulary_file="training_target_vocab.txt",
        generate_vocabulary=False)
    probe_set.read_dataset(max_examples=4)
    config = ModelConfig(
        input_vocabulary_size=probe_set.input_vocabulary_size,
        target_vocabulary_size=probe_set.target_vocabulary_size,
        num_cnn_channels=probe_set.image_channels, embedding_dimension=12,
        encoder_hidden_size=16, decoder_hidden_size=16,
        cnn_kernel_size=3, cnn_hidden_num_channels=8)
    template = create_train_state(jax.random.PRNGKey(0), config,
                                  make_optimizer())

    for s in (7, 8):
        ms_path = os.path.join(campaign, "seed_{}".format(s),
                               ckpt.CHECKPOINT_FILE)
        ss_path = os.path.join(singles[s], ckpt.CHECKPOINT_FILE)
        assert os.path.exists(ms_path) and os.path.exists(ss_path)
        ms_state, ms_meta = ckpt.load_checkpoint(ms_path, template)
        ss_state, ss_meta = ckpt.load_checkpoint(ss_path, template)
        assert ms_meta["iteration"] == ss_meta["iteration"]
        np.testing.assert_allclose(
            ms_meta["best_exact_match"], ss_meta["best_exact_match"],
            atol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5),
            ms_state.params, ss_state.params)


def test_cli_multiseed_resume_matches_uninterrupted(tiny_dataset_dir,
                                                    tmp_path):
    """A campaign killed after the eval-boundary checkpoint and relaunched
    with --resume_from_file=<campaign dir> must end in the same state as an
    uninterrupted run: per-seed params, meta, and best-checkpoint tracking
    all match (same restored states, same replayed permutation streams)."""
    from multimodal_seq2seq_gscan_tpu.cli import seq2seq as cli
    from multimodal_seq2seq_gscan_tpu.models import ModelConfig
    from multimodal_seq2seq_gscan_tpu.data.dataset import GroundedScanDataset
    from multimodal_seq2seq_gscan_tpu.train import checkpoint as ckpt
    from multimodal_seq2seq_gscan_tpu.train.state import create_train_state

    full = str(tmp_path / "full")
    cli.main(_train_flags(tiny_dataset_dir, full, seeds="7,8",
                          max_training_iterations=6))

    resumed = str(tmp_path / "resumed")
    cli.main(_train_flags(tiny_dataset_dir, resumed, seeds="7,8",
                          max_training_iterations=3,
                          generate_vocabularies=False))
    cli.main(_train_flags(tiny_dataset_dir, resumed, seeds="7,8",
                          max_training_iterations=6,
                          resume_from_file=resumed,
                          generate_vocabularies=False))

    probe_set = GroundedScanDataset(
        os.path.join(tiny_dataset_dir, "dataset.txt"), tiny_dataset_dir,
        k=0, split="dev", input_vocabulary_file="training_input_vocab.txt",
        target_vocabulary_file="training_target_vocab.txt",
        generate_vocabulary=False)
    probe_set.read_dataset(max_examples=4)
    config = ModelConfig(
        input_vocabulary_size=probe_set.input_vocabulary_size,
        target_vocabulary_size=probe_set.target_vocabulary_size,
        num_cnn_channels=probe_set.image_channels, embedding_dimension=12,
        encoder_hidden_size=16, decoder_hidden_size=16,
        cnn_kernel_size=3, cnn_hidden_num_channels=8)
    template = create_train_state(jax.random.PRNGKey(0), config,
                                  make_optimizer())

    for s in (7, 8):
        for fname in (ckpt.CHECKPOINT_FILE, ckpt.BEST_CHECKPOINT_FILE):
            f_path = os.path.join(full, "seed_{}".format(s), fname)
            r_path = os.path.join(resumed, "seed_{}".format(s), fname)
            # model_best only exists once dev EM improves over 0; whether it
            # does must at least agree between the two runs.
            assert os.path.exists(f_path) == os.path.exists(r_path)
            if not os.path.exists(f_path):
                continue
            f_state, f_meta = ckpt.load_checkpoint(f_path, template)
            r_state, r_meta = ckpt.load_checkpoint(r_path, template)
            assert f_meta == r_meta, (s, fname, f_meta, r_meta)
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
                f_state.params, r_state.params)


def test_multiseed_resume_rejects_off_grid_checkpoints(tmp_path):
    """Resume refuses checkpoints that are off the chunk grid or at
    mismatched per-seed iterations instead of silently replaying wrong
    data order."""
    from multimodal_seq2seq_gscan_tpu.train import checkpoint as ckpt
    from multimodal_seq2seq_gscan_tpu.train.multiseed import (
        load_campaign_checkpoints)

    config, _ = _toy_problem()
    optimizer = make_optimizer()
    seeds = (7, 8)
    seed_dirs = [str(tmp_path / "seed_{}".format(s)) for s in seeds]
    states = [create_train_state(jax.random.PRNGKey(s), config, optimizer)
              for s in seeds]

    def save(steps):
        for state, step, d in zip(states, steps, seed_dirs):
            ckpt.save_checkpoint(
                d, state._replace(step=jax.numpy.asarray(step)),
                best_iteration=2, best_accuracy=50.0, best_exact_match=25.0)

    save((3, 5))  # mismatched per-seed iterations
    with pytest.raises(ValueError, match="different iterations"):
        load_campaign_checkpoints(seed_dirs, states, k=2)

    save((3, 3))  # aligned, but off the 2-step chunk grid
    with pytest.raises(ValueError, match="chunk grid"):
        load_campaign_checkpoints(seed_dirs, states, k=2)

    save((4, 4))  # valid: best bookkeeping must round-trip
    loaded, best, done = load_campaign_checkpoints(seed_dirs, states, k=2)
    assert done == 4
    assert best == [{"iteration": 2, "accuracy": 50.0, "exact_match": 25.0}
                    ] * 2
    for st in loaded:
        assert int(st.step) == 4
