"""The committed bench fixture (data/bench_fixture) must be self-consistent:
its dev examples load through the real data pipeline, its vocab files pair
with its checkpoint, and the trained model actually decodes the subset well
(the round-2 model's dev exact match is ~97%, so a sharp drop means the
fixture's vocab/checkpoint went out of sync)."""

import os

import jax
import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "data",
                       "bench_fixture")


@pytest.mark.skipif(
    not os.path.isfile(os.path.join(FIXTURE, "dataset.txt")),
    reason="bench fixture not built")
def test_bench_fixture_checkpoint_decodes_dev_subset():
    from multimodal_seq2seq_gscan_tpu.data.dataset import GroundedScanDataset
    from multimodal_seq2seq_gscan_tpu.decode.greedy import (
        make_greedy_decoder, strip_output_sequences)
    from multimodal_seq2seq_gscan_tpu.models import ModelConfig
    from multimodal_seq2seq_gscan_tpu.train import checkpoint as ckpt
    from multimodal_seq2seq_gscan_tpu.train.state import (
        create_train_state, make_optimizer)

    dataset = GroundedScanDataset(
        os.path.join(FIXTURE, "dataset.txt"), FIXTURE, k=0, split="dev",
        input_vocabulary_file="training_input_vocab.txt",
        target_vocabulary_file="training_target_vocab.txt",
        generate_vocabulary=False)
    dataset.read_dataset(max_examples=256)
    assert dataset.num_examples == 256

    config = ModelConfig(
        input_vocabulary_size=dataset.input_vocabulary_size,
        target_vocabulary_size=dataset.target_vocabulary_size,
        num_cnn_channels=dataset.image_channels, embedding_dimension=25,
        encoder_hidden_size=100, decoder_hidden_size=100, cnn_kernel_size=7,
        cnn_hidden_num_channels=50, auxiliary_task=False)
    template = create_train_state(jax.random.PRNGKey(0), config,
                                  make_optimizer())
    state, meta = ckpt.load_checkpoint(
        os.path.join(FIXTURE, "model_best.msgpack"), template)
    assert meta.get("best_exact_match", 0) > 90

    decoder = make_greedy_decoder(config, max_decoding_steps=120,
                                  early_exit=True)
    batch, idx, _, _ = next(dataset.get_data_iterator(
        batch_size=256, pad_to_full_batch=True, with_representations=False))
    out = decoder(state.params, batch.input_ids, batch.input_lengths,
                  batch.situations, batch.target_positions)
    sequences, _ = strip_output_sequences(out, config.target_eos_idx)
    matched = sum(
        seq == dataset._target_ids[int(i)][1:-1].tolist()
        for seq, i in zip(sequences, idx))
    exact_match = 100.0 * matched / len(idx)
    assert exact_match > 85.0, (
        "fixture checkpoint only gets {:.1f}% EM on its own dev subset — "
        "vocab/checkpoint out of sync?".format(exact_match))


@pytest.mark.skipif(
    not os.path.isfile(os.path.join(FIXTURE, "dataset.txt")),
    reason="bench fixture not built")
def test_bf16_decode_matches_f32_on_trained_model():
    """The opt-in bf16 decode loop (compute_dtype="bfloat16") must emit the
    same token sequences as the default f32 path on a TRAINED model + real
    data. A trained model's logits are well-separated, so argmax should be
    insensitive to bf16 rounding; disagreement means the cast leaked into
    something it shouldn't have (masks, done flags, token carries)."""
    from multimodal_seq2seq_gscan_tpu.data.dataset import GroundedScanDataset
    from multimodal_seq2seq_gscan_tpu.decode.greedy import (
        make_greedy_decoder, strip_output_sequences)
    from multimodal_seq2seq_gscan_tpu.models import ModelConfig
    from multimodal_seq2seq_gscan_tpu.train import checkpoint as ckpt
    from multimodal_seq2seq_gscan_tpu.train.state import (
        create_train_state, make_optimizer)

    dataset = GroundedScanDataset(
        os.path.join(FIXTURE, "dataset.txt"), FIXTURE, k=0, split="dev",
        input_vocabulary_file="training_input_vocab.txt",
        target_vocabulary_file="training_target_vocab.txt",
        generate_vocabulary=False)
    dataset.read_dataset(max_examples=64)
    config = ModelConfig(
        input_vocabulary_size=dataset.input_vocabulary_size,
        target_vocabulary_size=dataset.target_vocabulary_size,
        num_cnn_channels=dataset.image_channels, embedding_dimension=25,
        encoder_hidden_size=100, decoder_hidden_size=100, cnn_kernel_size=7,
        cnn_hidden_num_channels=50, auxiliary_task=False)
    template = create_train_state(jax.random.PRNGKey(0), config,
                                  make_optimizer())
    state, _ = ckpt.load_checkpoint(
        os.path.join(FIXTURE, "model_best.msgpack"), template)

    f32 = make_greedy_decoder(config, max_decoding_steps=120, early_exit=True)
    bf16 = make_greedy_decoder(config, max_decoding_steps=120,
                               early_exit=True, compute_dtype="bfloat16")
    batch, idx, _, _ = next(dataset.get_data_iterator(
        batch_size=64, pad_to_full_batch=True, with_representations=False))
    args = (batch.input_ids, batch.input_lengths, batch.situations,
            batch.target_positions)
    out32 = f32(state.params, *args)
    out16 = bf16(state.params, *args)
    assert out16.attention_commands.dtype == np.float32
    seqs32, _ = strip_output_sequences(out32, config.target_eos_idx)
    seqs16, _ = strip_output_sequences(out16, config.target_eos_idx)
    disagree = sum(a != b for a, b in zip(seqs32, seqs16))
    assert disagree <= 1, (
        "{} / {} sequences differ between f32 and bf16 decode".format(
            disagree, len(seqs32)))

    # The mixed variant (bf16 loop, f32 output head) must be sequence-
    # IDENTICAL: the pure-bf16 disagreements come from argmax near-ties in
    # 8-mantissa-bit logits, which the f32 head removes (CPU check on 512
    # fixture examples: bf16 flips 1, mixed flips 0).
    for dtype in ("bfloat16_mixed", "bfloat16_keys"):
        variant = make_greedy_decoder(config, max_decoding_steps=120,
                                      early_exit=True, compute_dtype=dtype)
        outm = variant(state.params, *args)
        assert outm.attention_commands.dtype == np.float32
        seqsm, _ = strip_output_sequences(outm, config.target_eos_idx)
        disagree_m = sum(a != b for a, b in zip(seqs32, seqsm))
        assert disagree_m == 0, (
            "{} / {} sequences differ between f32 and {} decode"
            .format(disagree_m, len(seqs32), dtype))


def test_chained_decoder_attention_buffers_survive_dce():
    """Round-4 advisor finding (high): the bench chain's scan carry read
    only the token buffer, so XLA dead-coded the [B, S, M] attention stacks
    out of the whole chain (0 occurrences in the optimized HLO) — every
    chained number was measured without the buffer traffic the methodology
    note promises. The fixed chain folds one element of each attention
    stack into the next iteration's input and returns all three buffers;
    this asserts they survive DCE in the OPTIMIZED HLO."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench
    from multimodal_seq2seq_gscan_tpu.decode.greedy import make_greedy_decoder
    from multimodal_seq2seq_gscan_tpu.models import (
        ModelConfig, init_model_params)

    grid, channels, t_in, b = 4, 8, 6, 8
    config = ModelConfig(
        input_vocabulary_size=12, target_vocabulary_size=8,
        num_cnn_channels=channels, embedding_dimension=10,
        encoder_hidden_size=12, decoder_hidden_size=12, cnn_kernel_size=3,
        cnn_hidden_num_channels=6, auxiliary_task=False)
    params = init_model_params(jax.random.PRNGKey(0), config)
    rng = np.random.RandomState(0)
    args = (rng.randint(3, 12, size=(b, t_in)).astype(np.int32),
            np.full((b,), t_in, np.int32),
            (rng.rand(b, grid, grid, channels) < 0.2).astype(np.float32),
            np.zeros((b,), np.int32))
    decoder = make_greedy_decoder(config, max_decoding_steps=12,
                                  early_exit=True, exit_check_every=4)
    chained = bench.make_chained_decoder(decoder, 3)
    txt = chained.lower(params, *args).compile().as_text()
    s, m_t, m_v = 13, t_in, grid * grid
    for pattern in ("f32[{},{},{}]".format(b, s, m_t),
                    "f32[{},{},{}]".format(b, s, m_v)):
        count = txt.count(pattern)
        assert count >= 8, (
            "attention buffer {} appears only {}x in the optimized HLO — "
            "XLA dead-coded the attention stacks out of the chain again"
            .format(pattern, count))
    # and the chain still computes the same tokens as the plain decoder
    out = decoder(params, *args)
    toks, _, _ = chained(params, *args)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(out.tokens))


def _run_bench(tmp_env):
    import subprocess
    import sys
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(GSCAN_JAX_PLATFORM="cpu", BENCH_BATCH_SIZE="64",
               BENCH_MAX_EXAMPLES="64", BENCH_CHAIN="3", **tmp_env)
    repo = os.path.join(os.path.dirname(__file__), "..")
    proc = subprocess.run([sys.executable, "bench.py"], cwd=repo, env=env,
                          capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-2000:]
    import json
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    if not line["metric"].endswith(("_wedged", "_synthetic")):
        # The shipped headline is the EM-neutral bfloat16_keys decode
        # (round-5 decision, documentation/perf_round5.txt) — guard against
        # the headline dtype silently drifting back.
        assert "[xla/bfloat16_keys]" in proc.stderr and \
            "(headline)" in proc.stderr, proc.stderr[-2000:]
    return line


def test_bench_deadline_mid_run_still_emits_headline():
    """A tunnel wedge mid-measurement (simulated by a 25 s deadline on CPU,
    which lands after the early-exit variant is timed but before the rest
    finish) must emit the measured headline, not rc=124 with no JSON —
    round 3 lost its whole driver bench slot to exactly that."""
    line = _run_bench({"BENCH_DEADLINE_S": "25"})
    assert line["unit"] == "examples/s"
    assert line["metric"].startswith("greedy_decode_throughput")
    # Either the headline was measured in time (value > 0) or the run
    # wedged before any measurement (explicit *_wedged marker, value 0).
    if line["metric"].endswith("_wedged"):
        assert line["value"] == 0.0
    else:
        assert line["value"] > 0


def test_bench_deadline_immediate_wedge_marker():
    line = _run_bench({"BENCH_DEADLINE_S": "2"})
    assert line["metric"].endswith(("_wedged", "_synthetic")) or \
        line["value"] > 0
