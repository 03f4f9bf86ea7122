"""Early-exit (while_loop) greedy decode must equal the full scan decode."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_seq2seq_gscan_tpu.decode.greedy import (
    make_greedy_decoder, strip_output_sequences)
from multimodal_seq2seq_gscan_tpu.models import ModelConfig, init_model_params


def _random_batch(rng, batch, t_in, grid, channels, vocab):
    input_lengths = rng.randint(3, t_in + 1, size=batch).astype(np.int32)
    input_ids = np.zeros((batch, t_in), dtype=np.int32)
    for i in range(batch):
        input_ids[i, 0] = 1
        input_ids[i, 1:input_lengths[i] - 1] = rng.randint(
            3, vocab, size=input_lengths[i] - 2)
        input_ids[i, input_lengths[i] - 1] = 2
    situations = rng.rand(batch, grid, grid, channels).astype(np.float32)
    return input_ids, input_lengths, situations


def test_early_exit_equals_full_scan():
    config = ModelConfig(input_vocabulary_size=12, target_vocabulary_size=9,
                         num_cnn_channels=8, embedding_dimension=8,
                         encoder_hidden_size=12, decoder_hidden_size=12,
                         cnn_kernel_size=3, cnn_hidden_num_channels=6)
    params = init_model_params(jax.random.PRNGKey(2), config)
    rng = np.random.RandomState(0)
    input_ids, input_lengths, situations = _random_batch(
        rng, batch=7, t_in=8, grid=5, channels=8, vocab=12)
    target_positions = np.zeros((7,), np.int32)

    fast = make_greedy_decoder(config, max_decoding_steps=20, early_exit=True)
    slow = make_greedy_decoder(config, max_decoding_steps=20, early_exit=False)
    out_fast = fast(params, jnp.asarray(input_ids), jnp.asarray(input_lengths),
                    jnp.asarray(situations), jnp.asarray(target_positions))
    out_slow = slow(params, jnp.asarray(input_ids), jnp.asarray(input_lengths),
                    jnp.asarray(situations), jnp.asarray(target_positions))

    seq_fast, kept_fast = strip_output_sequences(out_fast, 2)
    seq_slow, kept_slow = strip_output_sequences(out_slow, 2)
    assert seq_fast == seq_slow
    assert kept_fast == kept_slow
    np.testing.assert_array_equal(np.asarray(out_fast.lengths),
                                  np.asarray(out_slow.lengths))
    # Attention stacks agree on every emitted step.
    emitted = np.asarray(out_slow.emitted_mask)
    for i in range(7):
        n = int(out_slow.lengths[i])
        np.testing.assert_allclose(
            np.asarray(out_fast.attention_situations[i, :n]),
            np.asarray(out_slow.attention_situations[i, :n]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out_fast.attention_commands[i, :n]),
            np.asarray(out_slow.attention_commands[i, :n]), atol=1e-6)
    np.testing.assert_array_equal(emitted, np.asarray(out_fast.emitted_mask))


def test_blocked_early_exit_equals_full_scan_all_block_sizes():
    """The hierarchical done-check (exit_check_every=K) must be exact for
    every K, including K=1 (the old per-step check), K not dividing
    num_steps (padding in the final block), and K > num_steps (clamped)."""
    config = ModelConfig(input_vocabulary_size=12, target_vocabulary_size=9,
                         num_cnn_channels=8, embedding_dimension=8,
                         encoder_hidden_size=12, decoder_hidden_size=12,
                         cnn_kernel_size=3, cnn_hidden_num_channels=6)
    params = init_model_params(jax.random.PRNGKey(4), config)
    rng = np.random.RandomState(3)
    input_ids, input_lengths, situations = _random_batch(
        rng, batch=9, t_in=8, grid=5, channels=8, vocab=12)
    target_positions = np.zeros((9,), np.int32)
    args = (params, jnp.asarray(input_ids), jnp.asarray(input_lengths),
            jnp.asarray(situations), jnp.asarray(target_positions))

    # max_decoding_steps=20 -> num_steps=21 (odd, exercises padding).
    slow = make_greedy_decoder(config, max_decoding_steps=20,
                               early_exit=False)
    out_slow = slow(*args)
    seq_slow, kept_slow = strip_output_sequences(out_slow, 2)
    for k in (1, 4, 7, 8, 64):
        fast = make_greedy_decoder(config, max_decoding_steps=20,
                                   early_exit=True, exit_check_every=k)
        out_fast = fast(*args)
        seq_fast, kept_fast = strip_output_sequences(out_fast, 2)
        assert seq_fast == seq_slow, "K={}".format(k)
        assert kept_fast == kept_slow, "K={}".format(k)
        np.testing.assert_array_equal(np.asarray(out_fast.lengths),
                                      np.asarray(out_slow.lengths))
        np.testing.assert_array_equal(np.asarray(out_fast.emitted_mask),
                                      np.asarray(out_slow.emitted_mask))
        for i in range(9):
            n = int(out_slow.lengths[i])
            np.testing.assert_allclose(
                np.asarray(out_fast.attention_situations[i, :n]),
                np.asarray(out_slow.attention_situations[i, :n]), atol=1e-6)
