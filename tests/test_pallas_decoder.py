"""The fused Pallas decode block must reproduce the XLA greedy decode
token-for-token (interpret mode on CPU; compiled on TPU). Covers both the
early-exit and fixed-length integration paths and the emitted/attention
stacks consumed by predict.json."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_seq2seq_gscan_tpu.decode.greedy import make_greedy_decoder
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
    return (jnp.asarray(input_ids), jnp.asarray(input_lengths),
            jnp.asarray(situations))


@pytest.fixture(scope="module")
def setup():
    config = ModelConfig(input_vocabulary_size=12, target_vocabulary_size=9,
                         num_cnn_channels=8, embedding_dimension=8,
                         encoder_hidden_size=12, decoder_hidden_size=12,
                         cnn_kernel_size=3, cnn_hidden_num_channels=6)
    params = init_model_params(jax.random.PRNGKey(2), config)
    batch = _random_batch(np.random.RandomState(0), batch=7, t_in=8, grid=5,
                          channels=8, vocab=12)
    target_positions = jnp.zeros((7,), jnp.int32)
    return config, params, batch, target_positions


@pytest.mark.parametrize("early_exit", [True, False])
def test_pallas_decode_matches_xla(setup, early_exit):
    config, params, batch, target_positions = setup
    xla = make_greedy_decoder(config, max_decoding_steps=20,
                              early_exit=early_exit, decode_impl="xla")
    fused = make_greedy_decoder(config, max_decoding_steps=20,
                                early_exit=early_exit, decode_impl="pallas")
    ref = xla(params, *batch, target_positions)
    out = fused(params, *batch, target_positions)
    np.testing.assert_array_equal(np.asarray(ref.lengths),
                                  np.asarray(out.lengths))
    emitted = np.asarray(ref.emitted_mask) > 0
    np.testing.assert_array_equal(np.asarray(ref.tokens) * emitted,
                                  np.asarray(out.tokens) * emitted)
    np.testing.assert_array_equal(np.asarray(ref.emitted_mask),
                                  np.asarray(out.emitted_mask))
    np.testing.assert_allclose(
        np.asarray(ref.attention_commands) * emitted[..., None],
        np.asarray(out.attention_commands) * emitted[..., None],
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ref.attention_situations) * emitted[..., None],
        np.asarray(out.attention_situations) * emitted[..., None],
        rtol=1e-5, atol=1e-6)


def test_pallas_falls_back_for_multilayer(setup):
    """Non-flagship configurations silently use the XLA path."""
    config = ModelConfig(input_vocabulary_size=12, target_vocabulary_size=9,
                         num_cnn_channels=8, embedding_dimension=8,
                         encoder_hidden_size=12, decoder_hidden_size=12,
                         cnn_kernel_size=3, cnn_hidden_num_channels=6,
                         num_decoder_layers=2)
    params = init_model_params(jax.random.PRNGKey(3), config)
    _, _, batch, target_positions = setup
    decoder = make_greedy_decoder(config, max_decoding_steps=10,
                                  decode_impl="pallas")
    out = decoder(params, *batch, target_positions)
    assert out.tokens.shape[0] == 7
