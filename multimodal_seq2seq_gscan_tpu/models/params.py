"""Parameter pytrees and initialization.

Parameters are plain NamedTuples of jnp arrays (valid JAX pytrees): explicit,
functional, and trivially shardable with ``jax.sharding``. Initializers mirror
PyTorch's defaults so training dynamics match the reference:
- Linear/Conv: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight and bias;
- LSTM: U(-1/sqrt(hidden), 1/sqrt(hidden)) for all weights/biases;
- Embedding: N(0, 1) with the padding row zeroed.

Weight layouts match PyTorch shapes (LSTM: [4H, in] with gate order i,f,g,o;
Linear stored transposed as [in, out] for right-multiplication) so reference
checkpoints can be imported directly.
"""

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_seq2seq_gscan_tpu.models.config import ModelConfig


class LSTMLayerParams(NamedTuple):
    w_ih: jax.Array  # [4H, input_size], gates ordered i, f, g, o
    w_hh: jax.Array  # [4H, H]
    b_ih: jax.Array  # [4H]
    b_hh: jax.Array  # [4H]


class AttentionParams(NamedTuple):
    key_w: jax.Array    # [key_size, hidden]
    query_w: jax.Array  # [query_size, hidden]
    energy_w: jax.Array  # [hidden, 1]


class EncoderParams(NamedTuple):
    embedding: jax.Array  # [input_vocab, embedding_dim]
    fwd_layers: Tuple[LSTMLayerParams, ...]
    bwd_layers: Optional[Tuple[LSTMLayerParams, ...]]


class DecoderParams(NamedTuple):
    embedding: jax.Array  # [target_vocab, H]
    lstm_layers: Tuple[LSTMLayerParams, ...]
    queries_to_keys_w: Optional[jax.Array]  # [2H, H] (conditional attention)
    queries_to_keys_b: Optional[jax.Array]  # [H]
    output_to_hidden_w: jax.Array  # [4H, H], bias-free
    hidden_to_output_w: jax.Array  # [H, target_vocab], bias-free


class CNNParams(NamedTuple):
    conv1_w: jax.Array  # [1, 1, C, O]  (HWIO layout)
    conv1_b: jax.Array
    conv5_w: jax.Array  # [5, 5, C, O]
    conv5_b: jax.Array
    convk_w: jax.Array  # [K, K, C, O]
    convk_b: jax.Array


class ModelParams(NamedTuple):
    cnn: CNNParams
    encoder: EncoderParams
    enc_to_dec_w: jax.Array  # [enc_hidden, dec_hidden]
    enc_to_dec_b: jax.Array  # [dec_hidden]
    textual_attention: AttentionParams
    visual_attention: AttentionParams
    decoder: DecoderParams


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _linear_init(key, in_features, out_features, bias=True):
    k_w, k_b = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    w = _uniform(k_w, (in_features, out_features), bound)
    if not bias:
        return w
    return w, _uniform(k_b, (out_features,), bound)


def _lstm_layer_init(key, input_size, hidden_size) -> LSTMLayerParams:
    keys = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden_size)
    return LSTMLayerParams(
        w_ih=_uniform(keys[0], (4 * hidden_size, input_size), bound),
        w_hh=_uniform(keys[1], (4 * hidden_size, hidden_size), bound),
        b_ih=_uniform(keys[2], (4 * hidden_size,), bound),
        b_hh=_uniform(keys[3], (4 * hidden_size,), bound))


def _embedding_init(key, vocab_size, dim, padding_idx=None):
    emb = jax.random.normal(key, (vocab_size, dim), jnp.float32)
    if padding_idx is not None:
        emb = emb.at[padding_idx].set(0.0)
    return emb


def _conv_init(key, kernel_size, in_channels, out_channels):
    k_w, k_b = jax.random.split(key)
    fan_in = in_channels * kernel_size * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    w = _uniform(k_w, (kernel_size, kernel_size, in_channels, out_channels),
                 bound)
    b = _uniform(k_b, (out_channels,), bound)
    return w, b


def _attention_init(key, key_size, query_size, hidden_size) -> AttentionParams:
    k1, k2, k3 = jax.random.split(key, 3)
    return AttentionParams(
        key_w=_linear_init(k1, key_size, hidden_size, bias=False),
        query_w=_linear_init(k2, query_size, hidden_size, bias=False),
        energy_w=_linear_init(k3, hidden_size, 1, bias=False))


def init_model_params(rng: jax.Array, config: ModelConfig) -> ModelParams:
    keys = jax.random.split(rng, 12)
    c = config

    conv1_w, conv1_b = _conv_init(keys[0], 1, c.num_cnn_channels,
                                  c.cnn_hidden_num_channels)
    conv5_w, conv5_b = _conv_init(keys[1], 5, c.num_cnn_channels,
                                  c.cnn_hidden_num_channels)
    convk_w, convk_b = _conv_init(keys[2], c.cnn_kernel_size, c.num_cnn_channels,
                                  c.cnn_hidden_num_channels)
    cnn = CNNParams(conv1_w, conv1_b, conv5_w, conv5_b, convk_w, convk_b)

    # Encoder: embedding + (bi)LSTM stack.
    enc_emb = _embedding_init(keys[3], c.input_vocabulary_size,
                              c.embedding_dimension,
                              padding_idx=c.input_padding_idx)
    # Upper layers of a bidirectional stack consume the *concatenated*
    # fwd+bwd outputs of the layer below (torch nn.LSTM(bidirectional=True)
    # semantics, used by reference seq2seq_model.py:47-63).
    num_directions = 2 if c.encoder_bidirectional else 1
    def enc_in(i):
        return (c.embedding_dimension if i == 0
                else num_directions * c.encoder_hidden_size)
    fwd_keys = jax.random.split(keys[4], c.num_encoder_layers)
    fwd_layers = tuple(
        _lstm_layer_init(fwd_keys[i], enc_in(i), c.encoder_hidden_size)
        for i in range(c.num_encoder_layers))
    if c.encoder_bidirectional:
        bwd_keys = jax.random.split(keys[5], c.num_encoder_layers)
        bwd_layers = tuple(
            _lstm_layer_init(bwd_keys[i], enc_in(i), c.encoder_hidden_size)
            for i in range(c.num_encoder_layers))
    else:
        bwd_layers = None
    encoder = EncoderParams(enc_emb, fwd_layers, bwd_layers)

    enc_to_dec_w, enc_to_dec_b = _linear_init(
        keys[6], c.encoder_hidden_size, c.decoder_hidden_size)

    textual_attention = _attention_init(keys[7], c.encoder_hidden_size,
                                        c.decoder_hidden_size,
                                        c.decoder_hidden_size)
    visual_attention = _attention_init(keys[8], c.cnn_output_dimension,
                                       c.decoder_hidden_size,
                                       c.decoder_hidden_size)

    h = c.decoder_hidden_size
    dec_emb = _embedding_init(keys[9], c.target_vocabulary_size, h,
                              padding_idx=c.target_pad_idx)
    dec_keys = jax.random.split(keys[10], c.num_decoder_layers)
    dec_layers = tuple(
        _lstm_layer_init(dec_keys[i], 3 * h if i == 0 else h, h)
        for i in range(c.num_decoder_layers))
    final_keys = jax.random.split(keys[11], 3)
    if c.conditional_attention:
        q2k_w, q2k_b = _linear_init(final_keys[0], 2 * h, h)
    else:
        q2k_w, q2k_b = None, None
    decoder = DecoderParams(
        embedding=dec_emb,
        lstm_layers=dec_layers,
        queries_to_keys_w=q2k_w,
        queries_to_keys_b=q2k_b,
        output_to_hidden_w=_linear_init(final_keys[1], 4 * h, h, bias=False),
        hidden_to_output_w=_linear_init(final_keys[2], h,
                                        c.target_vocabulary_size, bias=False))

    return ModelParams(
        cnn=cnn, encoder=encoder, enc_to_dec_w=enc_to_dec_w,
        enc_to_dec_b=enc_to_dec_b, textual_attention=textual_attention,
        visual_attention=visual_attention, decoder=decoder)


def count_parameters(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
