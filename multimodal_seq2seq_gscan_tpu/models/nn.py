"""Neural building blocks: LSTM scans, additive attention, the situation CNN.

Everything is batch-first, static-shape, and built on ``lax.scan`` /
``lax.conv_general_dilated`` so XLA maps the compute onto the MXU and fuses the
elementwise tails. Masked scans replace the reference's sort/pack/unsort dance
(seq2seq/seq2seq_model.py:61-88) — equivalent semantics, no host-side sorting.

Deliberately not carried over from the reference cnn_model.py: the unused
``DeepConvolutionalNet`` (never instantiated, cnn_model.py:39-69) and the
``DownSamplingConvolutionalNet`` for RGB input, which the reference itself
declares incorrectly implemented and refuses to run (model.py:37-38,
__main__.py:112-114) — the CLI raises NotImplementedError for
--image_situation_representation exactly like the reference does.
"""


from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from multimodal_seq2seq_gscan_tpu.models.params import (
    AttentionParams, CNNParams, LSTMLayerParams)


def lstm_cell(params: LSTMLayerParams, x: jax.Array, h: jax.Array,
              c: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """One LSTM step. Gate order i, f, g, o (PyTorch layout).

    x: [B, input], h/c: [B, H] -> (h', c').
    """
    gates = x @ params.w_ih.T + h @ params.w_hh.T + params.b_ih + params.b_hh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def masked_lstm_scan(params: LSTMLayerParams, inputs: jax.Array,
                     mask: jax.Array,
                     init: Optional[Tuple[jax.Array, jax.Array]] = None
                     ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Run an LSTM over time with per-position validity masking.

    At masked (padded) positions the carry is held and the output is zero —
    exactly the packed-sequence semantics of the reference encoder.

    inputs: [B, T, input], mask: [B, T] (1.0 = valid).
    Returns outputs [B, T, H] and the final (h, c) (state at the last valid step).
    """
    batch = inputs.shape[0]
    hidden = params.w_hh.shape[1]
    if init is None:
        h0 = jnp.zeros((batch, hidden), inputs.dtype)
        c0 = jnp.zeros((batch, hidden), inputs.dtype)
    else:
        h0, c0 = init

    def step(carry, xs):
        h, c = carry
        x_t, m_t = xs
        h_new, c_new = lstm_cell(params, x_t, h, c)
        m = m_t[:, None]
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        return (h, c), h_new * m

    (h_final, c_final), outputs = lax.scan(
        step, (h0, c0),
        (jnp.swapaxes(inputs, 0, 1), jnp.swapaxes(mask, 0, 1)))
    return jnp.swapaxes(outputs, 0, 1), (h_final, c_final)


def reverse_padded(sequence: jax.Array, lengths: jax.Array) -> jax.Array:
    """Reverse the valid prefix of each padded sequence: [a b c 0 0] -> [c b a 0 0].

    Involution — applying it twice restores the original. sequence: [B, T, ...].
    """
    max_len = sequence.shape[1]
    positions = jnp.arange(max_len)[None, :]  # [1, T]
    rev_idx = lengths[:, None] - 1 - positions  # [B, T]
    rev_idx = jnp.where(rev_idx >= 0, rev_idx, positions)
    return jnp.take_along_axis(
        sequence, rev_idx.reshape(rev_idx.shape + (1,) * (sequence.ndim - 2)),
        axis=1)


def sequence_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """[B] lengths -> [B, max_len] float mask (1.0 where position < length)."""
    return (jnp.arange(max_len)[None, :] < lengths[:, None]).astype(jnp.float32)


def additive_attention(params: AttentionParams, queries: jax.Array,
                       projected_keys: jax.Array, values: jax.Array,
                       mask: jax.Array,
                       impl: str = "xla") -> Tuple[jax.Array, jax.Array]:
    """Bahdanau attention: energy = v . tanh(W_q q + W_k k), masked softmax.

    queries: [B, Q], projected_keys: [B, M, H], values: [B, M, V], mask: [B, M].
    Returns (context [B, V], weights [B, M]).
    """
    projected_queries = queries @ params.query_w  # [B, H]
    if impl == "pallas":
        # Fused VMEM kernel; assumes values is projected_keys (true for every
        # call site — the reference passes projected keys as values too).
        from multimodal_seq2seq_gscan_tpu.ops.pallas_attention import (
            fused_additive_attention)
        interpret = jax.default_backend() != "tpu"
        return fused_additive_attention(projected_queries, projected_keys,
                                        mask, params.energy_w,
                                        interpret=interpret)
    scores = jnp.tanh(projected_queries[:, None, :] + projected_keys)  # [B,M,H]
    scores = (scores @ params.energy_w)[..., 0]  # [B, M]
    # Large-negative (not -inf) fill: masked weights still underflow to exactly
    # 0, but an all-masked row (a padded batch slot) yields uniform weights
    # instead of NaN.
    scores = jnp.where(mask > 0, scores, -1e9)
    weights = jax.nn.softmax(scores, axis=-1)
    context = jnp.einsum("bm,bmv->bv", weights, values)
    return context, weights


def situation_cnn(params: CNNParams, images: jax.Array,
                  kernel_size: int) -> jax.Array:
    """Three parallel same-padding convs (k=1, 5, K) over the situation grid.

    images: [B, H, W, C] (NHWC — native TPU conv layout).
    Returns [B, H*W, 3*O] after channel-concat (pre-activation; the caller
    applies ReLU + dropout, matching the reference ConvolutionalNet).
    """
    def conv(w, b, k):
        pad = k // 2
        out = lax.conv_general_dilated(
            images, w, window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + b

    out1 = conv(params.conv1_w, params.conv1_b, 1)
    out5 = conv(params.conv5_w, params.conv5_b, 5)
    outk = conv(params.convk_w, params.convk_b, kernel_size)
    features = jnp.concatenate([out1, out5, outk], axis=-1)  # [B, H, W, 3O]
    batch, height, width, channels = features.shape
    return features.reshape(batch, height * width, channels)


def dropout(rng: Optional[jax.Array], x: jax.Array, rate: float,
            deterministic: bool) -> jax.Array:
    """Inverted dropout; identity when deterministic or rate == 0."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def embed(embedding: jax.Array, token_ids: jax.Array,
          padding_idx: int) -> jax.Array:
    """Embedding lookup with the padding row pinned to zero.

    Zeroing at lookup (rather than trusting the stored row) also zeroes the
    padding row's gradient, matching nn.Embedding(padding_idx=...).
    """
    vectors = jnp.take(embedding, token_ids, axis=0)
    return vectors * (token_ids != padding_idx)[..., None].astype(vectors.dtype)
