"""The multimodal seq2seq model: CNN + BiLSTM encoder, joint-attention decoder.

Dataflow-parity rebuild of the reference Model (seq2seq/model.py:24-261 and
seq2seq/seq2seq_model.py): identical tensor algebra, but batch-first, purely
functional, and with the per-timestep Python loop replaced by ``lax.scan`` so
the whole teacher-forced unroll compiles to one XLA program.
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from multimodal_seq2seq_gscan_tpu.models.config import ModelConfig
from multimodal_seq2seq_gscan_tpu.models.nn import (
    additive_attention, dropout, embed, lstm_cell, masked_lstm_scan,
    reverse_padded, sequence_mask, situation_cnn)
from multimodal_seq2seq_gscan_tpu.models.params import (
    ModelParams, count_parameters)

__all__ = [
    "EncodedInput", "encode_input", "decode_teacher_forced", "decoder_step",
    "forward", "get_loss", "get_metrics", "get_auxiliary_loss",
    "get_auxiliary_accuracy", "auxiliary_task_forward", "count_parameters",
    "initialize_decoder_hidden", "project_keys",
]


class EncodedInput(NamedTuple):
    encoded_situations: jax.Array  # [B, H*W, 3*cnn_channels]
    encoded_commands: jax.Array    # [B, T_in, enc_hidden]
    hidden: jax.Array              # [B, enc_hidden]
    command_mask: jax.Array        # [B, T_in]


def encode_input(params: ModelParams, config: ModelConfig,
                 command_ids: jax.Array, command_lengths: jax.Array,
                 situations: jax.Array, *, rng: Optional[jax.Array] = None,
                 deterministic: bool = True) -> EncodedInput:
    """CNN over the situation grid + (bi)LSTM over the command tokens.

    Bidirectional outputs/final hidden are summed over directions (reference
    seq2seq_model.py:76-81); the backward pass runs over the length-reversed
    valid prefix, reproducing packed-sequence semantics.
    """
    if rng is not None:
        rng_cnn, rng_emb, rng_layers = jax.random.split(rng, 3)
    else:
        rng_cnn = rng_emb = rng_layers = None

    # -- Situation encoder --
    features = situation_cnn(params.cnn, situations, config.cnn_kernel_size)
    features = jax.nn.relu(features)
    features = dropout(rng_cnn, features, config.cnn_dropout_p, deterministic)

    # -- Command encoder --
    embedded = embed(params.encoder.embedding, command_ids,
                     config.input_padding_idx)
    embedded = dropout(rng_emb, embedded, config.encoder_dropout_p,
                       deterministic)
    max_len = command_ids.shape[1]
    mask = sequence_mask(command_lengths, max_len)

    # Stack wiring follows torch nn.LSTM: layer i>0 consumes the (concat of
    # both directions of the) layer below, with inter-layer dropout on all
    # but the last layer's output; the model-level direction *sum* applies
    # only to the final layer (reference seq2seq_model.py:76-81).
    num_layers = len(params.encoder.fwd_layers)
    layer_input = embedded
    fwd_out = bwd_out = fwd_h = bwd_h = None
    for i in range(num_layers):
        fwd_out, (fwd_h, _) = masked_lstm_scan(
            params.encoder.fwd_layers[i], layer_input, mask)
        if params.encoder.bwd_layers is not None:
            reversed_in = reverse_padded(layer_input, command_lengths)
            bwd_out_rev, (bwd_h, _) = masked_lstm_scan(
                params.encoder.bwd_layers[i], reversed_in, mask)
            bwd_out = reverse_padded(bwd_out_rev, command_lengths)
            layer_input = jnp.concatenate([fwd_out, bwd_out], axis=-1)
        else:
            layer_input = fwd_out
        if i < num_layers - 1:
            layer_rng = (jax.random.fold_in(rng_layers, i)
                         if rng_layers is not None else None)
            layer_input = dropout(layer_rng, layer_input,
                                  config.encoder_dropout_p, deterministic)
    if params.encoder.bwd_layers is not None:
        outputs = fwd_out + bwd_out
        hidden = fwd_h + bwd_h
    else:
        outputs = fwd_out
        hidden = fwd_h

    return EncodedInput(encoded_situations=features, encoded_commands=outputs,
                        hidden=hidden, command_mask=mask)


def initialize_decoder_hidden(params: ModelParams, config: ModelConfig,
                              encoder_hidden: jax.Array
                              ) -> Tuple[jax.Array, jax.Array]:
    """tanh(W enc_hidden) replicated into (h0, c0) for every decoder layer.

    Returns h, c of shape [num_layers, B, H].
    """
    message = jnp.tanh(encoder_hidden @ params.enc_to_dec_w
                       + params.enc_to_dec_b)
    stacked = jnp.broadcast_to(message[None],
                               (config.num_decoder_layers,) + message.shape)
    return stacked, stacked


def project_keys(params: ModelParams, encoded: EncodedInput
                 ) -> Tuple[jax.Array, jax.Array]:
    """Pre-project both attention key sets once per sequence (efficiency;
    reference seq2seq_model.py:466-469). NOTE the projected keys double as the
    attention *values* — contexts live in decoder-hidden space."""
    projected_textual = encoded.encoded_commands @ params.textual_attention.key_w
    projected_visual = encoded.encoded_situations @ params.visual_attention.key_w
    return projected_textual, projected_visual


def decoder_step(params: ModelParams, config: ModelConfig,
                 token_ids: jax.Array, hidden: Tuple[jax.Array, jax.Array],
                 projected_textual_keys: jax.Array, command_mask: jax.Array,
                 projected_visual_keys: jax.Array, *,
                 rng: Optional[jax.Array] = None, deterministic: bool = True):
    """One decoder step (reference BahdanauAttentionDecoderRNN.forward_step).

    token_ids: [B]; hidden: (h, c) each [num_layers, B, H].
    Returns (logits [B, V], (h, c), attn_commands [B, M_t], attn_situations [B, M_v]).
    """
    h_stack, c_stack = hidden
    query = h_stack[-1]  # [B, H] — top-layer hidden state drives attention.

    if rng is not None:
        rng_emb, rng_layers = jax.random.split(rng)
    else:
        rng_emb = rng_layers = None

    embedded = embed(params.decoder.embedding, token_ids, config.target_pad_idx)
    embedded = dropout(rng_emb, embedded, config.decoder_dropout_p,
                       deterministic)

    context_command, attn_commands = additive_attention(
        params.textual_attention, query, projected_textual_keys,
        projected_textual_keys, command_mask, impl=config.attention_impl)

    if config.conditional_attention:
        joint = jnp.concatenate([query, context_command], axis=-1)
        visual_query = jnp.tanh(joint @ params.decoder.queries_to_keys_w
                                + params.decoder.queries_to_keys_b)
    else:
        visual_query = query
    visual_mask = jnp.ones(projected_visual_keys.shape[:2],
                           projected_visual_keys.dtype)
    context_situation, attn_situations = additive_attention(
        params.visual_attention, visual_query, projected_visual_keys,
        projected_visual_keys, visual_mask, impl=config.attention_impl)

    lstm_input = jnp.concatenate([embedded, context_command, context_situation],
                                 axis=-1)  # [B, 3H]
    new_h, new_c = [], []
    layer_input = lstm_input
    num_layers = len(params.decoder.lstm_layers)
    for i, layer in enumerate(params.decoder.lstm_layers):
        h_i, c_i = lstm_cell(layer, layer_input, h_stack[i], c_stack[i])
        new_h.append(h_i)
        new_c.append(c_i)
        layer_input = h_i
        if i < num_layers - 1:
            # torch nn.LSTM inter-layer dropout (all but the last layer).
            layer_rng = (jax.random.fold_in(rng_layers, i)
                         if rng_layers is not None else None)
            layer_input = dropout(layer_rng, layer_input,
                                  config.decoder_dropout_p, deterministic)
    lstm_output = new_h[-1]
    hidden_out = (jnp.stack(new_h), jnp.stack(new_c))

    pre_output = jnp.concatenate(
        [embedded, lstm_output, context_command, context_situation], axis=-1)
    pre_output = pre_output @ params.decoder.output_to_hidden_w  # [B, H]
    logits = pre_output @ params.decoder.hidden_to_output_w  # [B, V]
    return logits, hidden_out, attn_commands, attn_situations


def decode_teacher_forced(params: ModelParams, config: ModelConfig,
                          target_ids: jax.Array, encoded: EncodedInput, *,
                          rng: Optional[jax.Array] = None,
                          deterministic: bool = True):
    """Teacher-forced unroll over all time steps under one ``lax.scan``.

    Returns log-probs [B, T, V] and the situation-attention weights summed over
    time [B, M_v] (the auxiliary head input; reference seq2seq_model.py:490).
    """
    projected_textual, projected_visual = project_keys(params, encoded)
    hidden = initialize_decoder_hidden(params, config, encoded.hidden)

    if (config.teacher_forced_impl == "pallas"
            and config.num_decoder_layers == 1
            and config.conditional_attention):
        return _decode_teacher_forced_pallas(
            params, config, target_ids, encoded, projected_textual,
            projected_visual, hidden, rng=rng, deterministic=deterministic)

    def step(carry, xs):
        hidden, step_idx = carry
        tokens = xs
        step_rng = (jax.random.fold_in(rng, step_idx)
                    if rng is not None else None)
        logits, hidden, _, attn_situations = decoder_step(
            params, config, tokens, hidden, projected_textual,
            encoded.command_mask, projected_visual, rng=step_rng,
            deterministic=deterministic)
        return (hidden, step_idx + 1), (logits, attn_situations)

    tokens_by_time = jnp.swapaxes(target_ids, 0, 1)  # [T, B]
    (_, _), (logits, attn_situations) = lax.scan(
        step, (hidden, jnp.int32(0)), tokens_by_time)
    logits = jnp.swapaxes(logits, 0, 1)  # [B, T, V]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    # Sum of visual attention over *all* decode steps, padded ones included
    # (matches the reference, which sums over the full unrolled length).
    summed_attention = jnp.sum(attn_situations, axis=0)  # [B, M_v]
    return log_probs, summed_attention


def _fused_batch_block(batch: int) -> Tuple[int, int, int]:
    """(fwd_block, bwd_block, padded_batch) for the fused teacher-forced
    kernels.

    One full-batch block is ideal (the grid is sequential, so batch blocks
    serialize), and with the scoped-VMEM limit raised to 64 MiB
    (`SCOPED_VMEM_LIMIT_KIB`, passed as a per-program compiler option by
    `train/step.py`) the flagship batch of 200 compiles as one block for
    BOTH kernels (measured via chipless AOT compile at t_out=104: the
    forward needs 21.75 MiB at 200 rows, the backward roughly 2x per row —
    weights + transposes + 12 gradient refs — and both fit under 64 MiB).
    Beyond 200 rows the backward is unmeasured, so larger batches fall back
    to serialized 112/56 blocks (measured safe under the DEFAULT 16 MiB
    limit) over a padded batch; Mosaic requires non-full blocks be
    divisible by 8.
    """
    if batch <= 200:
        return batch, batch, batch
    padded = -(-batch // 56) * 56
    fwd = 112 if padded % 112 == 0 else 56
    return fwd, 56, padded


def _decode_teacher_forced_pallas(params, config, target_ids, encoded,
                                  projected_textual, projected_visual,
                                  hidden, *, rng, deterministic):
    """Teacher-forced unroll via the fused Pallas kernel pair
    (ops/pallas_teacher_forced.py): forward and backward each run the whole
    sequential decoder chain on-chip. Output-identical to the XLA scan path
    (dropout uses a different — equally distributed — mask stream)."""
    from multimodal_seq2seq_gscan_tpu.ops.pallas_decoder import (
        pack_decoder_weights)
    from multimodal_seq2seq_gscan_tpu.ops.pallas_teacher_forced import (
        K_STEPS, fused_teacher_forced)

    batch, num_steps = target_ids.shape
    weights = pack_decoder_weights(params, config.target_pad_idx)
    emb_dim = weights[6].shape[1]
    t_pad = -(-num_steps // K_STEPS) * K_STEPS
    tokens = jnp.swapaxes(target_ids, 0, 1).astype(jnp.int32)  # [T, B]
    if t_pad != num_steps:
        tokens = jnp.concatenate(
            [tokens, jnp.full((t_pad - num_steps, batch),
                              config.target_pad_idx, jnp.int32)])
    if deterministic or rng is None or config.decoder_dropout_p == 0.0:
        drop_mask = jnp.ones((t_pad, batch, emb_dim), jnp.float32)
    else:
        keep = 1.0 - config.decoder_dropout_p
        drop_mask = jax.random.bernoulli(
            rng, keep, (t_pad, batch, emb_dim)).astype(jnp.float32) / keep
    block, block_bwd, padded_batch = _fused_batch_block(batch)
    if padded_batch != batch:
        extra = padded_batch - batch

        def pad_rows(x):
            widths = ((0, extra),) + ((0, 0),) * (x.ndim - 1)
            return jnp.pad(x, widths)

        proj_txt_p = pad_rows(projected_textual)
        cmd_mask_p = pad_rows(encoded.command_mask)
        proj_vis_p = pad_rows(projected_visual)
        h0_p = pad_rows(hidden[0][0])
        c0_p = pad_rows(hidden[1][0])
        tokens = jnp.pad(tokens, ((0, 0), (0, extra)),
                         constant_values=config.target_pad_idx)
        drop_mask = jnp.pad(drop_mask, ((0, 0), (0, extra), (0, 0)),
                            constant_values=1.0)
    else:
        proj_txt_p, cmd_mask_p, proj_vis_p = (
            projected_textual, encoded.command_mask, projected_visual)
        h0_p, c0_p = hidden[0][0], hidden[1][0]
    interpret = jax.default_backend() != "tpu"
    logits, summed_attention = fused_teacher_forced(
        proj_txt_p, cmd_mask_p, proj_vis_p, h0_p, c0_p, tokens, drop_mask,
        weights, num_steps, block, interpret, block_bwd)
    logits = jnp.swapaxes(logits[:num_steps, :batch], 0, 1)  # [B, T, V]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return log_probs, summed_attention[:batch]


def forward(params: ModelParams, config: ModelConfig, command_ids, command_lengths,
            situations, target_ids, *, rng: Optional[jax.Array] = None,
            deterministic: bool = True):
    """Full forward pass: encode + teacher-forced decode (+ aux head scores)."""
    if rng is not None:
        rng_enc, rng_dec = jax.random.split(rng)
    else:
        rng_enc = rng_dec = None
    encoded = encode_input(params, config, command_ids, command_lengths,
                           situations, rng=rng_enc, deterministic=deterministic)
    log_probs, summed_attention = decode_teacher_forced(
        params, config, target_ids, encoded, rng=rng_dec,
        deterministic=deterministic)
    if config.auxiliary_task:
        target_position_scores = auxiliary_task_forward(summed_attention)
    else:
        target_position_scores = jnp.zeros_like(summed_attention)
    return log_probs, target_position_scores


def auxiliary_task_forward(summed_attention: jax.Array) -> jax.Array:
    """Log-softmax over grid cells of the time-summed situation attention."""
    return jax.nn.log_softmax(summed_attention, axis=-1)


def remove_start_of_sequence(config: ModelConfig,
                             targets: jax.Array) -> jax.Array:
    """Shift targets left by one (drop SOS, append a pad column)."""
    batch = targets.shape[0]
    pad = jnp.zeros((batch, 1), targets.dtype)
    return jnp.concatenate([targets[:, 1:], pad], axis=1)


def get_loss(config: ModelConfig, target_log_probs: jax.Array,
             targets: jax.Array) -> jax.Array:
    """NLL averaged over non-pad target tokens (== NLLLoss(ignore_index=pad))."""
    targets = remove_start_of_sequence(config, targets)
    token_log_probs = jnp.take_along_axis(
        target_log_probs, targets[..., None], axis=-1)[..., 0]  # [B, T]
    mask = (targets != config.target_pad_idx).astype(target_log_probs.dtype)
    total = jnp.maximum(jnp.sum(mask), 1.0)
    return -jnp.sum(token_log_probs * mask) / total


def get_metrics(config: ModelConfig, target_log_probs: jax.Array,
                targets: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(token accuracy %, exact-match %) over the batch."""
    targets = remove_start_of_sequence(config, targets)
    mask = (targets != config.target_pad_idx)
    predictions = jnp.argmax(target_log_probs, axis=-1)
    correct = jnp.logical_and(predictions == targets, mask)
    total = jnp.maximum(jnp.sum(mask), 1)
    accuracy = 100.0 * jnp.sum(correct) / total
    per_example_correct = jnp.sum(correct, axis=1)
    per_example_total = jnp.sum(mask, axis=1)
    # Padded batch slots (all-pad targets) are excluded from exact match.
    valid_example = per_example_total > 0
    matched = jnp.logical_and(per_example_correct == per_example_total,
                              valid_example)
    num_valid = jnp.maximum(jnp.sum(valid_example), 1)
    exact = 100.0 * jnp.sum(matched) / num_valid
    return accuracy, exact


def get_auxiliary_loss(auxiliary_log_probs: jax.Array,
                       target_positions: jax.Array,
                       valid: Optional[jax.Array] = None) -> jax.Array:
    """NLL of the target grid cell; ``valid`` masks padded batch slots
    (rows added by ``pad_to_full_batch`` carry no example)."""
    token_log_probs = jnp.take_along_axis(
        auxiliary_log_probs, target_positions[:, None], axis=-1)[:, 0]
    if valid is None:
        return -jnp.mean(token_log_probs)
    weights = valid.astype(token_log_probs.dtype)
    return -jnp.sum(token_log_probs * weights) / jnp.maximum(
        jnp.sum(weights), 1.0)


def get_auxiliary_accuracy(auxiliary_scores: jax.Array,
                           target_positions: jax.Array,
                           valid: Optional[jax.Array] = None) -> jax.Array:
    predictions = jnp.argmax(auxiliary_scores, axis=-1)
    correct = (predictions == target_positions).astype(jnp.float32)
    if valid is None:
        return 100.0 * jnp.mean(correct)
    weights = valid.astype(jnp.float32)
    return 100.0 * jnp.sum(correct * weights) / jnp.maximum(
        jnp.sum(weights), 1.0)
