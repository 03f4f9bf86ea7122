"""Batched greedy decoder vs the reference batch-1 decode loop.

The reference decodes one example at a time in a Python while-loop
(seq2seq/predict.py:92-117); ours decodes the whole batch in one lax.scan.
With identical weights the emitted sequences and attention stacks must match,
including the trailing-EOS strip and the <= max_decoding_steps bound.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_PATH, "seq2seq")),
    reason="reference implementation not available")

if os.path.isdir(os.path.join(REFERENCE_PATH, "seq2seq")):
    sys.path.insert(0, REFERENCE_PATH)

import jax.numpy as jnp
import torch

from tests.test_model_parity import (
    _make_batch, _make_config, _make_reference_model, _params_from_reference)
from multimodal_seq2seq_gscan_tpu.decode import (
    make_greedy_decoder, strip_output_sequences)


def _reference_decode_single(ref, input_ids, input_length, situation,
                             max_decoding_steps, sos_idx=1, eos_idx=2):
    """The reference predict() inner loop for one example (batch size 1)."""
    with torch.no_grad():
        encoded = ref.encode_input(
            commands_input=torch.tensor(input_ids[None, :input_length]),
            commands_lengths=[input_length],
            situations_input=torch.tensor(situation[None]))
        projected_keys_visual = ref.visual_attention.key_layer(
            encoded["encoded_situations"])
        projected_keys_textual = ref.textual_attention.key_layer(
            encoded["encoded_commands"]["encoder_outputs"])
        hidden = ref.attention_decoder.initialize_hidden(
            ref.tanh(ref.enc_hidden_to_dec_hidden(encoded["hidden_states"])))
        token = torch.tensor([sos_idx], dtype=torch.long)
        output_sequence = []
        attn_sit_list = []
        iteration = 0
        while token != eos_idx and iteration <= max_decoding_steps:
            (output, hidden, _, attn_cmd, attn_sit) = ref.decode_input(
                target_token=token, hidden=hidden,
                encoder_outputs=projected_keys_textual,
                input_lengths=[input_length],
                encoded_situations=projected_keys_visual)
            token = output.max(dim=-1)[1]
            output_sequence.append(token.item())
            attn_sit_list.append(attn_sit.squeeze().numpy())
            iteration += 1
        if output_sequence and output_sequence[-1] == eos_idx:
            output_sequence.pop()
            attn_sit_list.pop()
    return output_sequence, attn_sit_list


def test_batched_greedy_decode_matches_reference():
    config = _make_config()
    ref = _make_reference_model(config)
    ref.eval()
    params = _params_from_reference(ref, config)
    input_ids, input_lengths, situations, _, _ = _make_batch(seed=3, batch=6)

    max_steps = 12
    decoder = make_greedy_decoder(config, max_decoding_steps=max_steps)
    output = decoder(params, jnp.asarray(input_ids), jnp.asarray(input_lengths),
                     jnp.asarray(situations),
                     jnp.zeros(input_ids.shape[0], jnp.int32))
    sequences, kept_lengths = strip_output_sequences(
        output, eos_idx=config.target_eos_idx)

    for i in range(input_ids.shape[0]):
        ref_seq, ref_attn = _reference_decode_single(
            ref, input_ids[i], int(input_lengths[i]), situations[i], max_steps)
        assert sequences[i] == ref_seq, (
            "example {}: {} != {}".format(i, sequences[i], ref_seq))
        attn = np.asarray(output.attention_situations[i])
        for t in range(kept_lengths[i]):
            np.testing.assert_allclose(attn[t], ref_attn[t], atol=2e-4)
