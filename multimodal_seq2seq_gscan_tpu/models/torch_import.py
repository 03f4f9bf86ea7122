"""Import reference PyTorch checkpoints (.pth.tar) into our parameter pytrees.

Lets a user of the reference switch frameworks without retraining: maps the
reference ``Model`` state dict (seq2seq/model.py:24-107 parameter naming) onto
:class:`ModelParams`, accounting for layout differences:

- Linear weights transpose ([out, in] -> [in, out]);
- conv kernels go to HWIO **with spatial transpose** — the reference convolves
  with H and W swapped (cnn_model.py:28,34 ``transpose(1, 3)``), so its learned
  kernels act spatially transposed;
- LSTM weights keep PyTorch's [4H, in] / gate order i,f,g,o (our cell uses the
  same layout).

Requires torch only at call time.
"""

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from multimodal_seq2seq_gscan_tpu.models.config import ModelConfig
from multimodal_seq2seq_gscan_tpu.models.params import (
    AttentionParams, CNNParams, DecoderParams, EncoderParams, LSTMLayerParams,
    ModelParams)


def _to_jnp(tensor) -> jnp.ndarray:
    return jnp.asarray(np.asarray(tensor.detach().cpu().numpy()
                                  if hasattr(tensor, "detach") else tensor))


def _lstm_layers(state_dict: Dict, prefix: str, num_layers: int,
                 reverse: bool = False) -> Tuple[LSTMLayerParams, ...]:
    suffix = "_reverse" if reverse else ""
    return tuple(
        LSTMLayerParams(
            w_ih=_to_jnp(state_dict[f"{prefix}.weight_ih_l{i}{suffix}"]),
            w_hh=_to_jnp(state_dict[f"{prefix}.weight_hh_l{i}{suffix}"]),
            b_ih=_to_jnp(state_dict[f"{prefix}.bias_ih_l{i}{suffix}"]),
            b_hh=_to_jnp(state_dict[f"{prefix}.bias_hh_l{i}{suffix}"]))
        for i in range(num_layers))


def _attention(state_dict: Dict, prefix: str) -> AttentionParams:
    return AttentionParams(
        key_w=_to_jnp(state_dict[f"{prefix}.key_layer.weight"]).T,
        query_w=_to_jnp(state_dict[f"{prefix}.query_layer.weight"]).T,
        energy_w=_to_jnp(state_dict[f"{prefix}.energy_layer.weight"]).T)


def params_from_state_dict(state_dict: Dict,
                           config: ModelConfig) -> ModelParams:
    """Build ModelParams from a reference Model state dict."""

    def conv_w(name):
        # [O, C, kh, kw] -> [kw, kh, C, O]: HWIO with the spatial transpose
        # that mirrors the reference's transpose(1, 3) around its conv.
        return _to_jnp(state_dict[name]).transpose(3, 2, 1, 0)

    cnn = CNNParams(
        conv1_w=conv_w("situation_encoder.conv_1.weight"),
        conv1_b=_to_jnp(state_dict["situation_encoder.conv_1.bias"]),
        conv5_w=conv_w("situation_encoder.conv_2.weight"),
        conv5_b=_to_jnp(state_dict["situation_encoder.conv_2.bias"]),
        convk_w=conv_w("situation_encoder.conv_3.weight"),
        convk_b=_to_jnp(state_dict["situation_encoder.conv_3.bias"]))

    encoder = EncoderParams(
        embedding=_to_jnp(state_dict["encoder.embedding.weight"]),
        fwd_layers=_lstm_layers(state_dict, "encoder.lstm",
                                config.num_encoder_layers),
        bwd_layers=(_lstm_layers(state_dict, "encoder.lstm",
                                 config.num_encoder_layers, reverse=True)
                    if config.encoder_bidirectional else None))

    decoder = DecoderParams(
        embedding=_to_jnp(state_dict["attention_decoder.embedding.weight"]),
        lstm_layers=_lstm_layers(state_dict, "attention_decoder.lstm",
                                 config.num_decoder_layers),
        queries_to_keys_w=(
            _to_jnp(state_dict["attention_decoder.queries_to_keys.weight"]).T
            if config.conditional_attention else None),
        queries_to_keys_b=(
            _to_jnp(state_dict["attention_decoder.queries_to_keys.bias"])
            if config.conditional_attention else None),
        output_to_hidden_w=_to_jnp(
            state_dict["attention_decoder.output_to_hidden.weight"]).T,
        hidden_to_output_w=_to_jnp(
            state_dict["attention_decoder.hidden_to_output.weight"]).T)

    return ModelParams(
        cnn=cnn, encoder=encoder,
        enc_to_dec_w=_to_jnp(state_dict["enc_hidden_to_dec_hidden.weight"]).T,
        enc_to_dec_b=_to_jnp(state_dict["enc_hidden_to_dec_hidden.bias"]),
        textual_attention=_attention(state_dict, "textual_attention"),
        visual_attention=_attention(state_dict, "visual_attention"),
        decoder=decoder)


def load_reference_checkpoint(path: str, config: ModelConfig
                              ) -> Tuple[ModelParams, dict]:
    """Load a reference checkpoint.pth.tar; returns (params, metadata)."""
    import torch
    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    params = params_from_state_dict(checkpoint["state_dict"], config)
    meta = {
        "iteration": checkpoint.get("iteration", 0),
        "best_iteration": checkpoint.get("best_iteration", 0),
        "best_accuracy": checkpoint.get("best_accuracy", 0.0),
        "best_exact_match": checkpoint.get("best_exact_match", 0.0),
    }
    return params, meta
