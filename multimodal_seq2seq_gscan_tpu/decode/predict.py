"""Batched prediction over a dataset + the canonical predict.json writer.

Byte-compatible with the reference's record schema (seq2seq/predict.py:44-51):
input/prediction/derivation/target/situation/attention_weights_input/
attention_weights_situation/accuracy/exact_match/position_accuracy — so the
error-analysis and visualization tools consume either framework's output.

Unlike the reference (batch 1, ~21 ex/s), prediction runs the batched lax.scan
decoder over full batches; only JSON assembly stays on the host.
"""

import json
import logging
import time
from typing import Iterator, List, Optional

import jax.numpy as jnp
import numpy as np

from multimodal_seq2seq_gscan_tpu.data.dataset import GroundedScanDataset
from multimodal_seq2seq_gscan_tpu.decode.greedy import (
    make_greedy_decoder, strip_output_sequences)
from multimodal_seq2seq_gscan_tpu.models.config import ModelConfig
from multimodal_seq2seq_gscan_tpu.models.params import ModelParams
from multimodal_seq2seq_gscan_tpu.utils.metrics import sequence_accuracy

logger = logging.getLogger(__name__)


def predict(dataset: GroundedScanDataset, params: ModelParams,
            config: ModelConfig, max_decoding_steps: int,
            batch_size: int = 256,
            max_examples_to_evaluate: Optional[int] = None,
            pad_to_full_batch: bool = True, mesh=None,
            decode_dtype: Optional[str] = None) -> Iterator[dict]:
    """Greedy-decode the dataset in batches; yield one record dict per example.

    With ``mesh``, each batch is sharded over the mesh's 'data' axis and the
    decoder runs data-parallel (pad_to_full_batch keeps shards equal-sized).
    ``decode_dtype="bfloat16"`` opts the decode loop into bf16 (halves the
    per-step attention-key HBM traffic; see make_greedy_decoder).
    """
    decoder = make_greedy_decoder(config, max_decoding_steps, mesh=mesh,
                                  compute_dtype=decode_dtype)
    start_time = time.time()
    produced = [0]
    done = [False]

    def assemble(output, batch, idx, situation_reprs, derivation_reprs):
        """Host-side record assembly for one decoded batch (generator)."""
        sequences, kept_lengths = strip_output_sequences(
            output, eos_idx=config.target_eos_idx)
        attn_cmd = np.asarray(output.attention_commands)
        attn_sit = np.asarray(output.attention_situations)
        position_accuracy = np.asarray(output.position_accuracy)
        for row in range(len(idx)):
            if max_examples_to_evaluate and produced[0] >= \
                    max_examples_to_evaluate:
                done[0] = True
                return
            example_idx = int(idx[row])
            input_length = int(batch.input_lengths[row])
            target_ids = dataset._target_ids[example_idx]
            output_sequence = sequences[row]
            kept = kept_lengths[row]
            # Attention stacks aligned 1:1 with kept steps; textual weights
            # truncated to the true input length (pad weights are exactly 0).
            attention_weights_commands = [
                [attn_cmd[row, t, :input_length].tolist()] for t in range(kept)]
            attention_weights_situations = [
                [attn_sit[row, t].tolist()] for t in range(kept)]
            yield {
                "example_idx": example_idx,
                "input_ids": dataset._input_ids[example_idx],
                "target_ids": target_ids,
                "output_ids": output_sequence,
                "derivation_representation": derivation_reprs[row],
                "situation_representation": situation_reprs[row],
                "attention_weights_input": attention_weights_commands,
                "attention_weights_situation": attention_weights_situations,
                "position_accuracy": float(position_accuracy[row]),
            }
            produced[0] += 1

    # One-batch lookahead: enqueue the decode of batch i+1 (jax dispatch is
    # async) BEFORE the host assembles batch i's records, so device decode
    # and host-side JSON assembly overlap instead of strictly alternating.
    pending = None
    for batch, idx, situation_reprs, derivation_reprs in \
            dataset.get_data_iterator(batch_size=batch_size,
                                      pad_to_full_batch=pad_to_full_batch):
        if done[0]:
            break
        output = decoder(params, jnp.asarray(batch.input_ids),
                         jnp.asarray(batch.input_lengths),
                         jnp.asarray(batch.situations),
                         jnp.asarray(batch.target_positions))
        if pending is not None:
            yield from assemble(*pending)
        pending = (output, batch, idx, situation_reprs, derivation_reprs)
    if pending is not None and not done[0]:
        yield from assemble(*pending)
    elapsed_time = time.time() - start_time
    logger.info("Predicted for {} examples.".format(produced[0]))
    logger.info("Done predicting in {} seconds.".format(elapsed_time))


def predict_and_save(dataset: GroundedScanDataset, params: ModelParams,
                     config: ModelConfig, output_file_path: str,
                     max_decoding_steps: int, batch_size: int = 256,
                     max_testing_examples: Optional[int] = None,
                     mesh=None, decode_dtype: Optional[str] = None,
                     **kwargs) -> str:
    """Decode the dataset and write the canonical predict.json."""
    output = []
    for record in predict(dataset, params, config, max_decoding_steps,
                          batch_size=batch_size,
                          max_examples_to_evaluate=max_testing_examples,
                          mesh=mesh, decode_dtype=decode_dtype):
        target_no_markers = record["target_ids"][1:-1].tolist()
        accuracy = sequence_accuracy(record["output_ids"], target_no_markers)
        input_str = dataset.array_to_sentence(
            record["input_ids"].tolist(), "input")[1:-1]
        target_str = dataset.array_to_sentence(
            record["target_ids"].tolist(), "target")[1:-1]
        output_str = dataset.array_to_sentence(record["output_ids"], "target")
        output.append({
            "input": input_str,
            "prediction": output_str,
            "derivation": [record["derivation_representation"]],
            "target": target_str,
            "situation": [record["situation_representation"]],
            "attention_weights_input": record["attention_weights_input"],
            "attention_weights_situation":
                record["attention_weights_situation"],
            "accuracy": accuracy,
            "exact_match": accuracy == 100,
            "position_accuracy": record["position_accuracy"],
        })
    with open(output_file_path, "w") as outfile:
        logger.info("Wrote predictions for {} examples.".format(len(output)))
        json.dump(output, outfile, indent=4)
    return output_file_path


def evaluate(dataset: GroundedScanDataset, params: ModelParams,
             config: ModelConfig, max_decoding_steps: int,
             batch_size: int = 256,
             max_examples_to_evaluate: Optional[int] = None, mesh=None,
             decode_dtype: Optional[str] = None):
    """(mean token accuracy, % exact match, mean aux position accuracy)."""
    accuracies: List[float] = []
    target_accuracies: List[float] = []
    exact_match = 0
    for record in predict(dataset, params, config, max_decoding_steps,
                          batch_size=batch_size,
                          max_examples_to_evaluate=max_examples_to_evaluate,
                          mesh=mesh, decode_dtype=decode_dtype):
        accuracy = sequence_accuracy(record["output_ids"],
                                     record["target_ids"][1:-1].tolist())
        if accuracy == 100:
            exact_match += 1
        accuracies.append(accuracy)
        target_accuracies.append(record["position_accuracy"])
    if not accuracies:
        raise ValueError(
            "evaluate() got an empty '{}' split — nothing to decode".format(
                dataset.split))
    return (float(np.mean(np.array(accuracies))),
            (exact_match / len(accuracies)) * 100,
            float(np.mean(np.array(target_accuracies))))
