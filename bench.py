"""Benchmark: batched greedy decode throughput on the attached accelerator.

Headline metric vs the reference's batch-1 decode loop: 21.35 ex/s on a CUDA
GPU (2001 examples / 93.74 s, reference training log adverb_run_1.txt tail).
We decode the same kind of workload — compositional-splits model shapes
(15x15 grid, 120 max decoding steps, vocab 21/9) — but fully batched under one
``lax.scan`` program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_EXAMPLES_PER_SECOND = 21.35  # 2001 ex / 93.74 s, batch-1 reference


def main():
    import jax
    from multimodal_seq2seq_gscan_tpu.decode.greedy import make_greedy_decoder
    from multimodal_seq2seq_gscan_tpu.models import (
        ModelConfig, init_model_params)

    # Canonical compositional-splits model (SURVEY.md §6): 440k params,
    # grid 15x15 with 16 channels, input vocab 21, target vocab 9.
    grid, channels = 15, 16
    config = ModelConfig(
        input_vocabulary_size=21, target_vocabulary_size=9,
        num_cnn_channels=channels, embedding_dimension=25,
        encoder_hidden_size=100, decoder_hidden_size=100, cnn_kernel_size=7,
        cnn_hidden_num_channels=50, auxiliary_task=False)
    params = init_model_params(jax.random.PRNGKey(0), config)

    max_decoding_steps = 120  # all_experiments.sh test setting
    batch_size = 512
    t_in = 16
    rng = np.random.RandomState(0)
    input_lengths = rng.randint(5, t_in + 1, size=batch_size).astype(np.int32)
    input_ids = np.zeros((batch_size, t_in), dtype=np.int32)
    for i in range(batch_size):
        input_ids[i, 0] = 1
        input_ids[i, 1:input_lengths[i] - 1] = rng.randint(
            3, 21, size=input_lengths[i] - 2)
        input_ids[i, input_lengths[i] - 1] = 2
    situations = (rng.rand(batch_size, grid, grid, channels) < 0.1).astype(
        np.float32)
    target_positions = np.zeros((batch_size,), dtype=np.int32)

    decoder = make_greedy_decoder(config, max_decoding_steps)
    args = (params, input_ids, input_lengths, situations, target_positions)

    # Warm-up / compile.
    out = decoder(*args)
    jax.block_until_ready(out.tokens)

    n_iters = 8
    start = time.perf_counter()
    for _ in range(n_iters):
        out = decoder(*args)
    jax.block_until_ready(out.tokens)
    elapsed = time.perf_counter() - start
    examples_per_second = (n_iters * batch_size) / elapsed

    print(json.dumps({
        "metric": "greedy_decode_throughput",
        "value": round(examples_per_second, 2),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_second
                             / BASELINE_EXAMPLES_PER_SECOND, 2),
    }))


if __name__ == "__main__":
    main()
