"""Microbenchmark: jitted train-step throughput at the canonical config.

Measures steps/s and examples/s for batch 200 at several bucketed target
lengths (the length-homogenized shuffle makes short buckets the common case),
with XLA vs Pallas attention. Reference baseline: 2.1 steps/s at batch 200 on
a CUDA GPU (BASELINE.md).

Run:  python scripts/bench_train_step.py [--impl xla|pallas]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_batch(batch_size, t_in, t_out, grid=6, channels=16, seed=0):
    from multimodal_seq2seq_gscan_tpu.core.batch import Batch
    rng = np.random.RandomState(seed)
    input_lengths = rng.randint(5, t_in + 1, size=batch_size).astype(np.int32)
    target_lengths = rng.randint(max(4, t_out - 8), t_out + 1,
                                 size=batch_size).astype(np.int32)
    input_ids = np.zeros((batch_size, t_in), dtype=np.int32)
    target_ids = np.zeros((batch_size, t_out), dtype=np.int32)
    for i in range(batch_size):
        input_ids[i, 0] = 1
        input_ids[i, 1:input_lengths[i] - 1] = rng.randint(
            3, 21, size=input_lengths[i] - 2)
        input_ids[i, input_lengths[i] - 1] = 2
        target_ids[i, 0] = 1
        target_ids[i, 1:target_lengths[i] - 1] = rng.randint(
            3, 9, size=target_lengths[i] - 2)
        target_ids[i, target_lengths[i] - 1] = 2
    return Batch(
        input_ids=input_ids, input_lengths=input_lengths,
        situations=(rng.rand(batch_size, grid, grid, channels) < 0.2).astype(
            np.float32),
        target_ids=target_ids, target_lengths=target_lengths,
        agent_positions=rng.randint(0, grid * grid, batch_size).astype(np.int32),
        target_positions=rng.randint(0, grid * grid, batch_size).astype(np.int32))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--impl", default="xla", choices=["xla", "pallas"],
                        help="attention implementation")
    parser.add_argument("--teacher_forced", default="xla",
                        choices=["xla", "pallas"],
                        help="teacher-forced unroll implementation "
                             "(pallas = fused whole-unroll kernel pair)")
    parser.add_argument("--batch_size", type=int, default=200)
    args = parser.parse_args()

    import jax
    # Persistent compile cache: the fused teacher-forced kernels take minutes
    # of AOT compile per bucket length; warm once (scripts/warm_compile_tf.py)
    # and every later run loads from cache.
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_gscan")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    from multimodal_seq2seq_gscan_tpu.models import ModelConfig
    from multimodal_seq2seq_gscan_tpu.train.state import (
        create_train_state, make_optimizer)
    from multimodal_seq2seq_gscan_tpu.train.step import make_train_step

    config = ModelConfig(
        input_vocabulary_size=21, target_vocabulary_size=9,
        num_cnn_channels=16, embedding_dimension=25, encoder_hidden_size=100,
        decoder_hidden_size=100, cnn_kernel_size=7, cnn_hidden_num_channels=50,
        attention_impl=args.impl, teacher_forced_impl=args.teacher_forced)
    optimizer = make_optimizer()
    state = create_train_state(jax.random.PRNGKey(0), config, optimizer)
    train_step = make_train_step(config, optimizer, donate=False)

    print(f"impl={args.impl} teacher_forced={args.teacher_forced} "
          f"batch={args.batch_size} backend={jax.default_backend()}")
    for t_out in (16, 24, 48, 104):
        # Distinct batches, cycled: identical repeated dispatches undercount
        # on the axon backend (PERFORMANCE.md round-2 correction).
        batches = [make_batch(args.batch_size, t_in=16, t_out=t_out, seed=s)
                   for s in range(4)]
        state, metrics = train_step(state, batches[0])  # compile
        jax.block_until_ready(metrics["loss"])
        n = 40
        start = time.perf_counter()
        for i in range(n):
            state, metrics = train_step(state, batches[i % len(batches)])
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - start
        print(f"  t_out={t_out:4d}: {n / dt:7.1f} steps/s  "
              f"{n * args.batch_size / dt:9.0f} ex/s  "
              f"({dt / n * 1000:.2f} ms/step)")


if __name__ == "__main__":
    main()
