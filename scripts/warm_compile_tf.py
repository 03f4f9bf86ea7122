"""AOT-compile the fused teacher-forced train step into the persistent
compilation cache, WITHOUT touching the TPU device (the axon compile helper
is chipless), so a later bench/training run starts from a warm cache.

Compiles the full train step (fwd + bwd + Adam) for each bucketed target
length bench_train_step.py exercises, for both teacher_forced_impl values.

Run:  python scripts/warm_compile_tf.py [--batch_size 200]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=200)
    parser.add_argument("--impls", default="pallas,xla")
    parser.add_argument("--t_outs", default="16,24,48,104")
    args = parser.parse_args()

    import jax
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_gscan")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    from multimodal_seq2seq_gscan_tpu.core.batch import Batch
    from multimodal_seq2seq_gscan_tpu.models import ModelConfig
    from multimodal_seq2seq_gscan_tpu.train.state import (
        create_train_state, make_optimizer)
    from multimodal_seq2seq_gscan_tpu.train.step import make_train_step

    import jax.numpy as jnp

    def batch_shapes(b, t_in, t_out, grid=6, channels=16):
        S = jax.ShapeDtypeStruct
        return Batch(
            input_ids=S((b, t_in), jnp.int32),
            input_lengths=S((b,), jnp.int32),
            situations=S((b, grid, grid, channels), jnp.float32),
            target_ids=S((b, t_out), jnp.int32),
            target_lengths=S((b,), jnp.int32),
            agent_positions=S((b,), jnp.int32),
            target_positions=S((b,), jnp.int32))

    for impl in args.impls.split(","):
        config = ModelConfig(
            input_vocabulary_size=21, target_vocabulary_size=9,
            num_cnn_channels=16, embedding_dimension=25,
            encoder_hidden_size=100, decoder_hidden_size=100,
            cnn_kernel_size=7, cnn_hidden_num_channels=50,
            teacher_forced_impl=impl)
        optimizer = make_optimizer()
        state_shape = jax.eval_shape(
            lambda: create_train_state(jax.random.PRNGKey(0), config,
                                       optimizer))
        train_step = make_train_step(config, optimizer, donate=False)
        for t_out in (int(t) for t in args.t_outs.split(",")):
            shapes = batch_shapes(args.batch_size, 16, t_out)
            t0 = time.time()
            train_step.lower(state_shape, shapes).compile()
            print("compiled impl=%s t_out=%d in %.0fs" %
                  (impl, t_out, time.time() - t0), flush=True)


if __name__ == "__main__":
    main()
