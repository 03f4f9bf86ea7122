"""Device-time breakdown of the resident scanned trainer (TPU).

Times, per optimizer step:
  1. single jitted train_step (per-batch dispatch), target lengths 24 and 40
  2. resident chunk at several steps_per_execution values
  3. chunk variants that isolate the on-device gather: fixed-batch scan
     (no gather) and gather-only scan (no model), both at k=50
  4. gather with float32-resident situations (no uint8 cast in the body)

Run on the real chip when it's free:  python scripts/bench_chunk.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_seq2seq_gscan_tpu.core.batch import Batch
from multimodal_seq2seq_gscan_tpu.models.config import ModelConfig
from multimodal_seq2seq_gscan_tpu.train.resident import (
    ResidentData, gather_batch, make_train_chunk)
from multimodal_seq2seq_gscan_tpu.train.state import (
    create_train_state, make_optimizer)
from multimodal_seq2seq_gscan_tpu.train.step import (
    make_train_step, train_step_body)

N = 533_399          # round-2 training-set size
B = 200
GRID, CHANNELS = 6, 16
T_IN, T_OUT = 16, 40


def make_config():
    return ModelConfig(
        input_vocabulary_size=20, target_vocabulary_size=9,
        num_cnn_channels=CHANNELS, embedding_dimension=25,
        encoder_hidden_size=100, decoder_hidden_size=100, cnn_kernel_size=7,
        cnn_hidden_num_channels=50, auxiliary_task=False)


def make_data(rng, situations_dtype=np.uint8):
    input_lengths = rng.randint(5, T_IN + 1, size=N).astype(np.int32)
    target_lengths = rng.randint(10, T_OUT + 1, size=N).astype(np.int32)
    return ResidentData(
        input_ids=rng.randint(0, 20, size=(N, T_IN)).astype(np.int32),
        input_lengths=input_lengths,
        situations=(rng.rand(N, GRID, GRID, CHANNELS) < 0.15).astype(
            situations_dtype),
        target_ids=rng.randint(0, 9, size=(N, T_OUT)).astype(np.int32),
        target_lengths=target_lengths,
        agent_positions=rng.randint(0, 36, size=N).astype(np.int32),
        target_positions=rng.randint(0, 36, size=N).astype(np.int32))


def timeit(fn, *args, repeats=5):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / repeats


def main():
    rng = np.random.RandomState(0)
    config = make_config()
    optimizer = make_optimizer()
    host = make_data(rng)
    print("placing resident data on", jax.devices()[0])
    data = ResidentData(*(jax.device_put(a) for a in host))

    # 1. per-batch single step at two target paddings
    for t_out in (24, 40):
        step = make_train_step(config, optimizer, donate=False)
        batch = Batch(
            input_ids=host.input_ids[:B],
            input_lengths=host.input_lengths[:B],
            situations=host.situations[:B].astype(np.float32),
            target_ids=host.target_ids[:B, :t_out],
            target_lengths=np.minimum(host.target_lengths[:B], t_out),
            agent_positions=host.agent_positions[:B],
            target_positions=host.target_positions[:B])
        state = create_train_state(jax.random.PRNGKey(0), config, optimizer)
        dt = timeit(lambda s=state, b=batch, f=step: f(s, b)[1]["loss"],
                    repeats=20)
        print("single step  T_out=%2d             : %7.3f ms/step" %
              (t_out, dt * 1e3))

    # 2. resident chunk at several k
    for k in (10, 50, 200, 500):
        chunk = make_train_chunk(config, optimizer, donate=False)
        idx = rng.randint(0, N, size=(k, B)).astype(np.int32)
        state = create_train_state(jax.random.PRNGKey(0), config, optimizer)
        dt = timeit(lambda s=state, i=idx, f=chunk: f(s, data, i)[1]["loss"])
        print("chunk k=%-4d                      : %7.3f ms/step (%.3f s/call)"
              % (k, dt / k * 1e3, dt))

    # 3a. scan WITHOUT gather: same fixed batch every step
    fixed = Batch(
        input_ids=data.input_ids[:B], input_lengths=data.input_lengths[:B],
        situations=data.situations[:B].astype(jnp.float32),
        target_ids=data.target_ids[:B], target_lengths=data.target_lengths[:B],
        agent_positions=data.agent_positions[:B],
        target_positions=data.target_positions[:B])

    @jax.jit
    def chunk_no_gather(state, batch):
        def body(carry, _):
            new_state, metrics = train_step_body(carry, batch, config,
                                                 optimizer, 0.3)
            return new_state, metrics["loss"]
        return jax.lax.scan(body, state, None, length=50)

    state = create_train_state(jax.random.PRNGKey(0), config, optimizer)
    dt = timeit(lambda: chunk_no_gather(state, fixed)[1])
    print("chunk k=50, no gather             : %7.3f ms/step" % (dt / 50 * 1e3))

    # 3b. gather only (no model): sum of the gathered batch. `data` must be
    # an ARGUMENT — closed-over device arrays are inlined as constants into
    # the serialized computation (hundreds of MB over the remote-compile
    # channel).
    @jax.jit
    def chunk_gather_only(data, idx_block):
        def body(carry, idx):
            b = gather_batch(data, idx)
            s = (jnp.sum(b.situations) + jnp.sum(b.input_ids)
                 + jnp.sum(b.target_ids))
            return carry + s, ()
        total, _ = jax.lax.scan(body, jnp.zeros(()), idx_block)
        return total

    idx = rng.randint(0, N, size=(50, B)).astype(np.int32)
    dt = timeit(lambda: chunk_gather_only(data, idx))
    print("chunk k=50, gather only           : %7.3f ms/step" % (dt / 50 * 1e3))

    # 4. f32-resident situations (gather without cast)
    host32 = host._replace(situations=host.situations.astype(np.float32))
    data32 = ResidentData(*(jax.device_put(a) for a in host32))
    chunk = make_train_chunk(config, optimizer, donate=False)
    idx = rng.randint(0, N, size=(50, B)).astype(np.int32)
    state = create_train_state(jax.random.PRNGKey(0), config, optimizer)
    dt = timeit(lambda: chunk(state, data32, idx)[1]["loss"])
    print("chunk k=50, f32-resident grids    : %7.3f ms/step" % (dt / 50 * 1e3))


if __name__ == "__main__":
    main()
