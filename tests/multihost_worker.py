"""Subprocess worker for the 2-process multi-host CPU test.

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize`` links
them into one 8-device world (Gloo collectives over localhost — the CPU-mesh
stand-in for DCN-across-hosts + ICI-within-host, SURVEY.md §2.4/§5.8). The
worker drives the real multi-host data path: ``shard_examples_for_process``
slices this host's rows, ``make_global_batch`` assembles the global sharded
batch from per-process shards, and one mesh train step runs. Loss and
per-leaf param sums are written as JSON for the parent test to compare with
the single-process result.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <out>
"""

import json
import os
import sys


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize("localhost:" + port,
                               num_processes=num_processes,
                               process_id=process_id)

    import jax.numpy as jnp
    import numpy as np

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)

    from __graft_entry__ import _tiny_config_and_batch
    from multimodal_seq2seq_gscan_tpu.core.batch import Batch
    from multimodal_seq2seq_gscan_tpu.parallel.mesh import (
        make_global_batch, make_mesh, replicate, shard_examples_for_process)
    from multimodal_seq2seq_gscan_tpu.train.state import (
        create_train_state, make_optimizer)
    from multimodal_seq2seq_gscan_tpu.train.step import make_train_step

    assert jax.process_count() == num_processes
    global_batch_size = 16
    config, full_batch = _tiny_config_and_batch(batch_size=global_batch_size)

    # This host loads ONLY its shard of the examples (the multi-host data
    # loading contract: each process reads a contiguous slice).
    sl = shard_examples_for_process(global_batch_size)
    local_batch = Batch(*(np.asarray(a)[sl] for a in full_batch))

    mesh = make_mesh()  # all 8 global devices: (data=8, model=1)
    global_batch = make_global_batch(mesh, local_batch)

    optimizer = make_optimizer()
    state = create_train_state(jax.random.PRNGKey(0), config, optimizer)
    state = replicate(mesh, jax.device_get(state))
    train_step = make_train_step(config, optimizer, mesh=mesh, donate=False)

    new_state, metrics = train_step(state, global_batch)
    loss = float(jax.device_get(metrics["loss"]))
    leaves = jax.tree.leaves(new_state.params)
    sum_fn = jax.jit(lambda ls: [jnp.sum(l) for l in ls],
                     out_shardings=None)
    param_sums = [float(s) for s in jax.device_get(sum_fn(leaves))]

    with open(out_path, "w") as f:
        json.dump({
            "process_id": process_id,
            "num_devices": len(jax.devices()),
            "num_local_devices": len(jax.local_devices()),
            "loss": loss,
            "param_sums": param_sums,
        }, f)


if __name__ == "__main__":
    main()
