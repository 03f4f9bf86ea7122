"""Run the driver entry points the way the driver does: fresh subprocess,
clean environment (no XLA_FLAGS / JAX_PLATFORMS help), so the hermeticity of
``__graft_entry__`` itself is what's under test.

Round-1 postmortem: ``dryrun_multichip(8)`` crashed in the driver
(MULTICHIP_r01.json rc=1) because it picked up the environment-preloaded TPU
platform instead of forcing the virtual-CPU backend. These tests pin the fix.
"""

import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    # The driver gives no help: no device-count flags, no platform override.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return env


def _run(code: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO_ROOT, env=_clean_env(),
        capture_output=True, text=True, timeout=600)


def test_dryrun_multichip_8_in_fresh_subprocess():
    proc = _run("import __graft_entry__; __graft_entry__.dryrun_multichip(8)")
    assert proc.returncode == 0, (
        "dryrun failed:\nstdout:\n{}\nstderr:\n{}".format(
            proc.stdout, proc.stderr))
    assert "dryrun_multichip(8) OK" in proc.stdout


def test_entry_compiles_in_fresh_subprocess():
    # The driver compile-checks entry() single-chip; verify it at least
    # compiles and runs on the forced-CPU backend in a clean process.
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "import __graft_entry__\n"
        "fn, args = __graft_entry__.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "import numpy as np\n"
        "assert np.isfinite(float(out)), out\n"
        "print('entry OK', float(out))\n")
    proc = _run(code)
    assert proc.returncode == 0, (
        "entry failed:\nstdout:\n{}\nstderr:\n{}".format(
            proc.stdout, proc.stderr))
    assert "entry OK" in proc.stdout


def test_make_mesh_raises_on_insufficient_devices():
    import jax

    from multimodal_seq2seq_gscan_tpu.parallel import make_mesh

    devices = jax.devices()
    assert len(devices) == 8  # conftest forces 8 virtual CPU devices
    with pytest.raises(ValueError):
        make_mesh(devices[:4], data_parallel=8)
    with pytest.raises(ValueError):
        make_mesh(devices, data_parallel=3, model_parallel=2)
