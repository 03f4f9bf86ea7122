"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The environment preloads jax (sitecustomize) with the TPU backend selected, so
JAX_PLATFORMS set here would be too late — use jax.config.update instead, which
re-selects backends. XLA_FLAGS must still be set before the CPU backend is
first instantiated to get the 8 virtual devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
