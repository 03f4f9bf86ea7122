"""Device-mesh utilities: data-parallel (and model-axis-ready) sharding.

The model is small (~440k params), so the productive strategy is pure data
parallelism: replicate parameters, shard the batch over the 'data' axis, and
let XLA insert the gradient psum over ICI from the sharding annotations.
A 'model' axis is exposed so tensor-parallel experiments stay possible
without touching call sites (the reference has no distributed story at all —
SURVEY.md §2.4 — this is new capability).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              data_parallel: Optional[int] = None,
              model_parallel: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data_parallel is None:
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel == n, (
        "mesh {}x{} does not cover {} devices".format(
            data_parallel, model_parallel, n))
    device_array = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(device_array, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch with every array sharded along its leading axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
