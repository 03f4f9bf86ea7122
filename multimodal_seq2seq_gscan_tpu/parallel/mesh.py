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
    """Build a ('data', 'model') mesh over the given (or all) devices.

    Raises ``ValueError`` when the requested mesh shape does not exactly cover
    the available devices — callers must never be silently downsized to a
    smaller mesh than they asked for.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data_parallel is None:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            "mesh {}x{} requires {} devices but got {}".format(
                data_parallel, model_parallel,
                data_parallel * model_parallel, n))
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


def shard_examples_for_process(num_examples: int,
                               process_index: Optional[int] = None,
                               process_count: Optional[int] = None):
    """Example-index slice for this host (multi-host data loading).

    Each process loads only its contiguous shard; combined with
    :func:`make_global_batch` the shards form one global batch sharded over
    the 'data' axis (DCN across hosts, ICI within).
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    per_process = num_examples // process_count
    start = process_index * per_process
    return slice(start, start + per_process)


def make_global_batch(mesh: Mesh, local_batch):
    """Assemble a process-local batch into a global device array per field.

    On a single-process mesh this is exactly :func:`shard_batch`; multi-host,
    each process contributes its local rows and JAX builds the global array
    from the per-process shards.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, local_batch)
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch)
