"""Device mesh + sharding rules.

The reference's only parallelism is DDP over NCCL (SURVEY.md §2.6).  The
TPU-native equivalent: a 1-D `data` mesh axis; parameters replicated (every
model here is <=50M params), batches sharded on axis 0; the gradient
all-reduce is inserted by XLA inside the jitted step and rides ICI.
A `model` axis is exposed for future tensor-parallel layouts.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1) -> Mesh:
    devices = np.array(jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = devices[: n_data * n_model].reshape(n_data, n_model)
    return Mesh(devices, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along the batch axis."""
    s = data_sharded(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
