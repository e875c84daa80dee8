"""Device mesh + sharding helpers.

The reference is single-process/single-GPU (``main.lua:39,52``; SURVEY.md
§2.3: no NCCL/MPI anywhere). The TPU-native scaling story is data
parallelism over the ICI mesh: parameters and optimizer state replicated,
the image batch sharded over the ``data`` axis, gradients reduced by XLA's
automatically inserted collectives under ``jit`` (pjit semantics) — no
explicit communication code.

A 4-block CNN detector at 800x450 has no sequence axis and fits on one
chip, so TP/PP/SP/EP are deliberately out of scope (SURVEY.md §2.3); the
scaling dimensions here are batch (DP) and, later, multi-host input
sharding.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array of a pytree with its leading axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def chunk_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 1 (batch) of stacked [K, B, ...] chunk arrays; the
    leading scan axis stays unsharded."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_chunk(mesh: Mesh, batches):
    """Place a stacked [K, B, ...] pytree with its batch axis sharded."""
    sh = chunk_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batches)
