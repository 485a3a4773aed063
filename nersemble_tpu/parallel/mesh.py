"""Device mesh + sharding helpers: data parallelism over rays.

The TPU-native parallelism design (SURVEY.md section 2c): the ray batch is
sharded over the mesh's ``data`` axis; params, occupancy grid, and schedule
scalars are replicated. Under ``jax.jit`` with these shardings XLA inserts the
gradient all-reduce (psum) over ICI automatically — the framework never issues
explicit collectives on the DP path.

(The reference is single-GPU; its dormant DDP plumbing — world_size in
train_nersemble.py:272-274 — has no kernels to port. This module IS the comms
backend.)
"""

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data_axis_size: int = -1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if data_axis_size == -1:
        data_axis_size = len(devices)
    devices = np.asarray(devices[:data_axis_size])
    return Mesh(devices, ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (ray) axis split over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Device-put a host batch with the ray axis sharded over the mesh."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
