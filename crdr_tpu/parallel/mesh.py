"""Device-mesh utilities: data-parallel training over ICI.

The reference is single-device only (README.md:62-63); this module is the
TPU-native capability extension: a ``Mesh`` over all local devices, batch
sharded on the ``data`` axis, parameters replicated, gradient all-reduce
inserted by XLA from the sharding annotations (no hand-written collectives
needed for DP; see parallel/spatial.py for conv spatial sharding).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, \
            f"need {n_devices} devices, have {len(devices)}"
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device_put a host batch with the batch dim sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def replicate_tree(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, rep), tree)
