"""Spatial sharding for high-resolution images (capability extension).

The reference handles large inputs by whole-image single-device convs
(base_model.py:137-167 pads to /64).  On TPU we can shard the HEIGHT axis of
an image across the mesh and let XLA's SPMD partitioner insert conv halo
exchanges automatically from sharding annotations — no manual collectives.
This lets one jitted program process images whose activations exceed a single
chip's HBM, or cut latency for huge stills.

Usage:
    mesh = make_mesh(8, axis_name="sp")
    fwd = spatial_sharded(model.net, mesh)   # jitted, H sharded
    out = fwd(params, image)                  # image H must divide the mesh
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_shardings(mesh: Mesh, axis_name: str = "sp"):
    """(replicated params, H-sharded NHWC activations)."""
    return NamedSharding(mesh, P()), NamedSharding(mesh, P(None, axis_name))


def spatial_sharded(fn: Callable, mesh: Mesh, axis_name: str = "sp",
                    donate: bool = False):
    """Wrap ``fn(params, x, *args)`` so x (NHWC) is sharded along H.

    XLA SPMD derives the halo exchanges for every conv from the sharding; the
    result is returned H-sharded (fetch with jax.device_get or re-shard).
    """
    rep, act = spatial_shardings(mesh, axis_name)

    return jax.jit(
        fn,
        in_shardings=(rep, act),
        out_shardings=act,
        donate_argnums=(1,) if donate else (),
    )
