"""Device meshes for multi-chip scaling.

The reference is strictly single-device (SURVEY.md §2.8: no distributed
layer at all); this module is the scale-out seam the TPU build adds. Axes:

  - "data":  views are data-parallel; per-view gradients all-reduce over ICI
    (the 3DGS analogue of DP grad all-reduce — per-Gaussian cotangents from
    different views sum, exactly like the reference's atomic accumulation
    summed contributions from tiles).
  - "gauss": per-Gaussian work (projection, SH, stats, densify bookkeeping)
    shards the primitive axis.

Multi-host: build the mesh over all `jax.devices()` after
`jax.distributed.initialize()`; data-parallel view sharding then rides DCN
across hosts and ICI within a slice.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
