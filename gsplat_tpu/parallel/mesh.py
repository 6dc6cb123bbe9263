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


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> None:
    """Join the multi-host job: `jax.distributed.initialize` with the
    standard env-var fallbacks (JAX_COORDINATOR_ADDRESS etc. / TPU pod
    metadata). After this, `jax.devices()` spans every host and
    `make_global_mesh` builds pod-wide meshes; collectives ride ICI within
    a slice and DCN across. On CPU the gloo backend serves the same role
    (how tests/test_multihost.py exercises this path with 2 processes)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def make_global_mesh(axis: str = "data") -> Mesh:
    """Mesh over ALL devices of the (multi-host) job."""
    return Mesh(np.array(jax.devices()), (axis,))


ASYNC_COLLECTIVE_FLAGS = (
    # Decompose each grad all-reduce so its DMA phase overlaps the remaining
    # backward compute (XLA's async collectives + latency-hiding scheduler).
    "--xla_tpu_enable_async_collective_fusion=true "
    "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true "
    "--xla_tpu_enable_async_collective_fusion_multiple_steps=true "
    "--xla_tpu_overlap_compute_collective_tc=true "
    "--xla_enable_async_all_gather=true "
    "--xla_enable_async_collective_permute=true"
)


def enable_async_collectives() -> None:
    """Opt in to collective/compute overlap BEFORE jax initializes devices.

    The data-parallel backward ends in one per-Gaussian gradient psum (the
    cross-view sum that replaces the reference backward's atomic
    accumulation); with these XLA flags the all-reduce's network phase is
    scheduled asynchronously against the still-running blend backward of
    the next microbatch instead of serializing after it. This is the
    compiler-scheduled spelling of SURVEY §2.8's "overlap the gradient
    collective with the blend" — on XLA one does not hand-place the
    overlap, one frees the scheduler to find it (scaling-book recipe).
    """
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    for f in ASYNC_COLLECTIVE_FLAGS.split():
        if f.split("=")[0] not in flags:
            flags = (flags + " " + f).strip()
    os.environ["XLA_FLAGS"] = flags


def host_local_to_global(mesh: Mesh, axis: str, tree):
    """Assemble globally-sharded batch arrays from per-process local shards.

    Each process passes ONLY its local slice of the leading (batch) axis —
    e.g. its locally-loaded views: process p of P contributes rows
    [p*B/P, (p+1)*B/P) of the global batch. Returns arrays sharded P(axis)
    over the global mesh, ready for the data-parallel train step. This is
    the multi-host view-loading seam: each host reads only its own images
    from disk (SURVEY §2.8; no reference analogue — it is single-device)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        tree,
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
