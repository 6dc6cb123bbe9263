"""Tile-sharded rendering: the blend fans out over the mesh's `tile` axis.

The §2.8 scale-out plan for the rasterizer's hot stage: per-Gaussian work
(projection, SH, binning, table gather) is cheap and runs replicated; the
per-tile compositing — the reference's workgroup-per-tile kernel and the
dominant FLOPs — shards over image tiles. Each shard runs the same Pallas
blend kernels over its tile slice (global tile indices ride the new
`tile_ids` scalar-prefetch argument, so pixel coordinates stay correct) and
reads the replicated instance table. The backward's per-instance cotangents
are partial per shard; shard_map's transpose rule inserts the one psum over
ICI that replaces the reference's global atomics at scale.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..constants import CHUNK
from ..ops import tiles
from ..ops.rasterize import (
    RasterizerConfig,
    _assemble_image,
    _gather_instance_table,
    cull_radius,
)
from ..ops.projection import project
from ..ops.sh import sh_to_rgb


def blend_tile_sharded(
    inst, tile_start, tile_count, *, grid_wh, n_feat, mesh: Mesh, axis: str = "tile"
):
    """blend_pallas with tiles sharded over `axis`; instance table replicated.

    Returns (color (T,P,C), T_final (T,P), n_contrib (T,P)) gathered over
    the axis. n_tiles is padded to a multiple of the axis size with
    zero-count dummy tiles.
    """
    from ..ops.blend_pallas import blend_pallas

    n_tiles = tile_start.shape[0]
    d = mesh.shape[axis]
    padt = (-n_tiles) % d
    ids = jnp.arange(n_tiles + padt, dtype=jnp.int32) % n_tiles
    if padt:
        tile_start = jnp.pad(tile_start, (0, padt))
        tile_count = jnp.pad(tile_count, (0, padt))  # dummy tiles: count 0

    def shard(inst, ts, tc, tids):
        return blend_pallas(
            inst, ts, tc, grid_wh=grid_wh, n_feat=n_feat, tile_ids=tids
        )

    color, T_final, n_contrib = shard_map(
        shard,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(inst, tile_start, tile_count, ids)
    return color[:n_tiles], T_final[:n_tiles], n_contrib[:n_tiles]


def render_tile_sharded(
    means, quats, scales, opacities, shs,
    *,
    camera,
    config: RasterizerConfig,
    sh_degree,
    mesh: Mesh,
    axis: str = "tile",
    background=None,
):
    """Full render with the blend tile-sharded (rgb mode).

    The projection/SH/binning prologue runs replicated — it is <30% of the
    forward at production sizes and keeps the instance table whole for the
    shards (replicate-primitives / shard-tiles, the first of the two §2.8
    layouts; the all-to-all instance exchange variant is the next step).
    """
    if background is None:
        background = jnp.zeros(3, jnp.float32)
    resolution_wh = jnp.array([config.width, config.height], jnp.float32)
    proj = project(
        means, quats, scales, camera.R, camera.t, camera.focal,
        camera.principal * resolution_wh, resolution_wh,
        near_plane=config.near_plane, far_plane=config.far_plane,
    )
    rgbs = sh_to_rgb(means, shs, camera.camera_center, sh_degree)
    # Exact-identity opacity cull + tight radius (see ops/rasterize.py).
    radius = cull_radius(opacities, proj["radius"], proj["conic"])
    binned = tiles.build_instances(
        proj["mean_2d"], proj["depth"], radius,
        grid_wh=config.grid_wh, max_instances=config.max_instances,
        chunk=config.chunk,
    )
    table = _gather_instance_table(
        binned["padded_ids"], proj["mean_2d"], proj["conic"], opacities, rgbs
    )
    color, T_final, n_contrib = blend_tile_sharded(
        table, binned["tile_start"], binned["tile_count"],
        grid_wh=config.grid_wh, n_feat=3, mesh=mesh, axis=axis,
    )
    color = color + T_final[..., None] * background
    img = _assemble_image(color, config.grid_wh, 3)
    return img, {"overflow": binned["overflow"], "T_final": T_final}
