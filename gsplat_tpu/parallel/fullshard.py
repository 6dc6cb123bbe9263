"""Fully-sharded rendering: gauss-sharded prologue + instance all-to-all +
tile-sharded blend, with NO replicated instance table.

This is SURVEY.md §2.8's second scale-out layout (the round-1 build shipped
only the first: replicated prologue + tile-sharded blend with a replicated
table, parallel/tile_shard.py). Here every stage is distributed:

  1. Gaussians are row-sharded over the mesh axis; each device projects and
     SH-shades only its N/D slice (the reference's ndrange=n kernels,
     rasterizer.jl:297-323, have no distributed analogue — this is new
     scope).
  2. Each device expands its own Gaussians into (tile, depth) instances.
     Tiles are range-partitioned over the same axis, so the *destination*
     device of an instance is `tile // t_loc` — monotone in tile id — and
     one exact (tile, depth) two-key sort simultaneously orders instances
     by destination, by tile, and front-to-back. Per-destination segments
     are padded to a static `exchange budget` (pads ride the sort, exactly
     like ops/tiles.py's chunk pads), giving the static-shape layout
     `lax.all_to_all` needs.
  3. ONE all-to-all moves gathered instance-table rows (and their sort
     keys) source→destination over ICI. Rows are gathered on the *source*
     shard from its local per-Gaussian arrays, so no cross-device feature
     gather ever happens.
  4. Each destination re-sorts its received instances by (local tile,
     depth), builds its chunk-aligned local table, and runs the Pallas
     blend over its own tile range only.

The whole pipeline is one `shard_map` body and differentiates end-to-end:
the all-to-all transposes to the reverse all-to-all, the source-side row
gather transposes to the per-shard scatter-add onto local Gaussians (the
atomics-free reduction of ops/rasterize.py, now per shard), and the
replicated camera operands pick up their cross-shard psum from shard_map's
transpose rule. Overflow of either static budget (per-pair exchange, local
table) is reported as a traced flag, like ops/tiles.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..constants import CHUNK
from ..ops.blend_scan import F_PAD
from ..ops.projection import project
from ..ops.rasterize import RasterizerConfig, _assemble_image, cull_radius
from ..ops.sh import sh_to_rgb
from ..ops.tiles import _radius_pos, tile_rect

_U32_MAX = jnp.uint32(0xFFFFFFFF)


def _expand_to_send(mean_2d, depth, radius, rows, *, grid_wh, t_loc, n_dest, i_ex):
    """Bucket this shard's instances into the padded all-to-all send layout.

    Returns (send_rows (n_dest, i_ex, F), send_tile (n_dest, i_ex) i32 with
    -1 on pad slots, send_depth_bits likewise, overflow ()).

    The mechanics mirror ops/tiles.py:105-213 (marker scatter + cummax
    expansion; pads ride the sort) with the destination segment, not the
    chunk, as the alignment unit.
    """
    n_l = mean_2d.shape[0]
    S = n_dest * i_ex

    mean_2d = jax.lax.stop_gradient(mean_2d)
    depth_sg = jax.lax.stop_gradient(depth)

    rmin, rmax = tile_rect(mean_2d, radius, grid_wh)
    gx = grid_wh[0]
    rect_w = rmax[:, 0] - rmin[:, 0]
    rpos = _radius_pos(radius)
    counts = jnp.where(rpos, jnp.maximum(rect_w * (rmax[:, 1] - rmin[:, 1]), 0), 0)
    cum = jnp.cumsum(counts)
    total = cum[-1] if n_l > 0 else jnp.int32(0)
    offsets = cum - counts

    # Per-destination send counts: the separable per-tile matmul histogram
    # (tiles.py:105-120), segment-summed over each destination's tile range.
    gy = grid_wh[1]
    live = rpos & (counts > 0)
    ix = jnp.arange(gx, dtype=jnp.int32)[None, :]
    iy = jnp.arange(gy, dtype=jnp.int32)[None, :]
    X = ((ix >= rmin[:, :1]) & (ix < rmax[:, :1]) & live[:, None]).astype(jnp.float32)
    Y = ((iy >= rmin[:, 1:2]) & (iy < rmax[:, 1:2])).astype(jnp.float32)
    hist = jax.lax.dot_general(
        Y, X, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).ravel().astype(jnp.int32)  # (gy*gx,)
    t_pad = n_dest * t_loc
    hist = jnp.pad(hist, (0, t_pad - hist.shape[0]))
    dest_counts = hist.reshape(n_dest, t_loc).sum(axis=1)  # (D,)
    overflow = jnp.any(dest_counts > i_ex)

    # Markers: reals at [0, total), per-destination pads after them. The
    # clamped pad counts keep indices in range when overflowing (results are
    # then garbage, but the flag is up and the caller discards the step).
    pad_counts = jnp.maximum(i_ex - dest_counts, 0)
    pad_cum = jnp.cumsum(pad_counts)
    pad_off = pad_cum - pad_counts
    PAD_BASE = jnp.int32(1) << jnp.int32(30)
    gid1 = jnp.arange(1, n_l + 1, dtype=jnp.int32)
    did1 = jnp.arange(1, n_dest + 1, dtype=jnp.int32)
    idx = jnp.concatenate([offsets, total + pad_off])
    val = jnp.concatenate([
        jnp.where(counts > 0, gid1, 0),
        jnp.where(pad_counts > 0, PAD_BASE + did1, 0),
    ])
    markers = jnp.zeros((S,), jnp.int32).at[idx].max(val, mode="drop")
    owner = jax.lax.cummax(markers)

    slot = jnp.arange(S, dtype=jnp.int32)
    is_real = (slot < total) & (owner > 0) & (owner < PAD_BASE)
    is_pad = (slot >= total) & (owner >= PAD_BASE)
    g = jnp.clip(owner - 1, 0, max(n_l - 1, 0))

    depth_u = jax.lax.bitcast_convert_type(depth_sg.astype(jnp.float32), jnp.int32)
    pack_g = jnp.stack([offsets, rect_w, rmin[:, 0], rmin[:, 1], depth_u], axis=1)
    pg = pack_g[g]
    rank = slot - pg[:, 0]
    w = jnp.maximum(pg[:, 1], 1)
    tile = (pg[:, 3] + rank // w) * gx + (pg[:, 2] + rank % w)

    # Two-key (tile, depth) sort = (dest, tile, depth): dest is tile // t_loc.
    pad_dest = jnp.clip(owner - PAD_BASE - 1, 0, n_dest - 1)
    key_tile = jnp.where(
        is_real, tile.astype(jnp.uint32),
        jnp.where(is_pad, ((pad_dest + 1) * t_loc - 1).astype(jnp.uint32), _U32_MAX),
    )
    key_depth = jnp.where(is_real, pg[:, 4].astype(jnp.uint32), _U32_MAX)
    _, _, s_gid, s_tile, s_depth = jax.lax.sort(
        (key_tile, key_depth,
         jnp.where(is_real, g, -1),
         jnp.where(is_real, tile, -1),
         jnp.where(is_real, pg[:, 4], 0)),
        num_keys=2,
    )

    # Gather table rows on the source shard (pads -> zero rows).
    rows_s = rows[jnp.clip(s_gid, 0, max(n_l - 1, 0))] * (s_gid >= 0).astype(rows.dtype)[:, None]
    return (
        rows_s.reshape(n_dest, i_ex, rows.shape[1]),
        s_tile.reshape(n_dest, i_ex),
        s_depth.reshape(n_dest, i_ex),
        overflow,
    )


def _build_local_table(recv_rows, recv_tile, recv_depth, *, d0, t_loc, i_loc, chunk):
    """Chunk-aligned local table for this shard's tile range from the
    received instances. Returns (table (i_loc, F), tile_start (t_loc,),
    tile_count (t_loc,), overflow)."""
    R = recv_rows.shape[0] * recv_rows.shape[1]
    F = recv_rows.shape[2]
    rows = recv_rows.reshape(R, F)
    tile = recv_tile.reshape(R)
    depth_bits = recv_depth.reshape(R)
    valid = tile >= 0
    lt = jnp.where(valid, tile - d0, t_loc)  # invalid -> past-the-end

    key_t = jnp.where(valid, lt.astype(jnp.uint32), _U32_MAX)
    key_d = jnp.where(valid, depth_bits.astype(jnp.uint32), _U32_MAX)
    _, _, perm = jax.lax.sort(
        (key_t, key_d, jnp.arange(R, dtype=jnp.int32)), num_keys=2
    )
    s_lt = jnp.where(valid, lt, t_loc)[perm]

    # Per-local-tile ranges of the sorted order; chunk-aligned layout.
    bounds = jnp.searchsorted(s_lt, jnp.arange(t_loc + 1, dtype=jnp.int32)).astype(jnp.int32)
    tile_count = bounds[1:] - bounds[:-1]
    pcount = -(-tile_count // chunk) * chunk
    pcum = jnp.cumsum(pcount)
    tile_start = (pcum - pcount).astype(jnp.int32)
    p_total = pcum[-1] if t_loc > 0 else jnp.int32(0)
    overflow = p_total > i_loc

    pos_in_sorted = jnp.arange(R, dtype=jnp.int32)
    seg_start = bounds[jnp.clip(s_lt, 0, t_loc - 1)]
    dst = tile_start[jnp.clip(s_lt, 0, t_loc - 1)] + (pos_in_sorted - seg_start)
    dst = jnp.where(s_lt < t_loc, dst, i_loc)  # invalid -> dropped

    # add == set here (destinations are unique, base is zero) and its
    # autodiff transpose is a plain gather.
    table = jnp.zeros((i_loc, F), rows.dtype).at[dst].add(rows[perm], mode="drop")
    return table, tile_start, tile_count, overflow


def render_fully_sharded(
    means, quats, scales, opacities, shs,
    *,
    camera,
    config: RasterizerConfig,
    sh_degree,
    mesh: Mesh,
    axis: str = "shard",
    background=None,
    exchange_budget: int | None = None,
):
    """Full rgb render with every stage sharded (see module docstring).

    means/quats/scales/opacities/shs are row-sharded over `axis` (N must
    divide the axis size); camera operands are replicated. `exchange_budget`
    is the static per-(source, destination)-pair instance capacity of the
    all-to-all; `config.max_instances` bounds each shard's LOCAL table.
    Returns (image (H, W, 3), aux) with aux["overflow"] the OR of both
    budgets' flags across shards.
    """
    if background is None:
        background = jnp.zeros(3, jnp.float32)
    d = mesh.shape[axis]
    gx, gy = config.grid_wh
    n_tiles = gx * gy
    t_loc = -(-n_tiles // d)
    i_loc = max(-(-config.max_instances // (8 * config.chunk)) * (8 * config.chunk),
                8 * config.chunk)
    if exchange_budget is None:
        exchange_budget = max(config.max_instances // (2 * d), config.chunk)
    i_ex = exchange_budget
    resolution_wh = jnp.array([config.width, config.height], jnp.float32)
    principal_px = camera.principal * resolution_wh

    def shard_fn(means_l, quats_l, scales_l, opac_l, shs_l, R, t, focal, principal, bg):
        from ..ops.blend_pallas import blend_pallas

        me = jax.lax.axis_index(axis)
        d0 = me * t_loc

        proj = project(
            means_l, quats_l, scales_l, R, t, focal, principal, resolution_wh,
            near_plane=config.near_plane, far_plane=config.far_plane,
        )
        rgbs = sh_to_rgb(means_l, shs_l, -R.T @ t, sh_degree)

        pad_cols = F_PAD - 6 - 3
        rows = jnp.concatenate(
            [proj["mean_2d"], proj["conic"], opac_l[:, None], rgbs,
             jnp.zeros((means_l.shape[0], pad_cols), jnp.float32)],
            axis=1,
        )  # (N_l, F_PAD)

        # Exact-identity opacity cull + tight radius (ops/rasterize.py):
        # culled instances can never pass the blend's keep test — skip
        # their exchange.
        radius = cull_radius(opac_l, proj["radius"], proj["conic"])
        send_rows, send_tile, send_depth, ovf1 = _expand_to_send(
            proj["mean_2d"], proj["depth"], radius, rows,
            grid_wh=config.grid_wh, t_loc=t_loc, n_dest=d, i_ex=i_ex,
        )

        # ONE all-to-all: dim 0 of each (D, i_ex, ...) operand is scattered
        # over the axis while the axis is concatenated back on dim 0.
        recv_rows = jax.lax.all_to_all(send_rows, axis, 0, 0, tiled=False)
        recv_tile = jax.lax.all_to_all(send_tile, axis, 0, 0, tiled=False)
        recv_depth = jax.lax.all_to_all(send_depth, axis, 0, 0, tiled=False)

        table, tile_start, tile_count, ovf2 = _build_local_table(
            recv_rows, recv_tile, recv_depth,
            d0=d0, t_loc=t_loc, i_loc=i_loc, chunk=config.chunk,
        )

        tile_ids = jnp.minimum(d0 + jnp.arange(t_loc, dtype=jnp.int32), n_tiles - 1)
        color, T_final, n_contrib = blend_pallas(
            table, tile_start, tile_count,
            grid_wh=config.grid_wh, n_feat=3, tile_ids=tile_ids,
        )
        color = color + T_final[..., None] * bg
        overflow = jax.lax.psum((ovf1 | ovf2).astype(jnp.int32), axis) > 0
        return color, T_final, n_contrib, overflow

    spec_g = P(axis)
    color, T_final, n_contrib, overflow = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec_g, spec_g, spec_g, spec_g, spec_g, P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P()),
        check_vma=False,
    )(means, quats, scales, opacities, shs,
      camera.R, camera.t, camera.focal, principal_px, background)

    img = _assemble_image(color[:n_tiles], config.grid_wh, 3)
    return img, {
        "overflow": overflow,
        "T_final": T_final[:n_tiles],
        "n_contrib": n_contrib[:n_tiles],
    }
