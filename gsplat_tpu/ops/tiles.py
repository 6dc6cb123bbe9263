"""Tile binning: Gaussian → (tile, depth)-sorted instance lists, static shapes.

TPU-native replacement for the reference's dynamic binning pipeline
(count_tiles_per_gaussian! → cumsum → host-sync'd n_rendered →
duplicate_with_keys! → sortperm! → identify_tile_range!, reference:
src/rasterization/rasterizer.jl:325-378 and src/rasterization/utils.jl).

Redesign for XLA's static-shape world:

- The instance buffer has a *static* capacity (`max_instances`); overflow is
  reported as a traced flag the host can poll to grow the bucket (replacing
  the reference's grow-only buffer realloc + `@allowscalar` host sync,
  rasterizer.jl:333-343).
- Instance slots are expanded without scatter-per-gaussian: a scatter of
  gaussian start markers followed by a cumulative max fills each slot with
  its owning gaussian id, and the slot's rank inside the gaussian's rect
  gives the tile coordinates.
- The sort is a lexicographic `lax.sort` over (tile_id, depth) — the
  reference packs these into a UInt64 key (utils.jl:85-120); multi-key sort
  is the native XLA spelling.
- Per-tile ranges come from `searchsorted` instead of a boundary-detect
  kernel (utils.jl:56-78).
- NEW vs reference: each tile's instance range is *re-packed to a
  CHUNK-aligned start*. This gives the Pallas blend kernels disjoint,
  aligned slabs per tile, which is what makes the atomics-free backward
  possible (each tile owns whole chunks; per-gaussian reduction then happens
  through the gather's autodiff transpose = one segment-sum).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import CHUNK, TILE


def tile_grid(width: int, height: int) -> tuple[int, int]:
    return (-(-width // TILE), -(-height // TILE))


def tile_rect(mean_2d, radius, grid_wh):
    """Tile bbox [rmin, rmax) of a splat. Reference: get_rect (utils.jl:18-29).

    mean_2d: (..., 2) float; radius: (...,) int32 — or (..., 2) for
    per-axis radii (the opacity-aware ellipse bbox, rasterize.cull_radius);
    grid_wh: (2,) int. Returns rmin, rmax int32 arrays of shape (..., 2).
    """
    g = jnp.asarray(grid_wh, jnp.int32)
    r = radius.astype(jnp.float32)
    if r.ndim != mean_2d.ndim:
        r = r[..., None]
    rmin = jnp.clip(jnp.floor((mean_2d - r) / TILE).astype(jnp.int32), 0, g)
    # gpu_cld: trunc(floor((x + 15) / 16)) computed in f32.
    rmax = jnp.clip(jnp.floor((mean_2d + r + (TILE - 1)) / TILE).astype(jnp.int32), 0, g)
    return rmin, rmax


def _radius_pos(radius):
    """Live mask for scalar or per-axis radii."""
    return radius > 0 if radius.ndim == 1 else jnp.all(radius > 0, axis=-1)


def _cummax_1d(x):
    """Inclusive i32 cummax: streaming Pallas scan on TPU (~4x the XLA
    shifted-max lowering at 380k; pads ragged lengths up to 1024),
    `lax.cummax` elsewhere (the differential-tested oracle)."""
    (n,) = x.shape
    if jax.default_backend() == "tpu":
        from .cummax_pallas import cummax_pallas

        pad = (-n) % 1024
        if pad:
            # Trailing INT32_MIN pads never affect the prefix maxima.
            return cummax_pallas(
                jnp.concatenate([x, jnp.full((pad,), -(1 << 31), x.dtype)])
            )[:n]
        return cummax_pallas(x)
    return jax.lax.cummax(x)


def count_tiles(mean_2d, radius, grid_wh):
    """Tiles overlapped per Gaussian (0 for culled). utils.jl:122-142."""
    rmin, rmax = tile_rect(mean_2d, radius, grid_wh)
    area = (rmax[..., 0] - rmin[..., 0]) * (rmax[..., 1] - rmin[..., 1])
    return jnp.where(_radius_pos(radius), jnp.maximum(area, 0), 0)


@partial(jax.jit, static_argnames=("grid_wh", "max_instances", "chunk"))
def build_instances(
    mean_2d,  # (N, 2) f32
    depth,  # (N,) f32 (camera z; > 0 for valid)
    radius,  # (N,) int32 (0 for culled)
    *,
    grid_wh: tuple[int, int],
    max_instances: int,
    chunk: int = CHUNK,
):
    """Build the chunk-aligned, (tile, depth)-sorted instance table.

    Returns a dict:
      padded_ids:  (I_pad,) int32 — gaussian id per slot, -1 for padding
      tile_start:  (T,) int32 — chunk-aligned start slot of each tile
      tile_count:  (T,) int32 — number of real instances of each tile
      n_instances: () int32 — total real instances (tiles × gaussians)
      overflow:    () bool — instance budget exceeded; results are truncated

    `max_instances` bounds the CHUNK-ALIGNED total (real instances plus the
    per-tile alignment padding, i.e. `p_instances`); since every tile is
    rounded up, the real-instance total is always <= the aligned total, so
    one budget covers both. I_pad rounds it to 8*chunk so the blend kernels'
    table repack can use wide (1024, F) blocks.
    """
    gx, gy = grid_wh
    n_tiles = gx * gy
    N = mean_2d.shape[0]
    I_pad = max(-(-max_instances // (8 * chunk)) * (8 * chunk), 8 * chunk)

    mean_2d = jax.lax.stop_gradient(mean_2d)
    depth = jax.lax.stop_gradient(depth)

    rmin, rmax = tile_rect(mean_2d, radius, grid_wh)
    rect_w = rmax[:, 0] - rmin[:, 0]
    rpos = _radius_pos(radius)
    counts = jnp.where(rpos, jnp.maximum(rect_w * (rmax[:, 1] - rmin[:, 1]), 0), 0)

    cum = jnp.cumsum(counts)
    total = cum[-1] if N > 0 else jnp.int32(0)
    offsets = cum - counts  # exclusive prefix

    # --- exact per-tile instance histogram as ONE MXU matmul -------------
    # counts_tile(y, x) = sum_g [y in rect_y(g)] * [x in rect_x(g)]: the
    # rect indicator is separable, so the whole histogram is Y^T @ X with
    # Y (N, gy), X (N, gx) per-gaussian interval masks. ~N*gy*gx f32 MACs on
    # the MXU (0.05 ms at 1M gaussians) replaces a 4N-corner scatter-add or
    # a post-sort searchsorted (2.9 ms at 400k instances on v5e) — and it is
    # exact under truncation, unlike anything derived from a clipped array.
    live = rpos & (counts > 0)
    ix = jnp.arange(gx, dtype=jnp.int32)[None, :]
    iy = jnp.arange(gy, dtype=jnp.int32)[None, :]
    X = ((ix >= rmin[:, :1]) & (ix < rmax[:, :1]) & live[:, None]).astype(jnp.float32)
    Y = ((iy >= rmin[:, 1:2]) & (iy < rmax[:, 1:2])).astype(jnp.float32)
    hist = jax.lax.dot_general(
        Y, X, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (gy, gx); exact integers below 2^24
    tile_count = hist.ravel().astype(jnp.int32)  # (T,) tile-row-major = tile id order

    # Chunk-aligned layout, known BEFORE the sort.
    pcount = -(-tile_count // chunk) * chunk
    pcum = jnp.cumsum(pcount)
    tile_start = (pcum - pcount).astype(jnp.int32)
    p_total = pcum[-1] if n_tiles > 0 else jnp.int32(0)

    # --- combined [reals | alignment pads] expansion ---------------------
    # ONE marker scatter + cummax fills every slot with its owner: slots
    # < total own real instances (marker = gaussian id + 1), slots in
    # [total, total + pads_total) own per-tile alignment pads (marker =
    # PAD_BASE + tile id + 1; the high bit keeps cummax monotonic across the
    # boundary). The pads — (pcount - count) pseudo-instances per tile with
    # key (tile | all-ones depth) — ride the SAME u32 sort, so the sorted
    # order IS the final chunk-aligned layout: sorted position ==
    # destination slot, replacing round 1's post-sort scatter + searchsorted
    # epilogue (2x searchsorted 2.9 ms + scatter 3.1 ms at 400k on v5e).
    # (The marker/cummax expansion itself beats a searchsorted formulation
    # ~20x: XLA lowers the big batched binary search to serial gathers.)
    pad_counts = pcount - tile_count  # (T,) in [0, chunk)
    pad_cum = jnp.cumsum(pad_counts)
    pads_total = pad_cum[-1] if n_tiles > 0 else jnp.int32(0)
    pad_off = pad_cum - pad_counts

    PAD_BASE = jnp.int32(1) << jnp.int32(30)
    gid1 = jnp.arange(1, N + 1, dtype=jnp.int32)
    tid1 = jnp.arange(1, n_tiles + 1, dtype=jnp.int32)
    idx = jnp.concatenate([offsets, total + pad_off])
    val = jnp.concatenate([
        jnp.where(counts > 0, gid1, 0),
        jnp.where(pad_counts > 0, PAD_BASE + tid1, 0),
    ])
    # Scatter-max of val then cummax == scatter-SET of cummax(val) at the
    # LAST entry of each duplicate-idx run, then cummax: the source-order
    # cummax aggregates duplicate runs up front, so the scatter can claim
    # unique (and sorted) indices — which XLA lowers ~1.4x faster than the
    # duplicate-tolerant scatter-max (1.53 -> 1.08 ms at 380k incl. the
    # extra cummax, benchmark/micro13.py; owner-equivalence verified there
    # and by the binning differential tests).
    cval = _cummax_1d(val)
    last = jnp.concatenate([idx[1:] != idx[:-1], jnp.ones((1,), bool)])
    # Dropped (non-last duplicate) entries get DISTINCT out-of-bounds
    # indices so the unique_indices promise holds even for them.
    oob = I_pad + jnp.arange(idx.shape[0], dtype=jnp.int32)
    idx_u = jnp.where(last, idx, oob)
    markers = jnp.zeros((I_pad,), jnp.int32).at[idx_u].set(
        cval, mode="drop", unique_indices=True
    )
    owner = _cummax_1d(markers)  # (I_pad,)

    slot = jnp.arange(I_pad, dtype=jnp.int32)
    is_pad = slot >= total
    real_valid = ~is_pad & (owner > 0)
    pad_valid = is_pad & (slot < total + pads_total) & (owner >= PAD_BASE)
    g = jnp.clip(owner - 1, 0, max(N - 1, 0))

    # ONE multi-column row gather for all per-gaussian values the expansion
    # needs (several separate (I,)<-(N,) gathers cost ~2.5 ms each on v5e;
    # the packed row gather costs one). Pad slots gather garbage rows that
    # the key select below masks out.
    depth_u = jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32)
    pack_g = jnp.stack([offsets, rect_w, rmin[:, 0], rmin[:, 1], depth_u], axis=1)
    pg = pack_g[g]  # (I_pad, 5)

    rank = slot - pg[:, 0]
    w = jnp.maximum(pg[:, 1], 1)
    tx = pg[:, 2] + rank % w
    ty = pg[:, 3] + rank // w
    tile = ty * gx + tx

    # Exact lexicographic (tile, depth) sort — the reference's UInt64
    # (tile | depth-bits) key (utils.jl:85-120) spelled as a two-key
    # `lax.sort`. Full f32 depth precision: the top bits of a positive IEEE
    # float are order-preserving, so the raw bit pattern is the second key.
    # (A packed single-u32 key with truncated depth is ~2x faster to sort,
    # but at a 1080p grid it keeps only 11 mantissa bits and near-tie
    # high-alpha splats composite out of order — up to 0.15 max pixel error
    # vs the exact order in tests/test_tiles.py's image-equivalence test.)
    # Pads sort to their tile's tail via an all-ones depth key (greater than
    # any finite positive float's bits); dead slots sort last of all.
    pad_tile = jnp.clip(owner - PAD_BASE - 1, 0, max(n_tiles - 1, 0))
    key_tile = jnp.where(
        real_valid, tile.astype(jnp.uint32),
        jnp.where(pad_valid, pad_tile.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF)),
    )
    key_depth = jnp.where(real_valid, pg[:, 4].astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))
    _, _, padded_ids = jax.lax.sort(
        (key_tile, key_depth, jnp.where(real_valid, g, -1)), num_keys=2
    )

    # Truncation (p_total beyond the budget) breaks the slab layout for the
    # affected tiles; the overflow flag covers it (total <= p_total always)
    # and the Trainer discards + replays flagged chunks after regrowth.
    overflow = p_total > I_pad
    return {
        "padded_ids": padded_ids,
        "tile_start": tile_start,
        "tile_count": tile_count,
        "n_instances": jnp.minimum(total, I_pad),
        # Gaussian-major layout (exclusive prefix of per-gaussian tile
        # counts): the instance-gather's custom backward reduces sorted-by-id
        # cotangent runs at these boundaries (rasterize._gather_rows_xla).
        "gm_offsets": offsets,
        "tile_count_per_gaussian": counts,
        # The host's budget-sizing signal: chunk-aligned demand, exact even
        # under truncation (the matmul histogram sees the full demand).
        "p_instances": p_total,
        "overflow": overflow,
    }
