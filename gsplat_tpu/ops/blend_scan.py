"""Tile blend, pure-JAX chunked-scan formulation (differentiable fallback).

This is the TPU-native re-formulation of the reference's sequential
front-to-back per-pixel compositing loop (`render!`, reference:
src/rasterization/render.jl:1-130):

  - Instances are processed in CHUNK-wide batches; per chunk, alpha is
    evaluated for all 256 tile pixels × CHUNK instances at once.
  - The sequential transmittance recurrence T ← T·(1−α) becomes an
    *exclusive cumulative product along the instance axis* within the chunk,
    carried across chunks. Early termination (T < 1e-4, render.jl:97-100)
    becomes an include-mask: the running product is monotonically
    decreasing, so "the first instance that would push T below 1e-4 and
    everything after it" is exactly the mask T_incl < 1e-4 plus a carried
    per-pixel `done` flag.
  - Per-pixel color accumulation becomes a (pixels × instances) @
    (instances × channels) matmul — MXU work in the Pallas version.

This module is the executable specification: `blend_pallas.py` implements
bit-compatible math as a Pallas kernel, and is tested against this and
against an independent sequential numpy implementation (`blend_ref.py`).

Gradients here come from plain JAX autodiff through `lax.scan`. Unlike the
reference (render.jl:234 passes gradient through the 0.99 alpha clamp), the
clamp's true zero-gradient is honored — see `blend_pallas.py` for the same
choice in the hand-written backward.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import ALPHA_MAX, ALPHA_MIN, CHUNK, TILE, TILE_PIXELS, TRANSMITTANCE_EPS

# Instance-table feature layout, shared with the Pallas kernels. The table
# is (I_pad, F_PAD) — instances are *rows* so that (a) building the table is
# ONE row-gather from the per-Gaussian pack (fast XLA gather; its autodiff
# transpose is one scatter-add segment-sum), and (b) each CHUNK-row slab is
# a contiguous 8 KB block for the Pallas DMA.
ROW_X = 0
ROW_Y = 1
ROW_CONIC_A = 2
ROW_CONIC_B = 3
ROW_CONIC_C = 4
ROW_OPACITY = 5
ROW_FEAT = 6  # feature channels start here
F_PAD = 16  # instance table padded to 16 feature columns


def pixel_coords_for_tile(tx, ty):
    """(P,) x and y pixel-center coordinates of a tile's pixels.

    Pixel k of a tile is (y_local, x_local) = divmod(k, TILE): x fastest,
    matching how the image is reassembled in ops/rasterize.py.
    """
    k = jnp.arange(TILE_PIXELS, dtype=jnp.int32)
    px = (tx * TILE + k % TILE).astype(jnp.float32)
    py = (ty * TILE + k // TILE).astype(jnp.float32)
    return px, py


def chunk_alpha(slab, px, py, row_valid):
    """Alpha matrix (P, K) of one instance chunk against one tile's pixels.

    slab: (F, K) instance rows; px/py: (P,) pixel coords; row_valid: (K,) bool.
    Applies the reference's σ<0 skip, 0.99 cap and 1/255 floor
    (render.jl:90-95). Returns (alpha, G=exp(-σ), sigma_valid) each (P, K).
    """
    dx = slab[ROW_X][None, :] - px[:, None]
    dy = slab[ROW_Y][None, :] - py[:, None]
    a = slab[ROW_CONIC_A][None, :]
    b = slab[ROW_CONIC_B][None, :]
    c = slab[ROW_CONIC_C][None, :]
    sigma = b * dx * dy + 0.5 * (a * dx * dx + c * dy * dy)
    G = jnp.exp(-sigma)
    alpha = jnp.minimum(ALPHA_MAX, slab[ROW_OPACITY][None, :] * G)
    keep = (sigma >= 0.0) & (alpha >= ALPHA_MIN) & row_valid[None, :]
    return jnp.where(keep, alpha, 0.0), G, keep


def _chunk_forward(slab, px, py, row_valid, base_rank, T_in, done, n_feat):
    """One chunk of front-to-back compositing for one tile.

    Returns (color_add (P,C), T_out (P,), done_out (P,), contrib_max (P,),
    w (P,K), include (P,K), T_before (P,K)).
    """
    K = slab.shape[1]
    alpha, _, _ = chunk_alpha(slab, px, py, row_valid)
    one_m = 1.0 - alpha
    cp_incl = jnp.cumprod(one_m, axis=1)
    T_incl = T_in[:, None] * cp_incl
    alive = alpha > 0.0
    include = alive & (T_incl >= TRANSMITTANCE_EPS) & (~done[:, None])
    T_before = T_in[:, None] * (cp_incl / one_m)
    w = jnp.where(include, alpha * T_before, 0.0)

    feat = slab[ROW_FEAT : ROW_FEAT + n_feat]  # (C, K)
    color_add = jax.lax.dot_general(
        w, feat, (((1,), (1,)), ((), ())), preferred_element_type=slab.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )  # (P, C)

    rank = base_rank + jnp.arange(1, K + 1, dtype=jnp.int32)
    contrib = jnp.max(jnp.where(include, rank[None, :], 0), axis=1)

    done_out = done | jnp.any(alive & (T_incl < TRANSMITTANCE_EPS), axis=1)
    T_out = T_in * jnp.prod(jnp.where(include, one_m, 1.0), axis=1)
    return color_add, T_out, done_out, contrib, w, include, T_before


@partial(jax.jit, static_argnames=("grid_wh", "n_feat", "chunk"))
def blend_scan(
    inst,  # (I_pad, F_PAD) f32 instance table (instances are rows)
    tile_start,  # (T,) int32, chunk-aligned
    tile_count,  # (T,) int32
    *,
    grid_wh: tuple[int, int],
    n_feat: int,
    chunk: int = CHUNK,
):
    """Composite all tiles. Returns (color (T,P,C), T_final (T,P), n_contrib).

    n_contrib follows the reference's semantics (render.jl:114-126): 1-based
    index, within the tile's depth-sorted instance list, of the last
    composited instance for each pixel (0 if none).
    """
    gx, gy = grid_wh
    n_tiles = gx * gy
    I_pad, F = inst.shape
    n_chunks = I_pad // chunk
    P = TILE_PIXELS

    chunk_tile = (
        jnp.searchsorted(tile_start, jnp.arange(n_chunks, dtype=jnp.int32) * chunk, side="right")
        - 1
    ).astype(jnp.int32)
    chunk_tile = jnp.clip(chunk_tile, 0, n_tiles - 1)

    tiles = jnp.arange(n_tiles, dtype=jnp.int32)
    px_all, py_all = jax.vmap(pixel_coords_for_tile)(tiles % gx, tiles // gx)  # (T, P)

    def step(state, j):
        color, T, done, contrib = state
        t = chunk_tile[j]
        slab = jax.lax.dynamic_slice(inst, (j * chunk, jnp.int32(0)), (chunk, F)).T
        local = j * chunk - tile_start[t]
        row_valid = (jnp.arange(chunk, dtype=jnp.int32) + local) < tile_count[t]
        c_add, T_out, d_out, contrib_c, *_ = _chunk_forward(
            slab, px_all[t], py_all[t], row_valid, local, T[t], done[t], n_feat
        )
        color = color.at[t].add(c_add)
        T = T.at[t].set(T_out)
        done = done.at[t].set(d_out)
        contrib = contrib.at[t].max(contrib_c)
        return (color, T, done, contrib), None

    init = (
        jnp.zeros((n_tiles, P, n_feat), inst.dtype),
        jnp.ones((n_tiles, P), inst.dtype),
        jnp.zeros((n_tiles, P), bool),
        jnp.zeros((n_tiles, P), jnp.int32),
    )
    (color, T, _, contrib), _ = jax.lax.scan(step, init, jnp.arange(n_chunks, dtype=jnp.int32))
    return color, T, jax.lax.stop_gradient(contrib)
