"""Per-Gaussian covisibility: which Gaussians are composited while the
pixel's transmittance is still above 0.5.

Reference semantics (render.jl:110-112): inside the forward blend, a
composited Gaussian is marked covisible at any pixel where T > 0.5 *before*
its own contribution. The reference writes a bool per Gaussian with a device
store from inside the kernel; here it is a separate lightweight pass over
the binned instance table (it is an occasional-use output — GUI pruning and
dataset tooling — so it does not tax the hot forward).

The per-pixel `uncertainties` output of the reference kernel
(render.jl:109) is `sum(alpha_i * T_i) = 1 - T_final` by telescoping, i.e.
identical to the alpha map the rasterizer already returns; `rasterize`
exposes it under `aux["uncertainty"]`.

Cost note: the pass is a SEQUENTIAL `lax.scan` over all I_pad/chunk
chunks (~3k serial steps at a 380k-instance budget, roughly the cost of
one extra forward blend). That is fine for its occasional-use role; if a
caller ever needs it per frame, respell the scan as a per-tile parallel
pass (each tile's chunks are independent — only `logT` carries across
chunks of the SAME tile, so a segmented scan over tiles parallelizes).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import CHUNK, TILE_PIXELS
from .blend_scan import chunk_alpha, pixel_coords_for_tile


@partial(jax.jit, static_argnames=("grid_wh", "n_gaussians", "chunk"))
def covisibility(
    inst,  # (I_pad, F_PAD) instance table
    padded_ids,  # (I_pad,) int32
    tile_start,  # (T,)
    tile_count,  # (T,)
    n_contrib,  # (T, P) int32 from the forward blend
    *,
    grid_wh: tuple,
    n_gaussians: int,
    chunk: int = CHUNK,
):
    """(N,) bool: marked if the Gaussian contributes to any pixel whose
    pre-contribution transmittance exceeds 0.5."""
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
    px_all, py_all = jax.vmap(pixel_coords_for_tile)(tiles % gx, tiles // gx)

    def step(carry, j):
        logT, marks = carry
        t = chunk_tile[j]
        slab = jax.lax.dynamic_slice(inst, (j * chunk, jnp.int32(0)), (chunk, F)).T
        local = j * chunk - tile_start[t]
        rank1 = local + 1 + jnp.arange(chunk, dtype=jnp.int32)
        row_valid = rank1 <= tile_count[t]
        alpha, _, _ = chunk_alpha(slab, px_all[t], py_all[t], row_valid)
        # Included instances: composited by the forward (rank <= n_contrib).
        include = (alpha > 0.0) & (rank1[None, :] <= n_contrib[t][:, None])
        alpha = jnp.where(include, alpha, 0.0)
        log1m = jnp.log1p(-alpha)
        s_excl = jnp.cumsum(log1m, axis=1) - log1m
        T_before = jnp.exp(logT[t][:, None] + s_excl)  # (P, K)
        flag = jnp.any(include & (T_before > 0.5), axis=0)  # (K,)
        marks = jax.lax.dynamic_update_slice(
            marks, jnp.logical_or(jax.lax.dynamic_slice(marks, (j * chunk,), (chunk,)), flag),
            (j * chunk,),
        )
        logT = logT.at[t].add(jnp.sum(log1m, axis=1))
        return (logT, marks), None

    init = (jnp.zeros((n_tiles, P), inst.dtype), jnp.zeros((I_pad,), bool))
    (_, marks), _ = jax.lax.scan(step, init, jnp.arange(n_chunks, dtype=jnp.int32))

    ids = jnp.clip(padded_ids, 0, max(n_gaussians - 1, 0))
    marks = marks & (padded_ids >= 0)
    return jnp.zeros((n_gaussians,), bool).at[ids].max(marks, mode="drop")
