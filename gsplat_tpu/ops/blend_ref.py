"""Independent sequential blend in numpy — test oracle only.

A direct, scalar, front-to-back compositing loop with the semantics of the
reference's `render!` kernel (src/rasterization/render.jl:1-130): per pixel,
walk the tile's depth-sorted instances, skip σ<0 and α<1/255, cap α at 0.99,
stop when T·(1−α) < 1e-4. Deliberately written sequentially (no scans, no
matmuls) so it shares no structure with the chunked formulation it checks.
"""
from __future__ import annotations

import numpy as np

from ..constants import ALPHA_MAX, ALPHA_MIN, TILE, TILE_PIXELS, TRANSMITTANCE_EPS
from .blend_scan import (
    ROW_CONIC_A,
    ROW_CONIC_B,
    ROW_CONIC_C,
    ROW_FEAT,
    ROW_OPACITY,
    ROW_X,
    ROW_Y,
)


def blend_ref(inst, tile_start, tile_count, *, grid_wh, n_feat):
    """Returns (color (T,P,C), T_final (T,P), n_contrib (T,P)) as numpy."""
    inst = np.asarray(inst, np.float32)
    tile_start = np.asarray(tile_start)
    tile_count = np.asarray(tile_count)
    gx, gy = grid_wh
    n_tiles = gx * gy
    P = TILE_PIXELS

    color = np.zeros((n_tiles, P, n_feat), np.float32)
    T_final = np.ones((n_tiles, P), np.float32)
    n_contrib = np.zeros((n_tiles, P), np.int32)

    for t in range(n_tiles):
        ty, tx = divmod(t, gx)
        s, c = int(tile_start[t]), int(tile_count[t])
        rows = inst[s : s + c].T  # (F, c): features x instances
        for k in range(P):
            px = np.float32(tx * TILE + k % TILE)
            py = np.float32(ty * TILE + k // TILE)
            T = np.float32(1.0)
            for j in range(c):
                dx = rows[ROW_X, j] - px
                dy = rows[ROW_Y, j] - py
                sigma = (
                    rows[ROW_CONIC_B, j] * dx * dy
                    + np.float32(0.5)
                    * (rows[ROW_CONIC_A, j] * dx * dx + rows[ROW_CONIC_C, j] * dy * dy)
                )
                if sigma < 0.0:
                    continue
                alpha = min(np.float32(ALPHA_MAX), rows[ROW_OPACITY, j] * np.exp(-sigma))
                if alpha < ALPHA_MIN:
                    continue
                T_tmp = T * (np.float32(1.0) - alpha)
                if T_tmp < TRANSMITTANCE_EPS:
                    break
                color[t, k] += rows[ROW_FEAT : ROW_FEAT + n_feat, j] * alpha * T
                T = T_tmp
                n_contrib[t, k] = j + 1
            T_final[t, k] = T
    return color, T_final, n_contrib
