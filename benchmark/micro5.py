"""Blend kernel per-grid-step (per-tile) overhead isolation.

Same TOTAL instance work, different tile counts: if the kernel were
compute/DMA-bound, all variants would cost the same; the spread between
them is the per-grid-step fixed overhead (scalar reads, constant
rematerialization, loop/DMA latency) times the tile count. This decides
whether batching TB tiles per grid step is the right next blend move.

Usage: /opt/venv/bin/python benchmark/micro5.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

REPS = 30


def timeit(name, fn, *args):
    out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ravel")]
    _ = np.asarray(leaves[0].ravel()[0])
    t0 = time.perf_counter()
    for _i in range(REPS):
        out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ravel")]
    _ = np.asarray(leaves[0].ravel()[0])
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"  {name:<52} {ms:8.2f} ms", flush=True)
    return out


def run_case(n_tiles_used, chunks_per_tile, grid_wh, label):
    from gsplat_tpu.constants import CHUNK
    from gsplat_tpu.ops.blend_scan import F_PAD
    from gsplat_tpu.ops.blend_pallas import blend_pallas

    rng = np.random.default_rng(0)
    T = grid_wh[0] * grid_wh[1]
    count = np.zeros(T, np.int32)
    count[:n_tiles_used] = chunks_per_tile * CHUNK
    pcount = -(-count // CHUNK) * CHUNK
    start = np.concatenate([[0], np.cumsum(pcount)[:-1]]).astype(np.int32)
    i_pad = max(int(pcount.sum()), 8 * CHUNK)
    i_pad = -(-i_pad // (8 * CHUNK)) * (8 * CHUNK)

    inst = np.zeros((i_pad, F_PAD), np.float32)
    # Plausible in-tile splats: centers anywhere in the tile's pixel rect.
    for t in range(n_tiles_used):
        s, c = start[t], count[t]
        tx, ty = t % grid_wh[0], t // grid_wh[0]
        inst[s:s+c, 0] = rng.uniform(tx*16, tx*16+16, c)
        inst[s:s+c, 1] = rng.uniform(ty*16, ty*16+16, c)
        inst[s:s+c, 2] = 0.05
        inst[s:s+c, 4] = 0.05
        inst[s:s+c, 5] = rng.uniform(0.01, 0.3, c)
        inst[s:s+c, 6:9] = rng.uniform(0, 1, (c, 3))

    instj = jnp.asarray(inst)
    startj = jnp.asarray(start)
    countj = jnp.asarray(count)
    fn = jax.jit(lambda i, s, c: blend_pallas(i, s, c, grid_wh=grid_wh, n_feat=3))
    timeit(label, fn, instj, startj, countj)


def main():
    grid = (61, 34)  # 976x544 -> 2074 tiles
    # ~2048 chunk-slabs of work in every case:
    run_case(2048, 1, grid, "2048 tiles x 1 chunk   (2074-tile grid)")
    run_case(1024, 2, grid, "1024 tiles x 2 chunks")
    run_case(512, 4, grid, "512 tiles x 4 chunks")
    run_case(256, 8, grid, "256 tiles x 8 chunks")
    run_case(128, 16, grid, "128 tiles x 16 chunks")
    big = (120, 68)  # 1080p grid, 8160 tiles
    run_case(8160, 1, big, "8160 tiles x 1 chunk   (1080p grid)")
    run_case(1020, 8, big, "1020 tiles x 8 chunks  (1080p grid)")


if __name__ == "__main__":
    main()
