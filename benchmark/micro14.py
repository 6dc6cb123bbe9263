"""Probe: instance-gather backward spellings vs scale (round-4 target #1).

The autodiff-transpose scatter-add costs ~1.2 ms in-pipeline at a 380k
instance budget but ~82 ms at the protocol's 1.12M scale (half the step's
device time) — the TPU scatter lowering degrades super-linearly. This
measures, at several (N gaussians, I instances) scales built by the REAL
binning pipeline:

  - fwd: the (I/8,8)-shaped row gather
  - bwd scatter: zeros.at[ids].add(ct)           (the r3 default)
  - bwd segsum:  sort + gather + Pallas segsum + ends-gather (round 4)
  - bwd segscan: sort + gather + XLA log-level scan (r3 opt-in)

to place the crossover for rasterize._SEGSUM_MIN_INSTANCES.

Usage: /opt/venv/bin/python benchmark/micro14.py   (run on the real TPU)
"""
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from importlib import import_module

R = import_module("gsplat_tpu.ops.rasterize")
tiles = import_module("gsplat_tpu.ops.tiles")

F = 16
REPS = 30


def timeit(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _i in range(REPS):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"  {name:<46} {ms:8.3f} ms", flush=True)
    return out


def scale_case(rng, n_gauss, max_instances, grid):
    """Realistic binning at this scale: clustered splats over the grid."""
    W, H = grid[0] * 16, grid[1] * 16
    mean_2d = jnp.asarray(
        np.stack([rng.uniform(0, W, n_gauss), rng.uniform(0, H, n_gauss)], 1)
        .astype(np.float32)
    )
    depth = jnp.asarray(rng.uniform(1, 10, n_gauss).astype(np.float32))
    # radius mix tuned so chunk-aligned demand ~= 0.8 * budget: real
    # instances fill 0.8*budget minus the expected half-chunk pad per tile.
    r = rng.integers(0, 30, n_gauss)
    r[rng.random(n_gauss) < 0.3] = 0
    area = ((2 * r / 16 + 1) ** 2).sum()
    target = max(0.8 * max_instances - 64 * grid[0] * grid[1], 1e4)
    r = np.round(r * np.sqrt(target / max(area, 1))).astype(np.int32)
    radius = jnp.asarray(np.minimum(r, 127).astype(np.int32))
    b = tiles.build_instances(
        mean_2d, depth, radius, grid_wh=grid, max_instances=max_instances
    )
    print(
        f"  n_instances={int(b['n_instances'])} p={int(b['p_instances'])} "
        f"overflow={bool(b['overflow'])}"
    )
    return b


def main():
    rng = np.random.default_rng(0)
    for n_gauss, budget, grid in [
        (100_352, 384 * 1024, (61, 34)),  # the bench operating point
        (300_032, 640 * 1024, (78, 52)),
        (500_224, 896 * 1024, (78, 52)),
        (736_256, 1152 * 1024, (78, 52)),  # the protocol operating point
    ]:
        print(f"N={n_gauss} budget={budget} ({budget // 1024}k) grid={grid}:", flush=True)
        b = scale_case(rng, n_gauss, budget, grid)
        ids = b["padded_ids"]
        offsets = b["gm_offsets"]
        counts = b["tile_count_per_gaussian"]
        pack = jnp.asarray(rng.normal(size=(n_gauss, F)).astype(np.float32))
        ct = jnp.asarray(rng.normal(size=(ids.shape[0], F)).astype(np.float32))
        max_run = grid[0] * grid[1]

        timeit(
            "fwd row gather",
            jax.jit(lambda p, i: R._gather_rows_fwd_impl(p, i)),
            pack, ids,
        )
        for mode in ("scatter", "segsum", "segscan"):
            os.environ["GSPLAT_GATHER_BWD"] = mode

            def bwd(ct, ids=ids, offsets=offsets, counts=counts):
                res = (ids, offsets, counts, pack.shape[0])
                return R._gather_rows_vjp_bwd(max_run, res, ct)[0]

            try:
                timeit(f"bwd {mode}", jax.jit(bwd), ct)
            except Exception as e:
                print(f"  bwd {mode} FAILED: {type(e).__name__}: {str(e)[:200]}")
        os.environ.pop("GSPLAT_GATHER_BWD", None)

        # Cross-check the three modes agree at this scale.
        outs = {}
        for mode in ("scatter", "segsum"):
            os.environ["GSPLAT_GATHER_BWD"] = mode
            res = (ids, offsets, counts, pack.shape[0])
            outs[mode] = np.asarray(R._gather_rows_vjp_bwd(max_run, res, ct)[0])
        os.environ.pop("GSPLAT_GATHER_BWD", None)
        d = np.abs(outs["scatter"] - outs["segsum"]).max()
        print(f"  max|scatter - segsum| = {d:.3e}")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    main()
