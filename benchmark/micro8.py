"""Backward-path + binning-internal component timings at the bench config.

Usage: /opt/venv/bin/python benchmark/micro8.py
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


def main():
    from gsplat_tpu.camera import Camera, look_at
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.ops import tiles
    from gsplat_tpu.ops.blend_pallas import blend_pallas
    from gsplat_tpu.ops.proj_fused import project_and_sh_fused
    from gsplat_tpu.ops.rasterize import RasterizerConfig, _gather_instance_table
    from gsplat_tpu.constants import RADIUS_CLIP

    rng = np.random.default_rng(0)
    N = 100_000
    W, H = 976, 544
    grid = tiles.tile_grid(W, H)
    I = 380_928  # the auto-fitted bench budget
    pts = np.stack(
        [rng.uniform(-4, 4, N), rng.uniform(-4, 4, N), rng.uniform(-4, 4, N)], 1
    ).astype(np.float32)
    model = GaussianModel.create(
        pts, rng.uniform(0, 1, (N, 3)).astype(np.float32),
        np.full(N, 0.01, np.float32), max_sh_degree=3,
    )
    R, t = look_at(np.array([9.0, 1.0, 0.0]), np.zeros(3))
    cam = Camera.create(R=R, t=t, width=W, height=H,
                        focal=np.array([0.7 * W, 0.7 * W], np.float32))
    res_wh = jnp.array([W, H], jnp.float32)
    pp = cam.principal * res_wh

    proj = jax.jit(lambda: project_and_sh_fused(
        model.points, model.rotations,
        jnp.broadcast_to(jnp.exp(model.scales), (N, 3)),
        jnp.concatenate([model.features_dc, model.features_rest], 1),
        cam.R, cam.t, cam.focal, pp, res_wh, 3,
        near_plane=0.2, far_plane=1e10, radius_clip=RADIUS_CLIP, with_normal=False,
    ))()
    mean_2d = jnp.asarray(proj["mean_2d"])
    depth = jnp.asarray(proj["depth"])
    radius = jnp.asarray(proj["radius"])
    conic = jnp.asarray(proj["conic"])
    opac = jax.nn.sigmoid(model.masked_opacities())
    rgbs = jnp.asarray(proj["rgb"])

    bin_fn = jax.jit(lambda m, d, r: tiles.build_instances(
        m, d, r, grid_wh=grid, max_instances=I, chunk=128))
    binned = timeit("bin total", bin_fn, mean_2d, depth, radius)
    pid = binned["padded_ids"]
    ts, tc = binned["tile_start"], binned["tile_count"]
    print(f"    demand: {int(binned['p_instances'])} of {I}", flush=True)

    # --- binning internals ----------------------------------------------
    rmin, rmax = tiles.tile_rect(mean_2d, radius, grid)
    rect_w = rmax[:, 0] - rmin[:, 0]
    counts = jnp.where(radius > 0, jnp.maximum(rect_w * (rmax[:, 1] - rmin[:, 1]), 0), 0)
    I_pad = pid.shape[0]

    key_t = jnp.asarray(rng.integers(0, 2074, I_pad), jnp.uint32)
    key_d = jnp.asarray(rng.integers(0, 1 << 30, I_pad), jnp.uint32)
    val = jnp.arange(I_pad, dtype=jnp.int32)
    timeit("sort two-key (tile, depth) + 1 val", jax.jit(
        lambda a, b, v: jax.lax.sort((a, b, v), num_keys=2)), key_t, key_d, val)
    key1 = (key_t << jnp.uint32(19)) | (key_d >> jnp.uint32(13))
    timeit("sort single u32 key + 1 val (old)", jax.jit(
        lambda k, v: jax.lax.sort_key_val(k, v)), key1, val)

    idx = jnp.asarray(rng.integers(0, I_pad, N), jnp.int32)
    vals = jnp.asarray(rng.integers(1, N, N), jnp.int32)
    timeit("marker scatter-max (N -> I)", jax.jit(
        lambda i, v: jnp.zeros((I_pad,), jnp.int32).at[i].max(v, mode="drop")), idx, vals)
    mk = jnp.zeros((I_pad,), jnp.int32).at[idx].max(vals, mode="drop")
    timeit("cummax (I)", jax.jit(jax.lax.cummax), mk)

    # --- gather + transpose ----------------------------------------------
    gather = jax.jit(lambda ids: _gather_instance_table(ids, mean_2d, conic, opac, rgbs))
    inst = timeit("gather fwd (I rows of 16)", gather, pid)

    def g_loss(m2, c, o, f):
        t_ = _gather_instance_table(pid, m2, c, o, f)
        return jnp.sum(t_ * 0.5)

    timeit("gather fwd+bwd (transpose scatter-add)",
           jax.jit(jax.grad(g_loss, argnums=(0, 1, 2, 3))), mean_2d, conic, opac, rgbs)

    # --- blend fwd / fwd+bwd ----------------------------------------------
    blend = jax.jit(lambda i_, s, c: blend_pallas(i_, s, c, grid_wh=grid, n_feat=3))
    timeit("blend fwd", blend, inst, ts, tc)

    def b_loss(i_):
        color, T, _ = blend_pallas(i_, ts, tc, grid_wh=grid, n_feat=3)
        return jnp.sum(color) + jnp.sum(T)

    timeit("blend fwd+bwd", jax.jit(jax.grad(b_loss)), inst)


if __name__ == "__main__":
    main()
