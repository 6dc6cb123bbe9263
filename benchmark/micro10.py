"""Blend kernel: direct VPU sigma vs monomial-basis MXU sigma (sigma_mm).

Times forward and forward+backward at the bench config (100k gaussians,
976x544) for sigma_mm off/on and TB (tiles-per-step) variants, and checks
numerical agreement between the two paths on real binned data.

Usage: /opt/venv/bin/python benchmark/micro10.py
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
    try:
        out = fn(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ravel")]
        _ = np.asarray(leaves[0].ravel()[0])
    except Exception as e:
        print(f"  {name:<52} FAILED: {type(e).__name__}: {str(e)[:240]}")
        return None
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
    from gsplat_tpu.ops.rasterize import _gather_instance_table
    from gsplat_tpu.constants import RADIUS_CLIP

    rng = np.random.default_rng(0)
    N = 100_000
    W, H = 976, 544
    grid = tiles.tile_grid(W, H)
    I = 380_928
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
    opac = jax.nn.sigmoid(model.masked_opacities())
    binned = jax.jit(lambda m, d, r: tiles.build_instances(
        m, d, r, grid_wh=grid, max_instances=I, chunk=128))(
        mean_2d, jnp.asarray(proj["depth"]), jnp.asarray(proj["radius"]))
    pid = binned["padded_ids"]
    ts, tc = binned["tile_start"], binned["tile_count"]
    inst = jax.jit(lambda ids: _gather_instance_table(
        ids, mean_2d, jnp.asarray(proj["conic"]), opac, jnp.asarray(proj["rgb"])))(pid)

    outs = {}
    for mm in (False, True):
        for tb in (1, 2, 4):
            tag = f"mm={int(mm)} tb={tb}"
            fwd = jax.jit(lambda i_, s, c, mm=mm, tb=tb: blend_pallas(
                i_, s, c, grid_wh=grid, n_feat=3, tiles_per_step=tb, sigma_mm=mm))
            outs[(mm, tb)] = timeit(f"blend fwd   {tag}", fwd, inst, ts, tc)

        for tb in (1, 2, 4):
            def b_loss(i_, mm=mm, tb=tb):
                color, T, _ = blend_pallas(
                    i_, ts, tc, grid_wh=grid, n_feat=3, tiles_per_step=tb,
                    sigma_mm=mm)
                return jnp.sum(color) + jnp.sum(T)

            timeit(f"blend fwd+bwd mm={int(mm)} tb={tb}",
                   jax.jit(jax.grad(b_loss)), inst)

    ref = outs.get((False, 1))
    got = outs.get((True, 1))
    if ref is not None and got is not None:
        dc = float(jnp.abs(got[0] - ref[0]).max())
        dT = float(jnp.abs(got[1] - ref[1]).max())
        dn = int(jnp.abs(got[2] - ref[2]).max())
        print(f"  parity: max|dcolor|={dc:.3e} max|dT|={dT:.3e} max|dn_contrib|={dn}")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    main()
