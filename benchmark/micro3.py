"""Backward-path and scan-overhead micro-timings + bench-scene demand.

Usage: /opt/venv/bin/python benchmark/micro3.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

REPS = 30


def timeit(name, fn, *args, div=1):
    out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ravel")]
    _ = np.asarray(leaves[0].ravel()[0])
    t0 = time.perf_counter()
    for _i in range(REPS):
        out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ravel")]
    _ = np.asarray(leaves[0].ravel()[0])
    ms = (time.perf_counter() - t0) / REPS / div * 1e3
    print(f"  {name:<40} {ms:8.2f} ms")
    return out


def main():
    from gsplat_tpu.camera import Camera, look_at
    from gsplat_tpu.constants import RADIUS_CLIP
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.ops import tiles
    from gsplat_tpu.ops.blend_pallas import blend_pallas
    from gsplat_tpu.ops.proj_fused import project_and_sh_fused
    from gsplat_tpu.ops.rasterize import RasterizerConfig, _gather_instance_table, render

    rng = np.random.default_rng(0)
    N = 100_000
    W, H = 976, 544
    pts = np.stack(
        [rng.uniform(-4, 4, N), rng.uniform(-4, 4, N), rng.uniform(-4, 4, N)], 1
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    model = GaussianModel.create(pts, cols, np.full(N, 0.01, np.float32), max_sh_degree=3)
    R, t = look_at(np.array([9.0, 1.0, 0.0]), np.zeros(3))
    cam = Camera.create(R=R, t=t, width=W, height=H,
                        focal=np.array([0.7 * W, 0.7 * W], np.float32))
    cfg = RasterizerConfig(width=W, height=H, mode="rgb",
                           max_instances=400_000, impl="pallas")

    margs = model.render_args()
    means, opac_raw, scales_raw, rots, sh_dc, sh_rest = margs
    opacities = jax.nn.sigmoid(opac_raw)
    sc = jnp.broadcast_to(jnp.exp(scales_raw), (N, 3))
    shs = jnp.concatenate([sh_dc, sh_rest], axis=1)
    res_wh = jnp.array([W, H], jnp.float32)
    principal_px = cam.principal * res_wh

    prologue = lambda m, q, s, sh: project_and_sh_fused(
        m, q, s, sh, cam.R, cam.t, cam.focal, principal_px, res_wh, 3,
        near_plane=0.2, far_plane=1e4, radius_clip=RADIUS_CLIP, with_normal=False)
    proj = jax.jit(prologue)(means, rots, sc, shs)
    timeit("prologue fwd+bwd",
           jax.jit(jax.grad(lambda m, q, s, sh: (
               jnp.sum(prologue(m, q, s, sh)["rgb"])
               + jnp.sum(prologue(m, q, s, sh)["mean_2d"])))),
           means, rots, sc, shs)

    binned = jax.jit(lambda m2, d, r: tiles.build_instances(
        m2, d, r, grid_wh=cfg.grid_wh, max_instances=400_000, chunk=128))(
        proj["mean_2d"], proj["depth"], proj["radius"])
    print("  bench-scene demand: p_instances =", int(binned["p_instances"]),
          " n_instances =", int(binned["n_instances"]))

    table = jax.jit(_gather_instance_table)(
        binned["padded_ids"], proj["mean_2d"], proj["conic"], opacities, proj["rgb"])

    bl = lambda tb: blend_pallas(tb, binned["tile_start"], binned["tile_count"],
                                 grid_wh=cfg.grid_wh, n_feat=3, chunk=128)[0]
    timeit("blend fwd", jax.jit(lambda tb: bl(tb)), table)
    timeit("blend fwd+bwd", jax.jit(jax.grad(lambda tb: jnp.sum(bl(tb)))), table)

    # scan overhead variants
    params = model.params()
    from gsplat_tpu.train.losses import photometric_loss
    from gsplat_tpu.train.optim import adam_init, adam_update, OptimizationParams
    opt = adam_init(params)
    p = OptimizationParams()
    lrs = p.lrs(0, 9.9)
    tgt = jax.jit(lambda a: render(*a, camera=cam, config=cfg, sh_degree=3)[0])(
        margs)[..., :3]
    K = 8
    tgts = jnp.broadcast_to(tgt, (K,) + tgt.shape)

    def body(carry, tgt_k):
        params, opt = carry

        def lf(params):
            m = model.replace_params(params)
            img, aux = render(*m.render_args(), camera=cam, config=cfg, sh_degree=3)
            return photometric_loss(img[..., :3], tgt_k, 0.2)[0]

        loss, g = jax.value_and_grad(lf)(params)
        new_params, new_opt = adam_update(params, g, opt, lrs)
        return (new_params, new_opt), loss

    def chunk(params, opt, tgts, unroll):
        (params, opt), losses = jax.lax.scan(body, (params, opt), tgts, unroll=unroll)
        return params, opt, losses

    timeit("scan K=8 unroll=1, per step",
           jax.jit(lambda a, b, c: chunk(a, b, c, 1)), params, opt, tgts, div=K)
    timeit("scan K=8 unroll=2, per step",
           jax.jit(lambda a, b, c: chunk(a, b, c, 2)), params, opt, tgts, div=K)
    timeit("scan K=8 donated, per step",
           jax.jit(lambda a, b, c: chunk(a, b, c, 1), donate_argnums=(0, 1)),
           params, opt, tgts, div=K)


if __name__ == "__main__":
    main()
