"""Decompose the full train step: time the loss fwd+bwd, +probe grad,
+Adam, +stats, then the lax.scan chunk — locates overhead that standalone
op timings miss.

Usage: /opt/venv/bin/python benchmark/micro2.py
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
    print(f"  {name:<36} {ms:8.2f} ms")
    return out


def main():
    from gsplat_tpu.camera import Camera, look_at
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.ops.rasterize import RasterizerConfig, render
    from gsplat_tpu.train.losses import photometric_loss
    from gsplat_tpu.train.optim import adam_init, adam_update, OptimizationParams

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
    params = model.params()
    opt = adam_init(params)
    p = OptimizationParams()
    cap = model.capacity

    full = jax.jit(lambda a: render(*a, camera=cam, config=cfg, sh_degree=3)[0])
    tgt = full(model.render_args())[..., :3]

    def loss_from_params(params, probe):
        m = model.replace_params(params)
        img, aux = render(*m.render_args(), camera=cam, config=cfg, sh_degree=3,
                          means2d_probe=probe)
        loss, parts = photometric_loss(img[..., :3], tgt, 0.2)
        return loss, aux

    probe = jnp.zeros((cap, 2), jnp.float32)

    print("step decomposition (100k, 400k budget, rgb):")
    f1 = jax.jit(lambda pr: jax.value_and_grad(
        lambda q: loss_from_params(q, probe)[0])(pr))
    timeit("A: loss fwd+bwd (params)", f1, params)

    f2 = jax.jit(lambda pr: jax.value_and_grad(
        lambda q, b: loss_from_params(q, b)[0], argnums=(0, 1))(pr, probe))
    timeit("B: + probe grad", f2, params)

    lrs = p.lrs(0, 9.9)

    def step3(params, opt):
        (loss, _), (g, gp) = jax.value_and_grad(
            loss_from_params, argnums=(0, 1), has_aux=True)(params, probe)
        new_params, new_opt = adam_update(params, g, opt, lrs)
        return new_params, new_opt, loss, gp

    f3 = jax.jit(step3)
    timeit("C: + adam update", f3, params, opt)

    def step4(params, opt, max_radii, grad_accum, denom):
        (loss, aux), (g, gp) = jax.value_and_grad(
            loss_from_params, argnums=(0, 1), has_aux=True)(params, probe)
        new_params, new_opt = adam_update(params, g, opt, lrs)
        res_half = jnp.array([W, H], jnp.float32) * 0.5
        gnorm = jnp.linalg.norm(gp * res_half[None, :], axis=1)
        visible = aux["radii"] > 0
        mr = jnp.where(visible, jnp.maximum(max_radii, aux["radii"]), max_radii)
        ga = jnp.where(visible, grad_accum + gnorm, grad_accum)
        dn = jnp.where(visible, denom + 1.0, denom)
        packed = jnp.stack([loss, jnp.max(gnorm), aux["n_instances"].astype(jnp.float32)])
        return new_params, new_opt, mr, ga, dn, packed

    mr = jnp.zeros(cap, jnp.int32)
    ga = jnp.zeros(cap, jnp.float32)
    dn = jnp.zeros(cap, jnp.float32)
    f4 = jax.jit(step4)
    timeit("D: + stats/packed", f4, params, opt, mr, ga, dn)

    K = 20
    tgts = jnp.broadcast_to(tgt, (K,) + tgt.shape)

    def chunk(params, opt, mr, ga, dn, tgts):
        def body(carry, xs):
            params, opt, mr, ga, dn = carry
            tgt_k = xs

            def lf(params, probe):
                m = model.replace_params(params)
                img, aux = render(*m.render_args(), camera=cam, config=cfg,
                                  sh_degree=3, means2d_probe=probe)
                loss, parts = photometric_loss(img[..., :3], tgt_k, 0.2)
                return loss, aux

            (loss, aux), (g, gp) = jax.value_and_grad(
                lf, argnums=(0, 1), has_aux=True)(params, probe)
            new_params, new_opt = adam_update(params, g, opt, lrs)
            res_half = jnp.array([W, H], jnp.float32) * 0.5
            gnorm = jnp.linalg.norm(gp * res_half[None, :], axis=1)
            visible = aux["radii"] > 0
            mr2 = jnp.where(visible, jnp.maximum(mr, aux["radii"]), mr)
            ga2 = jnp.where(visible, ga + gnorm, ga)
            dn2 = jnp.where(visible, dn + 1.0, dn)
            packed = jnp.stack(
                [loss, jnp.max(gnorm), aux["n_instances"].astype(jnp.float32)])
            return (new_params, new_opt, mr2, ga2, dn2), packed

        (params, opt, mr, ga, dn), packs = jax.lax.scan(
            body, (params, opt, mr, ga, dn), tgts)
        return params, opt, mr, ga, dn, packs

    f5 = jax.jit(chunk)
    timeit("E: scan chunk (K=20), per step", f5, params, opt, mr, ga, dn, tgts, div=K)


if __name__ == "__main__":
    main()
