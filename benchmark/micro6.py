"""Full-train-step cost decomposition: start from the plain photometric
fwd+bwd scan (micro4 C, ~22.7 ms/step at the bench config) and add the
trainer's pieces one at a time until the real chunk cost (~32 ms) is
reproduced — whichever increment jumps is the optimization target.

Usage: /opt/venv/bin/python benchmark/micro6.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

REPS = 20
K = 8


def timeit(name, fn, *args, div=K):
    out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ravel")]
    _ = np.asarray(leaves[0].ravel()[0])
    t0 = time.perf_counter()
    for _i in range(REPS):
        out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ravel")]
    _ = np.asarray(leaves[0].ravel()[0])
    ms = (time.perf_counter() - t0) / REPS / div * 1e3
    print(f"  {name:<52} {ms:8.2f} ms", flush=True)
    return out


def main():
    from gsplat_tpu.camera import Camera, look_at
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.ops.rasterize import RasterizerConfig, rasterize
    from gsplat_tpu.train.losses import photometric_loss
    from gsplat_tpu.train.optim import OptimizationParams, adam_init, adam_update

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
    p = OptimizationParams()

    params = model.params()
    cap = model.capacity

    def fwd(prm, probe):
        m = model.replace_params(prm)
        img, aux = rasterize(
            m.points, m.rotations,
            jnp.broadcast_to(jnp.exp(m.scales), (cap, 3)),
            jax.nn.sigmoid(m.masked_opacities()),
            jnp.concatenate([m.features_dc, m.features_rest], axis=1),
            camera=cam, config=cfg, sh_degree=3,
            means2d_probe=probe,
        )
        return img[..., :3], aux

    target = jax.jit(lambda prm: fwd(prm, None)[0])(params)
    target = jnp.asarray(np.asarray(target))

    def loss_plain(prm, tgt):
        img, _ = fwd(prm, None)
        l, _ = photometric_loss(img, tgt)
        return l

    # --- base: photometric grads only, sgd ------------------------------
    @jax.jit
    def base(prm, tgt):
        def body(prm, _):
            g = jax.grad(loss_plain)(prm, tgt)
            prm = jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, prm, g)
            return prm, jnp.float32(0)
        prm, _ = jax.lax.scan(body, prm, jnp.arange(K))
        return prm
    timeit("base: photometric grad + sgd", lambda: base(params, target))

    # --- +adam ------------------------------------------------------------
    opt = adam_init(params)
    extent = 9.9

    @jax.jit
    def with_adam(prm, opt, tgt):
        def body(carry, i):
            prm, opt = carry
            g = jax.grad(loss_plain)(prm, tgt)
            lrs = p.lrs(i, extent)
            prm, opt = adam_update(prm, g, opt, lrs)
            return (prm, opt), jnp.float32(0)
        (prm, opt), _ = jax.lax.scan(body, (prm, opt), jnp.arange(K))
        return prm
    timeit("+ adam (real lrs, opt carry)", lambda: with_adam(params, opt, target))

    # --- +probe argnum ----------------------------------------------------
    def loss_probe(prm, probe, tgt):
        img, _ = fwd(prm, probe)
        l, _ = photometric_loss(img, tgt)
        return l

    @jax.jit
    def with_probe(prm, opt, tgt):
        def body(carry, i):
            prm, opt = carry
            probe = jnp.zeros((cap, 2), jnp.float32)
            g, gp = jax.grad(loss_probe, argnums=(0, 1))(prm, probe, tgt)
            lrs = p.lrs(i, extent)
            prm, opt = adam_update(prm, g, opt, lrs)
            return (prm, opt), jnp.max(gp)
        (prm, opt), _ = jax.lax.scan(body, (prm, opt), jnp.arange(K))
        return prm
    timeit("+ means2d probe grad", lambda: with_probe(params, opt, target))

    # --- +stats + metrics pack ---------------------------------------------
    from gsplat_tpu.train.losses import l1 as l1_fn, ssim as ssim_fn

    def loss_full(prm, probe, tgt):
        img, aux = fwd(prm, probe)
        l, parts = photometric_loss(img, tgt)
        return l, (parts, aux)

    @jax.jit
    def with_stats(prm, opt, tgt):
        stats = (jnp.zeros((cap,), jnp.float32), jnp.zeros((cap,), jnp.float32),
                 jnp.zeros((cap,), jnp.int32))
        def body(carry, i):
            prm, opt, stats = carry
            probe = jnp.zeros((cap, 2), jnp.float32)
            (l, (parts, aux)), (g, gp) = jax.value_and_grad(
                loss_full, argnums=(0, 1), has_aux=True)(prm, probe, tgt)
            lrs = p.lrs(i, extent)
            prm, opt = adam_update(prm, g, opt, lrs)
            ga, dn, mr = stats
            gnorm = jnp.linalg.norm(gp * jnp.array([W, H]) * 0.5, axis=-1)
            vis = aux["radii"] > 0
            stats = (ga + jnp.where(vis, gnorm, 0.0),
                     dn + vis.astype(jnp.float32),
                     jnp.maximum(mr, aux["radii"]))
            packed = jnp.stack([l, parts["l1"], parts["ssim"],
                                aux["overflow"].astype(jnp.float32)])
            return (prm, opt, stats), packed
        (prm, opt, stats), packs = jax.lax.scan(body, (prm, opt, stats), jnp.arange(K))
        return prm, packs
    timeit("+ stats probe-norm + radii + packed", lambda: with_stats(params, opt, target))


if __name__ == "__main__":
    main()
