"""Scan-dispatch overhead bisect: why does the SAME fwd+bwd cost ~6 ms more
per step inside lax.scan than as standalone jit dispatches?

Variants (all bench-scene, 100k gaussians, 976x544, pallas, rendered GT):
  A  standalone jit fwd+bwd+loss, pipelined dispatches, fetch once
  B  jit(python-chain of K steps)  — chaining without lax.scan
  C  lax.scan K, carry = params only (grads applied with plain sgd)
  D  lax.scan K, donated carry
  E  lax.scan K, same target every step (no stacked-target slicing)

Usage: /opt/venv/bin/python benchmark/micro4.py
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
    print(f"  {name:<44} {ms:8.2f} ms", flush=True)
    return out


def main():
    from gsplat_tpu.camera import Camera, look_at
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.ops.rasterize import RasterizerConfig, rasterize
    from gsplat_tpu.train.losses import photometric_loss

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

    means, opac_raw, scales_raw, rots, sh_dc, sh_rest = model.render_args()
    params = {
        "means": means, "opac": opac_raw, "scales": scales_raw,
        "rots": rots, "sh_dc": sh_dc, "sh_rest": sh_rest,
    }

    def fwd(p, camera):
        opacities = jax.nn.sigmoid(p["opac"])
        sc = jnp.broadcast_to(jnp.exp(p["scales"]), (N, 3))
        shs = jnp.concatenate([p["sh_dc"], p["sh_rest"]], axis=1)
        img, _ = rasterize(
            p["means"], p["rots"], sc, opacities, shs,
            camera=camera, config=cfg, sh_degree=3,
        )
        return img[..., :3]

    target = jax.jit(lambda p: fwd(p, cam))(params)
    target = jnp.asarray(np.asarray(target))

    def loss(p, tgt):
        l, _parts = photometric_loss(fwd(p, cam), tgt)
        return l

    grad1 = jax.jit(jax.grad(loss))

    # --- A: standalone dispatches ---------------------------------------
    timeit("A standalone jit grad, per step", lambda: grad1(params, target))

    # --- B: python chain of K inside one jit ----------------------------
    @jax.jit
    def chain(p, tgt):
        for _ in range(K):
            g = jax.grad(loss)(p, tgt)
            p = jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, p, g)
        return p

    timeit(f"B jit python-chain K={K}, per step", lambda: chain(params, target), div=K)

    # --- C: lax.scan, params carry --------------------------------------
    tgts = jnp.broadcast_to(target, (K, H, W, 3)) + 0.0

    @jax.jit
    def scanned(p, ts):
        def body(p, tgt):
            g = jax.grad(loss)(p, tgt)
            p = jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, p, g)
            return p, jnp.float32(0)
        p, _ = jax.lax.scan(body, p, ts)
        return p

    timeit(f"C lax.scan K={K} stacked targets, per step",
           lambda: scanned(params, tgts), div=K)

    # --- D: donated scan ------------------------------------------------
    scan_don = jax.jit(scanned, donate_argnums=(0,))
    p2 = jax.tree_util.tree_map(lambda a: a + 0, params)
    out = timeit(f"D donated lax.scan K={K}, per step",
                 lambda: scan_don(jax.tree_util.tree_map(lambda a: a + 0, params), tgts),
                 div=K)

    # --- E: scan with shared target (no slicing) ------------------------
    @jax.jit
    def scanned_same(p, tgt):
        def body(p, _):
            g = jax.grad(loss)(p, tgt)
            p = jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, p, g)
            return p, jnp.float32(0)
        p, _ = jax.lax.scan(body, p, jnp.arange(K))
        return p

    timeit(f"E lax.scan K={K} shared target, per step",
           lambda: scanned_same(params, target), div=K)


if __name__ == "__main__":
    main()
