"""Time the round-2 continuation opt-ins on the real TPU:

- fused prologue, wide (8, G/8) vs narrow (1, G) sublane layout, fwd and
  fwd+bwd (ops/proj_fused.py GSPLAT_PROLOGUE_WIDE);
- instance-table gather: XLA take vs Pallas VMEM-resident gather
  (ops/gather_pallas.py GSPLAT_GATHER_PALLAS), fwd and fwd+bwd.

Usage: /opt/venv/bin/python benchmark/micro11.py
"""
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

N = 100_352
I = 380_928
REPS = 40


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    except Exception as e:
        print(f"  {name:<40} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"  {name:<40} {ms:8.3f} ms", flush=True)
    return out


def main():
    from gsplat_tpu.camera import Camera, look_at
    from gsplat_tpu.constants import RADIUS_CLIP
    from gsplat_tpu.ops import proj_fused

    rng = np.random.default_rng(0)
    n = N
    means = jnp.asarray(np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-4, 4, n), rng.uniform(-4, 4, n)], 1
    ).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    scales = jnp.asarray(np.exp(rng.uniform(-5, -3, (n, 3))).astype(np.float32))
    shs = jnp.asarray(rng.normal(0, 0.3, (n, 16, 3)).astype(np.float32))
    W, H = 976, 544
    R, t = look_at(np.array([7.0, 1.5, 0.5]), np.zeros(3))
    cam = Camera.create(R=R, t=t, width=W, height=H,
                        focal=np.array([0.7 * W, 0.7 * W], np.float32))
    res_wh = jnp.array([W, H], jnp.float32)
    pp = cam.principal * res_wh

    def run(wide):
        os.environ["GSPLAT_PROLOGUE_WIDE"] = wide

        def fwd(ms_, qs_, sc_, sh_):
            return proj_fused.project_and_sh_fused(
                ms_, qs_, sc_, sh_, cam.R, cam.t, cam.focal, pp, res_wh, 3,
                near_plane=0.2, far_plane=1e10, radius_clip=RADIUS_CLIP,
                with_normal=False)

        def loss(ms_, qs_, sc_, sh_):
            o = fwd(ms_, qs_, sc_, sh_)
            return (jnp.sum(o["mean_2d"] ** 2) + jnp.sum(o["rgb"])
                    + jnp.sum(o["conic"]) + jnp.sum(o["depth"]))

        f = jax.jit(fwd)
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
        timeit(f"prologue fwd     wide={wide}", f, means, quats, scales, shs)
        timeit(f"prologue fwd+bwd wide={wide}", g, means, quats, scales, shs)

    run("1")
    run("0")

    # --- gather -------------------------------------------------------------
    from gsplat_tpu.ops.gather_pallas import fits, gather_rows

    pack = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
    ids = np.asarray(rng.integers(0, N, I), np.int32)
    ids[rng.choice(I, I // 8, replace=False)] = -1
    ids = jnp.asarray(ids)
    assert fits(N, 16, I)

    def xla_take(p, i):
        safe = jnp.clip(i, 0, N - 1)
        return jnp.take(p, safe, axis=0) * (i >= 0).astype(p.dtype)[:, None]

    w = jnp.asarray(rng.normal(size=(I, 16)).astype(np.float32))
    for name, fn in (("xla take", xla_take), ("pallas gather", gather_rows)):
        timeit(f"gather fwd     {name}", jax.jit(fn), pack, ids)
        timeit(f"gather fwd+bwd {name}",
               jax.jit(jax.grad(lambda p, f=fn: jnp.sum(f(p, ids) * w))), pack)

    # --- SSIM blur: blocked vs full-band ------------------------------------
    from gsplat_tpu.train import losses

    img = jnp.asarray(rng.uniform(0, 1, (544, 976, 15)).astype(np.float32))
    x3 = jnp.asarray(rng.uniform(0, 1, (544, 976, 3)).astype(np.float32))
    y3 = jnp.asarray(rng.uniform(0, 1, (544, 976, 3)).astype(np.float32))
    orig = losses._block_size
    for name, bsf in (("blocked", orig), ("full-band", lambda n, **k: 0)):
        losses._block_size = bsf
        timeit(f"ssim blur fwd   {name}", jax.jit(losses._blur), img)
        timeit(f"ssim loss f+bwd {name}",
               jax.jit(jax.grad(lambda a: losses.ssim(a, y3))), x3)
    losses._block_size = orig


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    main()
