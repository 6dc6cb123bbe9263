"""Per-stage timing of the training pipeline on the real TPU.

Times each pipeline stage in isolation (jitted, fetch-terminated — see
CLAUDE.md on why block_until_ready can't be trusted through the tunnel),
then the composed forward / forward+backward / full train chunk, so the
optimization target is always the measured bottleneck, not a guess.

Usage:  /opt/venv/bin/python benchmark/stages.py [n_gaussians] [width] [height]
"""
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
W = int(sys.argv[2]) if len(sys.argv) > 2 else 976
H = int(sys.argv[3]) if len(sys.argv) > 3 else 544
REPS = int(os.environ.get("STAGE_REPS", 40))


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
    print(f"  {name:<28} {ms:8.2f} ms")
    return out, ms


def main():
    from gsplat_tpu.camera import Camera, look_at
    from gsplat_tpu.constants import RADIUS_CLIP
    from gsplat_tpu.data.colmap import ColmapDataset
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.ops import tiles
    from gsplat_tpu.ops.blend_pallas import blend_pallas
    from gsplat_tpu.ops.proj_fused import project_and_sh_fused
    from gsplat_tpu.ops.rasterize import (
        RasterizerConfig,
        _gather_instance_table,
        render,
    )
    from gsplat_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    pts = np.stack(
        [rng.uniform(-4, 4, N), rng.uniform(-4, 4, N), rng.uniform(-4, 4, N)], 1
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    scales = np.full(N, 0.01, np.float32)
    model = GaussianModel.create(pts, cols, scales, max_sh_degree=3)
    R, t = look_at(np.array([9.0, 1.0, 0.0]), np.zeros(3))
    cam = Camera.create(
        R=R, t=t, width=W, height=H,
        focal=np.array([0.7 * W, 0.7 * W], np.float32),
    )
    max_instances = int(os.environ.get("BENCH_MAX_INSTANCES", max(4 * N, 1 << 16)))
    cfg = RasterizerConfig(width=W, height=H, mode="rgb",
                           max_instances=max_instances, impl="pallas")
    print(f"N={N} {W}x{H} budget={max_instances} grid={cfg.grid_wh}")

    margs = model.render_args()
    means, opac_raw, scales_raw, rots, sh_dc, sh_rest = margs
    opacities = jax.nn.sigmoid(opac_raw)
    sc = jnp.broadcast_to(jnp.exp(scales_raw), (N, 3))
    shs = jnp.concatenate([sh_dc, sh_rest], axis=1)
    res_wh = jnp.array([W, H], jnp.float32)
    principal_px = cam.principal * res_wh

    print("forward stages:")
    prologue = jax.jit(lambda m, q, s, sh: project_and_sh_fused(
        m, q, s, sh, cam.R, cam.t, cam.focal, principal_px, res_wh, 3,
        near_plane=0.2, far_plane=1e4, radius_clip=RADIUS_CLIP,
        with_normal=False))
    proj, _ = timeit("prologue (proj+SH fused)", prologue, means, rots, sc, shs)

    binf = jax.jit(lambda m2, d, r: tiles.build_instances(
        m2, d, r, grid_wh=cfg.grid_wh, max_instances=max_instances, chunk=128))
    binned, _ = timeit("bin (build_instances)", binf,
                       proj["mean_2d"], proj["depth"], proj["radius"])

    gat = jax.jit(_gather_instance_table)
    table, _ = timeit("gather (instance table)", gat,
                      binned["padded_ids"], proj["mean_2d"], proj["conic"],
                      opacities, proj["rgb"])

    blf = jax.jit(lambda tb, ts, tc: blend_pallas(
        tb, ts, tc, grid_wh=cfg.grid_wh, n_feat=3, chunk=128))
    _, _ = timeit("blend fwd (pallas)", blf,
                  table, binned["tile_start"], binned["tile_count"])

    full = jax.jit(lambda a: render(*a, camera=cam, config=cfg, sh_degree=3)[0])
    _, fwd_ms = timeit("full render fwd", full, margs)

    print("backward:")
    lossf = jax.jit(jax.value_and_grad(
        lambda a: jnp.mean(render(*a, camera=cam, config=cfg, sh_degree=3)[0])))
    _, fb_ms = timeit("render fwd+bwd (mean loss)", lossf, margs)

    tgt = np.asarray(full(margs))

    from gsplat_tpu.train.losses import photometric_loss

    pl = jax.jit(jax.value_and_grad(lambda a: photometric_loss(
        render(*a, camera=cam, config=cfg, sh_degree=3)[0][..., :3],
        tgt[..., :3], 0.2)[0]))
    _, _ = timeit("fwd+bwd (L1+SSIM loss)", pl, margs)

    print("full step (trainer chunk):")
    cams = [cam] * 8
    imgs = [tgt[..., :3]] * 8
    ds = ColmapDataset(
        cameras=cams, images=imgs, names=[f"v{i}.png" for i in range(8)],
        train_ids=list(range(8)), test_ids=[], points=pts, colors=cols,
        scales=scales, camera_extent=9.9)
    tr = Trainer(model, ds, max_instances=max_instances)
    tr.train(2 * tr.chunk_steps)
    t0 = time.perf_counter()
    tr.train(80)
    dt = (time.perf_counter() - t0) / 80 * 1e3
    print(f"  {'train step (chunked)':<28} {dt:8.2f} ms   ({1e3/dt:.1f} steps/s)")


if __name__ == "__main__":
    main()
