"""micro15: 1080p forward-render stage breakdown on the TRAINED bench model.

The round-3 verdict flagged render_fps_1080p (38.9) as the worst baseline
ratio with no stage breakdown. This reproduces bench.py's render headline
(train the synthetic scene briefly so occupancy is converged-scene-like,
then render at 1920x1088) and times each pipeline stage with the
fetch-terminated pattern (CLAUDE.md):

  prologue   project_and_sh_fused only
  binning    + tiles.build_instances
  gather     + instance-table row gather
  full       the whole render() (adds the Pallas blend + assembly)

Also reports the instance demand vs the 1<<20 budget bench pins, and a
budget-fitted full render (binning/sort/gather costs scale with budget).

Usage: /opt/venv/bin/python benchmark/micro15.py [train_steps]
"""
import os
import sys
import time
from pathlib import Path

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent.parent / ".jax_tpu_cache"),
)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

W, H = 1920, 1088
REPS = 40


def fetch_time(f, args_list, reps=REPS):
    out = f(*args_list[0])
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for i in range(reps):
        out = f(*args_list[i % len(args_list)])
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    train_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400

    from gsplat_tpu.camera import Camera, look_at
    from gsplat_tpu.data.colmap import ColmapDataset
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.ops import tiles
    from gsplat_tpu.ops.proj_fused import project_and_sh_fused
    from gsplat_tpu.ops.rasterize import (
        RasterizerConfig,
        cull_radius,
        render,
    )
    from gsplat_tpu.train.trainer import Trainer
    from gsplat_tpu.constants import RADIUS_CLIP

    rng = np.random.default_rng(0)
    n = 100_000
    pts = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-4, 4, n), rng.uniform(-4, 4, n)], 1
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    scales = np.full(n, 0.01, np.float32)
    cams = []
    for i in range(8):
        ang = 2 * np.pi * i / 8
        R, t = look_at(np.array([9 * np.cos(ang), 1.0, 9 * np.sin(ang)]), np.zeros(3))
        cams.append(Camera.create(R=R, t=t, width=976, height=544,
                                  focal=np.array([683.2, 683.2], np.float32)))
    model = GaussianModel.create(pts, cols, scales, max_sh_degree=3)
    gt_cfg = RasterizerConfig(width=976, height=544, mode="rgb",
                              max_instances=1 << 19, impl="pallas")
    gt_fwd = jax.jit(lambda a, c: render(*a, camera=c, config=gt_cfg, sh_degree=3)[0])
    args = model.render_args()
    imgs = [np.asarray(gt_fwd(args, c)[..., :3]) for c in cams]
    ds = ColmapDataset(cameras=cams, images=imgs,
                       names=[f"v{i}.png" for i in range(8)],
                       train_ids=list(range(8)), test_ids=[], points=pts,
                       colors=cols, scales=scales, camera_extent=9.9)
    tr = Trainer(model, ds, max_instances=1 << 16)
    tr.train(train_steps)
    model = tr.state.model
    print(f"[micro15] trained {train_steps} steps; n_alive={int(model.n_alive)}",
          flush=True)

    rcams = [c.with_resolution(W, H) for c in cams]
    args = model.render_args()
    budget = 1 << 20  # what bench.py pins

    # --- instance demand at this resolution
    cfg = RasterizerConfig(width=W, height=H, mode="rgb",
                           max_instances=budget, impl="pallas")
    full = jax.jit(lambda a, c: render(*a, camera=c, config=cfg, sh_degree=3))
    img, aux = full(args, rcams[0])
    print(f"[micro15] demand: n_instances={int(aux['n_instances'])} "
          f"p_instances={int(aux['p_instances'])} overflow={bool(aux['overflow'])} "
          f"budget={budget}", flush=True)

    # --- stage-sliced closures (each fetch-terminated) -------------------
    def prologue(a, cam):
        means, op_raw, sc_raw, rot, sh_dc, sh_rest = a
        opacities = jax.nn.sigmoid(op_raw)
        sc = jnp.exp(sc_raw)
        if sc.shape[1] == 1:
            sc = jnp.broadcast_to(sc, (sc.shape[0], 3))
        shs = jnp.concatenate([sh_dc, sh_rest], 1) if sh_rest.shape[1] else sh_dc
        res = jnp.array([W, H], jnp.float32)
        proj = project_and_sh_fused(
            means, rot, sc, shs, cam.R, cam.t, cam.focal,
            cam.principal * res, res, 3, radius_clip=RADIUS_CLIP,
            near_plane=cfg.near_plane, far_plane=cfg.far_plane,
            with_normal=False,
        )
        return proj, opacities

    def to_binned(a, cam):
        proj, opacities = prologue(a, cam)
        radius = cull_radius(opacities, proj["radius"], proj["conic"])
        binned = tiles.build_instances(
            proj["mean_2d"], proj["depth"], radius,
            grid_wh=cfg.grid_wh, max_instances=budget, chunk=cfg.chunk)
        return proj, opacities, binned

    def to_table(a, cam):
        from gsplat_tpu.ops.rasterize import _gather_instance_table
        proj, opacities, binned = to_binned(a, cam)
        table = _gather_instance_table(
            binned["padded_ids"], proj["mean_2d"], proj["conic"], opacities,
            proj["rgb"], offsets=binned["gm_offsets"],
            counts=binned["tile_count_per_gaussian"],
            max_run=cfg.grid_wh[0] * cfg.grid_wh[1])
        return table, binned

    al = [(args, c) for c in rcams]
    t_pro = fetch_time(jax.jit(lambda a, c: prologue(a, c)[0]["mean_2d"]), al)
    t_bin = fetch_time(jax.jit(lambda a, c: to_binned(a, c)[2]["padded_ids"]), al)
    t_tab = fetch_time(jax.jit(lambda a, c: to_table(a, c)[0]), al)
    t_full = fetch_time(jax.jit(lambda a, c: full(a, c)[0]), al)
    print(f"[micro15] budget={budget}: prologue {t_pro:.2f} | +binning "
          f"{t_bin:.2f} | +gather {t_tab:.2f} | full {t_full:.2f} ms "
          f"({1e3/t_full:.1f} FPS)", flush=True)
    print(f"[micro15] deltas: prologue {t_pro:.2f}, binning {t_bin-t_pro:.2f}, "
          f"gather {t_tab-t_bin:.2f}, blend+assemble {t_full-t_tab:.2f} ms",
          flush=True)

    # --- sub-chunk alignment (forward-only render table) ------------------
    for align, mb in ((64, 1 << 20), (32, 1 << 19), (16, 1 << 19)):
        cfg_a = RasterizerConfig(width=W, height=H, mode="rgb",
                                 max_instances=mb, impl="pallas", chunk=align)
        f = jax.jit(lambda a, c, cfg_a=cfg_a: render(*a, camera=c, config=cfg_a, sh_degree=3))
        img_a, aux_a = f(args, rcams[0])
        print(f"[micro15] chunk={align}: p_instances={int(aux_a['p_instances'])} "
              f"overflow={bool(aux_a['overflow'])}", flush=True)
        if bool(aux_a["overflow"]):
            continue
        g = jax.jit(lambda a, c, cfg_a=cfg_a: render(*a, camera=c, config=cfg_a, sh_degree=3)[0])
        t_a = fetch_time(g, al)
        print(f"[micro15] chunk={align} budget={mb}: full {t_a:.2f} ms "
              f"({1e3/t_a:.1f} FPS)", flush=True)
        err = float(jnp.max(jnp.abs(img_a - img)))
        print(f"[micro15] chunk={align} max|d| vs chunk128 = {err:.2e}", flush=True)

    # --- profiler trace of the full render -------------------------------
    trace_dir = "/tmp/micro15_trace"
    with jax.profiler.trace(trace_dir):
        for i in range(8):
            img, aux = full(args, rcams[i % 8])
        _ = np.asarray(img.ravel()[0])
    print(f"[micro15] trace in {trace_dir} (trace_top_ops.py to summarize)",
          flush=True)


if __name__ == "__main__":
    main()
