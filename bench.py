"""Benchmark: full training-step throughput on a synthetic scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the complete training pipeline — differentiable rasterize forward +
backward (Pallas blend), photometric L1+SSIM loss, per-parameter Adam,
densification statistics — via the Trainer's scan-chunked path, i.e. exactly
what a production run executes.

Baseline: the reference records ~150 train-steps/s (6.7 ms/step, blocking
sync) on its author's AMD GPU for MipNeRF-360 bicycle @ scale 4
(/root/reference/src/GaussianSplatting.jl:96-99).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

N_GAUSSIANS = int(os.environ.get("BENCH_N", 100_000))
WIDTH = int(os.environ.get("BENCH_W", 976))
HEIGHT = int(os.environ.get("BENCH_H", 544))
STEPS = int(os.environ.get("BENCH_STEPS", 100))
MODE = os.environ.get("BENCH_MODE", "train")  # train | render
BASELINE_STEPS_PER_S = 150.0
BASELINE_RENDER_FPS = 150.0  # reference worker: ~3.6+2.1 ms/frame readback+render


def _autotune(model, cams, budget, mode):
    """Pick the fastest kernel-variant flags on THIS hardware.

    The blend/gather variants (GSPLAT_BLEND_TB, GSPLAT_BLEND_SIGMA_MM,
    GSPLAT_GATHER_BWD) are read at trace time; each candidate is traced
    as a fresh closure with the env set, timed over a short fetch-terminated
    window, and the winner's flags are left in os.environ for the real run.
    Variants that fail to lower (Mosaic surfaces are hardware-gated) are
    skipped. Conservative defaults win ties. Disable with BENCH_AUTOTUNE=0.
    """
    from gsplat_tpu.ops.rasterize import RasterizerConfig, render

    cfg = RasterizerConfig(
        width=WIDTH, height=HEIGHT, mode="rgb",
        max_instances=budget, impl="pallas",
    )
    args = model.render_args()
    reps = 20

    def time_combo(flags):
        for k, v in flags.items():
            os.environ[k] = v
        try:
            if mode == "render":
                f = jax.jit(
                    lambda a, c: render(*a, camera=c, config=cfg, sh_degree=3)[0]
                )
                out = f(args, cams[0])
            else:
                def loss(a, c):
                    img, _ = render(*a, camera=c, config=cfg, sh_degree=3)
                    return jnp.mean(img[..., :3] ** 2)

                f = jax.jit(jax.grad(lambda a, c: loss(a, c)))
                out = f(args, cams[0])
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            t0 = time.perf_counter()
            for i in range(reps):
                out = f(args, cams[i % len(cams)])
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            return (time.perf_counter() - t0) / reps * 1e3
        except Exception as e:  # variant didn't lower on this hardware
            print(f"[autotune] {flags} FAILED: {type(e).__name__}", file=sys.stderr)
            return None

    # Pin the gather backward to the fused scatter while tuning the blend:
    # the size-based default could pick a sort+reduce spelling at this
    # budget, whose ~20 ms would drown the blend variants' differences.
    base = {"GSPLAT_BLEND_TB": "1", "GSPLAT_BLEND_SIGMA_MM": "0",
            "GSPLAT_BLEND_ALGO": "cm", "GSPLAT_GATHER_BWD": "scatter",
            # Conservative while tuning the blend; toggled at the end so a
            # gm-lowering failure can never poison the whole grid.
            "GSPLAT_PROLOGUE_GM": "0"}
    # Blend variants interact (both change the kernel); tune jointly.
    # algo=pm is the pixel-major forward (differentiable: the vjp replays
    # the chunk-major backward either way); sigma_mm is cm-only.
    best, best_ms = dict(base), None
    for algo in ("cm", "pm"):
        for tb in ("1", "4", "8"):
            for mm in ("0", "1") if algo == "cm" else ("0",):
                combo = dict(base, GSPLAT_BLEND_TB=tb, GSPLAT_BLEND_SIGMA_MM=mm,
                             GSPLAT_BLEND_ALGO=algo)
                ms = time_combo(combo)
                print(f"[autotune] algo={algo} tb={tb} mm={mm}: "
                      f"{'skip' if ms is None else f'{ms:.2f} ms'}", file=sys.stderr)
                if ms is not None and (best_ms is None or ms < best_ms * 0.98):
                    best, best_ms = combo, ms
    # Backward reduction of the instance gather (micro14: size-dependent
    # crossover between the fused scatter and the sort+reduce spellings).
    if mode != "render":
        for bwd in ("scatter", "segscan", "segsum"):
            combo = dict(best, GSPLAT_GATHER_BWD=bwd)
            ms = time_combo(combo)
            print(f"[autotune] gather_bwd={bwd}: "
                  f"{'skip' if ms is None else f'{ms:.2f} ms'}", file=sys.stderr)
            if ms is not None and (best_ms is None or ms < best_ms * 0.98):
                best, best_ms = combo, ms
    # Gaussian-major prologue inputs (in-kernel lane transpose): the
    # package default; verify it lowers AND wins on this chip.
    g_on = dict(best, GSPLAT_PROLOGUE_GM="1")
    ms = time_combo(g_on)
    print(f"[autotune] +prologue_gm: "
          f"{'skip' if ms is None else f'{ms:.2f} ms'}", file=sys.stderr)
    if ms is not None and best_ms is not None and ms < best_ms * 1.005:
        best, best_ms = g_on, min(ms, best_ms)
    for k, v in best.items():
        os.environ[k] = v
    print(f"[autotune] chose {best} ({best_ms and round(best_ms, 2)} ms)",
          file=sys.stderr)


def main():
    from gsplat_tpu.camera import Camera, look_at
    from gsplat_tpu.data.colmap import ColmapDataset
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    n = N_GAUSSIANS
    pts = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-4, 4, n), rng.uniform(-4, 4, n)], 1
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    scales = np.full(n, 0.01, np.float32)

    cams = []
    for i in range(8):
        ang = 2 * np.pi * i / 8
        R, t = look_at(np.array([9 * np.cos(ang), 1.0, 9 * np.sin(ang)]), np.zeros(3))
        cams.append(
            Camera.create(
                R=R, t=t, width=WIDTH, height=HEIGHT,
                focal=np.array([0.7 * WIDTH, 0.7 * WIDTH], np.float32),
            )
        )

    model = GaussianModel.create(pts, cols, scales, max_sh_degree=3)
    # Default: let the Trainer's overflow-growth fit the budget to the
    # scene's observed demand (costs scale with the budget; a fixed 4N
    # budget over-provisions ~50%). BENCH_MAX_INSTANCES pins it instead.
    max_instances = int(os.environ.get("BENCH_MAX_INSTANCES", 0)) or (1 << 16)
    gt_budget = max(4 * n, 1 << 19)

    # Ground-truth targets are RENDERS of the scene itself (not noise):
    # training then exercises the instance/occupancy distribution of a real
    # converged scene — dense tiles, front-to-back early termination — so the
    # throughput number transfers (the reference benchmarks real scenes,
    # src/GaussianSplatting.jl:96-99).
    from gsplat_tpu.ops.rasterize import RasterizerConfig, render

    gt_cfg = RasterizerConfig(
        width=WIDTH, height=HEIGHT, mode="rgb",
        max_instances=gt_budget, impl="pallas",
    )
    gt_fwd = jax.jit(
        lambda args, cam: render(*args, camera=cam, config=gt_cfg, sh_degree=3)[0]
    )
    args = model.render_args()
    imgs = [np.asarray(gt_fwd(args, c)[..., :3]) for c in cams]

    dataset = ColmapDataset(
        cameras=cams, images=imgs, names=[f"v{i}.png" for i in range(8)],
        train_ids=list(range(8)), test_ids=[], points=pts, colors=cols,
        scales=scales, camera_extent=9.9,
    )

    if (jax.default_backend() == "tpu"
            and os.environ.get("BENCH_AUTOTUNE", "1") != "0"):
        _autotune(model, cams, gt_budget, MODE)

    def render_bench(width, height, budget, steps):
        """Time the pallas forward at (width, height); grows the instance
        budget on overflow first (a truncated render would inflate FPS).

        Rendering is forward-only, so the table uses sub-chunk alignment
        (chunk=32) with a demand-fitted budget: at a 1080p tile grid the
        CHUNK=128 alignment alone forces >= n_tiles*128 padded slots
        (4.4x the real instances on the trained bench model), and every
        binning/gather/repack stage scales with the table size
        (benchmark/micro15.py). BENCH_RENDER_CHUNK=128 restores the
        trainable layout."""
        from gsplat_tpu.ops.rasterize import RasterizerConfig, render

        chunk = int(os.environ.get("BENCH_RENDER_CHUNK", 32))
        rcams = [c.with_resolution(width, height) for c in cams]
        args = model.render_args()

        def fit(budget):
            for _ in range(4):
                cfg = RasterizerConfig(
                    width=width, height=height, mode="rgb",
                    max_instances=budget, impl="pallas", chunk=chunk,
                )
                fwd = jax.jit(
                    lambda args, cam: render(*args, camera=cam, config=cfg, sh_degree=3)
                )
                img, aux = fwd(args, rcams[0])
                if not bool(aux["overflow"]):
                    return fwd, img, int(aux["p_instances"])
                budget = max(budget * 3 // 2, int(aux["p_instances"]) * 9 // 8)
                budget = -(-budget // 1024) * 1024
                print(f"[render bench] overflow; budget -> {budget}", file=sys.stderr)
            return fwd, img, int(aux["p_instances"])

        # The train autotune leaves GSPLAT_BLEND_ALGO/TB pinned for the
        # train step; the render table is a different operating point
        # (sparse tiles), so tune the forward algo here independently,
        # with each algo's own TB default (a train-tuned TB measurably
        # regresses the 1080p forward).
        algo_env = os.environ.pop("GSPLAT_BLEND_ALGO", None)
        tb_env = os.environ.pop("GSPLAT_BLEND_TB", None)
        try:
            fwd, img, demand = fit(budget)
            # Shrink to the observed demand (+12.5% headroom): the render
            # worker steady-state, matching the Trainer's budget auto-fit.
            fitted = max(-(-(demand * 9 // 8) // 4096) * 4096, 1 << 15)
            if fitted < budget:
                print(f"[render bench] demand {demand}; budget {budget} -> {fitted}",
                      file=sys.stderr)
                budget = fitted
            best = None
            for algo, grp in (("pm", "8"), ("pm", "16"), ("pm", "32"),
                              ("cm", None)):
                os.environ["GSPLAT_BLEND_ALGO"] = algo
                if grp is not None:
                    os.environ["GSPLAT_BLEND_PM_GROUP"] = grp
                try:
                    fwd, img, _ = fit(budget)
                    _ = np.asarray(img.ravel()[0])
                    t0 = time.perf_counter()
                    for i in range(10):
                        img, _aux = fwd(args, rcams[i % 8])
                    _ = np.asarray(img.ravel()[0])
                    ms = (time.perf_counter() - t0) / 10 * 1e3
                except Exception as e:
                    print(f"[render bench] algo={algo} grp={grp} FAILED: "
                          f"{type(e).__name__}: {e}", file=sys.stderr)
                    continue
                print(f"[render bench] algo={algo} grp={grp}: {ms:.2f} ms/frame",
                      file=sys.stderr)
                if best is None or ms < best[2]:
                    best = (algo, grp, ms, fwd, img)
            if best is None:
                raise RuntimeError(
                    "render bench: every blend algo failed to lower/run "
                    "(see [render bench] algo=... FAILED lines above)")
            algo, grp, _ms, fwd, img = best
            os.environ["GSPLAT_BLEND_ALGO"] = algo
            if grp is not None:
                os.environ["GSPLAT_BLEND_PM_GROUP"] = grp
            _ = np.asarray(img.ravel()[0])
            t0 = time.perf_counter()
            for i in range(steps):
                img, _aux = fwd(args, rcams[i % 8])
            _ = np.asarray(img.ravel()[0])
            return steps / (time.perf_counter() - t0)
        finally:
            if algo_env is None:
                os.environ.pop("GSPLAT_BLEND_ALGO", None)
            else:
                os.environ["GSPLAT_BLEND_ALGO"] = algo_env
            if tb_env is not None:
                os.environ["GSPLAT_BLEND_TB"] = tb_env

    if MODE == "render":
        fps = render_bench(WIDTH, HEIGHT, gt_budget, STEPS)
        print(json.dumps({
            "metric": "render_fps",
            "value": round(fps, 2),
            "unit": f"frames/s ({N_GAUSSIANS}g {WIDTH}x{HEIGHT} pallas fwd)",
            "vs_baseline": round(fps / BASELINE_RENDER_FPS, 4),
        }))
        return

    trainer = Trainer(model, dataset, max_instances=max_instances)

    # Warmup / compile (at the steady-state chunk size); overflow growth
    # during warmup fits the budget to demand before the timed window.
    trainer.train(4 * trainer.chunk_steps)

    t0 = time.perf_counter()
    trainer.train(STEPS)
    dt = time.perf_counter() - t0
    steps_per_s = STEPS / dt

    print(
        json.dumps(
            {
                "metric": "train_steps_per_s",
                "value": round(steps_per_s, 3),
                "unit": f"steps/s ({N_GAUSSIANS}g {WIDTH}x{HEIGHT} {trainer.impl} full step)",
                "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 4),
            }
        )
    )

    # Second headline (BASELINE.md): 1080p render FPS at 100k gaussians,
    # on the TRAINED bench model (the initial cloud's occupancy is not
    # representative). Skippable with BENCH_RENDER_1080P=0.
    if os.environ.get("BENCH_RENDER_1080P", "1") != "0":
        model = trainer.state.model
        fps = render_bench(1920, 1088, max(trainer.max_instances, 1 << 20),
                           max(STEPS, 40))
        print(json.dumps({
            "metric": "render_fps_1080p",
            "value": round(fps, 2),
            "unit": f"frames/s ({N_GAUSSIANS}g 1920x1088 pallas fwd)",
            "vs_baseline": round(fps / BASELINE_RENDER_FPS, 4),
        }))


if __name__ == "__main__":
    main()
