"""Run the benchmark() evaluation protocol on a quality scene (real TPU)
and write RESULTS.md.

Usage: /opt/venv/bin/python benchmark/run_quality.py [n_steps] [strategies...]
  [--scene DIR]   (default benchmark/scenes/atrium_hd — 1248x832, the
                   reference's MipNeRF-360-scale-4 operating point; the 20px
                   screen-size prune is resolution-dependent, see RESULTS.md)
"""
import json
import os

# Persistent XLA compile cache: capacity-bucket regrowth recompiles the
# 736k-scale train/refine programs ~13x per protocol run (60-135 s each);
# cached, a resume or replay pays none of it.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(__import__("pathlib").Path(__file__).resolve().parent.parent / ".jax_tpu_cache"))
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _cli import pop_scene

args = sys.argv[1:]
scene = pop_scene(args, "benchmark/scenes/atrium_hd")
mss = None
if "--max-screen-size" in args:
    i = args.index("--max-screen-size")
    mss = int(args[i + 1])
    del args[i:i + 2]
mi = None
if "--max-instances" in args:
    i = args.index("--max-instances")
    mi = int(args[i + 1])
    del args[i:i + 2]
cap = None
if "--mcmc-cap" in args:
    i = args.index("--mcmc-cap")
    cap = int(args[i + 1])
    del args[i:i + 2]
n_steps = int(args[0]) if args else 30_000
strategies = tuple(args[1:]) or ("default", "mcmc")

from gsplat_tpu.api import benchmark

t0 = time.time()
rows = benchmark(
    scene,
    scale=1,
    strategies=strategies,
    n_steps=n_steps,
    eval_steps=(7_000, 30_000),
    # 1000, not 2000: the tunnel wedges every ~30-60 min in bad windows
    # (three kills in stage 1 of r5 alone) and the watchdog-resume loses
    # everything since the last autosave.
    autosave_every=1_000,
    max_screen_size=mss,
    max_instances=mi,
    mcmc_cap=cap,
)
print(json.dumps(rows), flush=True)
# Rows land in a sidecar (RESULTS.md is curated by hand around them).
out = Path(scene) / "quality_rows.json"
out.write_text(json.dumps({"scene": scene, "n_steps": n_steps,
                           "minutes": (time.time() - t0) / 60, "rows": rows},
                          indent=1))
lines = ["| strategy | step | PSNR | SSIM | MSE | gaussians | train min |",
         "|---|---|---|---|---|---|---|"]
for r in rows:
    lines.append(
        f"| {r['config']} | {r['step']} | {r['psnr']:.2f} | {r['ssim']:.4f} "
        f"| {r['mse']:.5f} | {r['n_gaussians']} | {r['minutes']:.1f} |"
    )
print("\n".join(lines), flush=True)
print(f"wrote {out} (total {(time.time()-t0)/60:.1f} min)", flush=True)
