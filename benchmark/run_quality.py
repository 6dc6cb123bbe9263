"""Run the benchmark() evaluation protocol on the atrium quality scene
(real TPU) and write RESULTS.md.

Usage: /opt/venv/bin/python benchmark/run_quality.py [n_steps] [strategies...]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
strategies = tuple(sys.argv[2:]) or ("default", "mcmc")

from gsplat_tpu.api import benchmark

t0 = time.time()
rows = benchmark(
    "benchmark/scenes/atrium",
    scale=1,
    strategies=strategies,
    n_steps=n_steps,
    eval_steps=(7_000, 30_000),
)
print(json.dumps(rows), flush=True)
out = Path("RESULTS.md")
lines = [
    "# Quality results — atrium scene (real TPU, v5e single chip)",
    "",
    "Scene: `benchmark/scenes/atrium` — ray-traced 40-view orbit, 640x416,",
    "photo/procedural textures, 30k-point SfM-style seed cloud (see",
    "`benchmark/make_scene.py`; the environment has no network egress, so this",
    "is the closest obtainable stand-in for a MipNeRF-360 capture).",
    "Protocol: `gsplat_tpu.api.benchmark()` — fixed seed, max_extent=inf,",
    "holdout every 8th view, quantized metrics (reference:",
    "src/GaussianSplatting.jl:260-359).",
    "",
    "| strategy | step | PSNR | SSIM | MSE | gaussians | train min |",
    "|---|---|---|---|---|---|---|",
]
for r in rows:
    lines.append(
        f"| {r['config']} | {r['step']} | {r['psnr']:.2f} | {r['ssim']:.4f} "
        f"| {r['mse']:.5f} | {r['n_gaussians']} | {r['minutes']:.1f} |"
    )
lines += ["", f"Total wall-clock: {(time.time()-t0)/60:.1f} min."]
out.write_text("\n".join(lines) + "\n")
print("wrote RESULTS.md", flush=True)
