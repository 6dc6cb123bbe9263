"""Profile the quality-run hot loop at its REAL operating point (real TPU).

The protocol runs at ~570 ms/step on atrium_hd (19 min / 2000 steps) while
the bench config measures ~20 ms/step — kernels at the larger scale only
explain ~100-120 ms of that. This harness resumes a quality autosave and
separates the suspects:

  1. pure train throughput from the autosave (no strategy) — kernel floor
  2. with the strategy ON (densify every 100) — host strategy-pass cost
  3. a JAX profiler trace of (2) for the device/host timeline

Usage: /opt/venv/bin/python benchmark/profile_quality_step.py [CKPT] [--trace DIR]
"""
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

import numpy as np


def main():
    args = sys.argv[1:]
    trace = None
    if "--trace" in args:
        i = args.index("--trace")
        trace = args[i + 1]
        del args[i:i + 2]
    ckpt = args[0] if args else (
        "benchmark/scenes/atrium_hd/bench_default-014000.safetensors"
    )

    from gsplat_tpu.api import create_strategy, reference_opt_params
    from gsplat_tpu.data.colmap import load_colmap
    from gsplat_tpu.train.trainer import Trainer

    ds = load_colmap("benchmark/scenes/atrium_hd", scale=1, holdout=8,
                     max_extent=float("inf"))

    def timed(tag, strategy, n=300):
        tr = Trainer.from_checkpoint(
            ckpt, ds, opt_params=reference_opt_params(),
            strategy=strategy, max_instances=1 << 21, seed=0,
        )
        tr.train(60)  # warmup/compile at the real shapes
        t0 = time.perf_counter()
        tr.train(n)
        np.asarray(tr.state.model.points.ravel()[0])
        dt = time.perf_counter() - t0
        print(f"  {tag:<28} {1e3 * dt / n:8.1f} ms/step  "
              f"(alive {int(tr.state.model.n_alive)}, budget {tr.max_instances})",
              flush=True)
        return tr

    timed("no strategy (kernel floor)", None)
    tr = timed("DefaultStrategy (densify on)", create_strategy("default", seed=0))
    if trace:
        tr.profile(120, trace)
        print(f"  trace -> {trace}", flush=True)


if __name__ == "__main__":
    main()
