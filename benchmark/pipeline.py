"""Train-speed harness: warmup then timed steps on a real scene.

Mirrors the reference's benchmark/pipeline.jl (warmup 500 + timed 1000
`step!` calls on MipNeRF-360 bicycle @ scale 4, :rgb mode, default ADC
strategy). Usage:

    python benchmark/pipeline.py /data/mipnerf360/bicycle [--warmup 500] [--steps 1000]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--scale", type=int, default=None)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--strategy", default="default")
    args = ap.parse_args()

    from gsplat_tpu.api import _build_trainer, standard_scale
    from gsplat_tpu.data.colmap import load_colmap
    from gsplat_tpu.train.optim import reference_opt_params

    scale = args.scale or standard_scale(args.dataset)
    dataset = load_colmap(args.dataset, scale=scale)
    trainer = _build_trainer(dataset, reference_opt_params(), args.strategy)

    print(f"warmup {args.warmup} steps...", flush=True)
    trainer.train(args.warmup)
    print(f"timing {args.steps} steps...", flush=True)
    t0 = time.perf_counter()
    trainer.train(args.steps)
    dt = time.perf_counter() - t0
    print(
        f"{args.steps} steps in {dt:.1f}s = {args.steps / dt:.1f} steps/s "
        f"({1000 * dt / args.steps:.2f} ms/step), "
        f"{int(trainer.state.model.n_alive)} gaussians",
        flush=True,
    )


if __name__ == "__main__":
    main()
