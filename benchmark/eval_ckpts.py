"""Evaluate quality autosave checkpoints (PSNR/SSIM trajectory) on CPU.

Maps the training-quality trajectory from the step-suffixed autosaves the
benchmark() protocol leaves behind — diagnosis tool for quality regressions
(e.g. opacity-reset recovery) without re-running training.

Usage: /opt/venv/bin/python benchmark/eval_ckpts.py [steps ...] [--scene DIR]
  (defaults to every autosave found for the default strategy in
  benchmark/scenes/atrium; --scene points at another scene's autosaves)
"""
import glob
import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
# Force CPU: setdefault would lose to the ambient JAX_PLATFORMS=axon.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

SCENE = "benchmark/scenes/atrium"  # override with --scene DIR


def main():
    from gsplat_tpu.api import reference_opt_params, create_strategy
    from gsplat_tpu.data.colmap import load_colmap
    from gsplat_tpu.train.trainer import Trainer

    from _cli import pop_scene

    args = sys.argv[1:]
    scene = pop_scene(args, SCENE)
    strat = "default"
    if "--strategy" in args:
        i = args.index("--strategy")
        strat = args[i + 1]
        del args[i:i + 2]
    want = {int(a) for a in args} or None
    dataset = load_colmap(scene, scale=1, holdout=8, max_extent=float("inf"))
    saves = sorted(glob.glob(os.path.join(scene, f"bench_{strat}-*.safetensors")))
    rows = []
    for path in saves:
        step = int(re.search(r"-(\d+)\.safetensors$", path).group(1))
        if want is not None and step not in want:
            continue
        trainer = Trainer.from_checkpoint(
            path, dataset,
            opt_params=reference_opt_params(),
            strategy=create_strategy(strat, seed=0),
            max_instances=1 << 21,
            seed=0,
        )
        v = trainer.validate(quantize=True)
        row = {
            "step": step,
            "psnr": round(float(v["psnr"]), 2),
            "ssim": round(float(v["ssim"]), 4),
            "mse": round(float(v["mse"]), 6),
            "n": int(trainer.state.model.n_alive),
            "overflow": bool(v.get("overflow", False)),
            "p_instances": int(v.get("p_instances", 0)),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
