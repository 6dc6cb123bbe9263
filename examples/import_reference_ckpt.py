"""Continue training from a GaussianSplatting.jl checkpoint.

The Julia reference writes `GaussianSplatting.jl-checkpoint-1` safetensors
files (reference: src/checkpoint.jl:15-70, training.jl:419-447);
`load_checkpoint` / `Trainer.from_checkpoint` read them directly — params,
Adam moments, and step import exactly, so optimization resumes where the
reference left off.

Usage:
    python examples/import_reference_ckpt.py ckpt.safetensors dataset_dir [n_steps]
"""
import sys

sys.path.insert(0, ".")

from gsplat_tpu.data.colmap import load_colmap
from gsplat_tpu.models.gaussians import export_ply
from gsplat_tpu.train.optim import reference_opt_params
from gsplat_tpu.train.strategy import create_strategy
from gsplat_tpu.train.trainer import Trainer

ckpt, dataset_dir = sys.argv[1], sys.argv[2]
n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000

dataset = load_colmap(dataset_dir, scale=1, holdout=8)
trainer = Trainer.from_checkpoint(
    ckpt, dataset,
    opt_params=reference_opt_params(),
    strategy=create_strategy("default", seed=0),
)
print(f"resumed at step {trainer.step} with "
      f"{int(trainer.state.model.n_alive)} gaussians")
trainer.train(n_steps, log_every=100)
v = trainer.validate(quantize=True)
print({k: round(float(x), 4) for k, x in v.items() if k in ("psnr", "ssim", "mse")})
export_ply(trainer.state.model, "imported.ply")
print("wrote imported.ply")
