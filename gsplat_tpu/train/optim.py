"""Per-parameter Adam with row surgery + LR schedules.

The reference keeps 6 named NerfUtils Adam optimizers (eps=1e-15) whose
moment arrays it appends to / prunes / zeroes during densification
(reference: src/training.jl:233-239, src/densification.jl:261-297). Here
Adam is a plain pytree {mu, nu} per parameter so the same surgery is a
gather/scatter on the state pytree — no optimizer-object mutation.

The bias-correction step count is per-parameter-group and *not* reset by
surgery (matching NU.Adam, whose step counter is global to the array).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field, fields

import jax
import jax.numpy as jnp

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-15  # reference training.jl:233

# Per-Gaussian parameter groups (row = one Gaussian); the only groups
# densification surgery may touch.
MODEL_PARAM_NAMES = (
    "points", "features_dc", "features_rest", "scales", "rotations", "opacities",
)


def adam_init(params: dict) -> dict:
    return {
        "mu": jax.tree_util.tree_map(jnp.zeros_like, params),
        "nu": jax.tree_util.tree_map(jnp.zeros_like, params),
        "step": jnp.zeros((), jnp.int32),
    }


def adam_update(params: dict, grads: dict, state: dict, lrs: dict) -> tuple[dict, dict]:
    """One Adam step. `lrs` maps param name -> (traced) learning rate."""
    step = state["step"] + 1
    t = step.astype(jnp.float32)
    c1 = 1.0 - ADAM_B1**t
    c2 = 1.0 - ADAM_B2**t

    new_mu, new_nu, new_p = {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        mu = ADAM_B1 * state["mu"][k] + (1.0 - ADAM_B1) * g
        nu = ADAM_B2 * state["nu"][k] + (1.0 - ADAM_B2) * g * g
        mhat = mu / c1
        vhat = nu / c2
        new_p[k] = p - lrs[k] * mhat / (jnp.sqrt(vhat) + ADAM_EPS)
        new_mu[k] = mu
        new_nu[k] = nu
    return new_p, {"mu": new_mu, "nu": new_nu, "step": step}


def zero_moment_rows(state: dict, mask) -> dict:
    """Zero mu/nu rows where mask (C,) is True — the reference's
    `_zero_optimizer_rows!` (densification.jl:289-297). Only the
    per-Gaussian groups are touched (aux groups like bilateral grids have
    unrelated shapes)."""

    def z(x):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - 1))
        return jnp.where(m, 0.0, x)

    def zdict(d):
        return {k: (z(v) if k in MODEL_PARAM_NAMES else v) for k, v in d.items()}

    return {
        "mu": zdict(state["mu"]),
        "nu": zdict(state["nu"]),
        "step": state["step"],
    }


def permute_moments(state: dict, idx) -> dict:
    """Row-permute/gather mu/nu (prune-compaction surgery)."""
    g = lambda x: x[idx]
    return {
        "mu": jax.tree_util.tree_map(g, state["mu"]),
        "nu": jax.tree_util.tree_map(g, state["nu"]),
        "step": state["step"],
    }


def lr_exp_scheduler(step, lr_start: float, lr_end: float, max_steps: int):
    """Log-linear decay lr_start -> lr_end over max_steps (utils.jl:75-83)."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    return jnp.exp((1.0 - t) * math.log(lr_start) + t * math.log(lr_end))


# ---------------------------------------------------------------------------
# Optimization parameters — values copied verbatim from the reference's
# OptimizationParams (src/utils.jl:2-73) for metric parity.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class OptimizationParams:
    """Field-for-field mirror of the reference's OptimizationParams
    (src/utils.jl:2-73); values copied verbatim for metric parity."""

    lambda_dssim: float = 0.2

    lr_points_start: float = 16e-5  # x camera_extent
    lr_points_end: float = 16e-7  # x camera_extent
    lr_points_steps: int = 30_000
    lr_feature: float = 25e-4  # features_rest = lr_feature / 20
    lr_opacities: float = 5e-2
    lr_scales: float = 5e-3
    lr_rotations: float = 1e-3

    random_background: bool = False

    # Depth supervision with monocular priors (depth_supervision.py).
    use_depth_loss: bool = True
    depth_loss_weight: float = 2.0
    depth_loss_mode: str = "ssi"  # ssi (auto) | ssi_disparity | ssi_depth
    depth_loss_steps: int = 30_000
    depth_loss_final_scale: float = 0.02  # weight decays to this fraction
    depth_loss_gradient_weight: float = 1.0

    # Sky dome (sky_dome.py).
    use_sky_dome: bool = False
    sky_dome_shape: str = "hemisphere"  # hemisphere | sphere
    sky_dome_points: int = 32_768
    sky_dome_radius_factor: float = 100.0  # x camera extent
    sky_dome_lr: float = 25e-4

    # Sky mask supervision (inert without masks).
    use_sky_loss: bool = True
    sky_loss_weight: float = 1.0
    sky_loss_from_iter: int = 500

    # Bilateral grid appearance modeling (bilateral_grid.py).
    use_bilateral_grid: bool = False
    bilateral_grid_size: tuple = (16, 16, 8)  # (x, y, guidance)
    bilateral_grid_lr: float = 2e-3
    bilateral_grid_lr_steps: int = 30_000
    tv_loss_weight: float = 10.0

    # Camera pose optimization (camera_opt.py): per-train-view 6D-rotation +
    # translation deltas, absorbed and reset every step (the reference ships
    # this as examples/pose_opt.jl + src/camera_opt.jl; here it runs jointly
    # with scene training inside the jitted step).
    use_pose_opt: bool = False
    pose_opt_lr: float = 1e-3

    # Geometry regularization (geometry_regularization.py).
    use_normal_loss: bool = False
    normal_consistency_weight: float = 0.05
    normal_flatten_weight: float = 0.005
    normal_from_iter: int = 20_000

    def lrs(self, step, camera_extent: float) -> dict:
        """Per-parameter (traced) learning rates at `step`."""
        pts = lr_exp_scheduler(
            step, self.lr_points_start, self.lr_points_end, self.lr_points_steps
        ) * camera_extent
        return {
            "points": pts,
            "features_dc": self.lr_feature,
            "features_rest": self.lr_feature / 20.0,
            "opacities": self.lr_opacities,
            "scales": self.lr_scales,
            "rotations": self.lr_rotations,
        }

    def replace(self, **kw) -> "OptimizationParams":
        from dataclasses import replace as _replace

        return _replace(self, **kw)


def reference_opt_params() -> OptimizationParams:
    """Every extension off — the benchmark comparability config
    (GaussianSplatting.jl:210-212)."""
    return OptimizationParams(
        use_depth_loss=False,
        use_sky_dome=False,
        use_sky_loss=False,
        use_bilateral_grid=False,
        use_normal_loss=False,
    )
