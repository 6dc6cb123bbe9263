"""Data-parallel training: a batch of views per step, sharded over the mesh.

The reference trains one view per step on one device (training.jl:587-592).
Here a step consumes `batch` views at once: the per-view render+loss is
vmapped INSIDE the shared `_step_core` (train/trainer.py) — the same code
path the sequential Trainer jits, with every optional subsystem (bilateral
grid, depth supervision, sky dome, normal regularization, pose optimization,
MCMC noise) active — the batch axis is sharded over the mesh's `data` axis,
and the mean over views makes XLA insert ONE psum of the per-Gaussian
gradients over ICI — the collective that replaces the reference backward's
global atomics when scaled out (SURVEY.md §2.8).

Semantics note: a B-view batch step is B view-SGD steps' worth of signal
with 1/B the variance; densification statistics accumulate per view exactly
as the sequential trainer's do (per-view probe rows carry per-view
screen-gradient norms; max over radii, sum over grads/denoms).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..camera import Camera
from ..ops.rasterize import RasterizerConfig
from ..train.optim import OptimizationParams
from ..train.trainer import TrainState, _step_core


@partial(
    jax.jit,
    static_argnames=(
        "config", "opt_params", "camera_extent", "reg_weights", "features", "sky",
        "mcmc_noise", "mesh",
    ),
)
def data_parallel_train_step(
    state: TrainState,
    cameras: Camera,  # batched pytree: R (B,3,3), t (B,3), focal (B,2), ...
    targets,  # (B, H, W, 3)
    background,  # (3,)
    sh_degree,
    view_idxs=None,  # (B,) int32 train-view indices (bilateral/pose/extras)
    extras: dict | None = None,  # B-stacked per-view aux arrays
    *,
    config: RasterizerConfig,
    opt_params: OptimizationParams,
    camera_extent: float,
    reg_weights: tuple = (0.0, 0.0),
    features: tuple = (),
    sky=None,
    mcmc_noise: tuple | None = None,
    mesh: Mesh | None = None,
):
    """One data-parallel step over a batch of views — the FULL train step
    (8-term loss + Adam + stats + optional subsystems), not a reduced copy.
    Returns (state, metrics)."""
    B = targets.shape[0]
    if view_idxs is None:
        view_idxs = jnp.arange(B, dtype=jnp.int32)
    extras = extras or {}
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        datas = NamedSharding(mesh, P("data"))
        state = jax.lax.with_sharding_constraint(state, repl)
        cameras = jax.lax.with_sharding_constraint(cameras, datas)
        targets = jax.lax.with_sharding_constraint(targets, datas)
        if extras:
            extras = jax.lax.with_sharding_constraint(extras, datas)

    new_state, metrics = _step_core(
        state,
        cameras,
        targets,
        background,
        sh_degree,
        view_idxs,
        extras,
        config=config,
        opt_params=opt_params,
        camera_extent=camera_extent,
        reg_weights=reg_weights,
        features=features,
        sky=sky,
        mcmc_noise=mcmc_noise,
    )
    if mesh is not None:
        new_state = jax.lax.with_sharding_constraint(new_state, NamedSharding(mesh, P()))
    return new_state, metrics


def batch_cameras(cameras: list) -> Camera:
    """Stack a list of same-resolution Cameras into one batched Camera pytree."""
    w, h = cameras[0].width, cameras[0].height
    assert all(c.width == w and c.height == h for c in cameras)
    return Camera(
        R=jnp.stack([c.R for c in cameras]),
        t=jnp.stack([c.t for c in cameras]),
        focal=jnp.stack([c.focal for c in cameras]),
        principal=jnp.stack([c.principal for c in cameras]),
        width=w,
        height=h,
    )
