"""Data-parallel training: a batch of views per step, sharded over the mesh.

The reference trains one view per step on one device (training.jl:587-592).
Here a step consumes `batch` views at once: the per-view render+loss is
vmapped, the batch axis is sharded over the mesh's `data` axis, and the mean
over views makes XLA insert ONE psum of the per-Gaussian gradients over ICI
— the collective that replaces the reference backward's global atomics when
scaled out (SURVEY.md §2.8).

Semantics note: a B-view batch step is B view-SGD steps' worth of signal
with 1/B the variance; densification statistics accumulate per view exactly
as the sequential trainer's do (max over radii, sum over grads/denomins).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..camera import Camera
from ..ops.rasterize import RasterizerConfig, render
from ..train.losses import photometric_loss
from ..train.optim import OptimizationParams, adam_update
from ..train.trainer import TrainState


@partial(
    jax.jit,
    static_argnames=("config", "opt_params", "camera_extent", "reg_weights", "mesh"),
)
def data_parallel_train_step(
    state: TrainState,
    cameras: Camera,  # batched pytree: R (B,3,3), t (B,3), focal (B,2), ...
    targets,  # (B, H, W, 3)
    background,  # (3,)
    sh_degree,
    *,
    config: RasterizerConfig,
    opt_params: OptimizationParams,
    camera_extent: float,
    reg_weights: tuple = (0.0, 0.0),
    mesh: Mesh | None = None,
):
    """One data-parallel step over a batch of views. Returns (state, metrics)."""
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        datas = NamedSharding(mesh, P("data"))
        state = jax.lax.with_sharding_constraint(state, repl)
        cameras = jax.lax.with_sharding_constraint(cameras, datas)
        targets = jax.lax.with_sharding_constraint(targets, datas)

    params = state.model.params()
    probe = jnp.zeros((state.model.capacity, 2), jnp.float32)

    def view_loss(params, probe, camera, target):
        model = state.model.replace_params(params)
        img, aux = render(
            *model.render_args(),
            camera=camera,
            config=config,
            sh_degree=sh_degree,
            background=background,
            means2d_probe=probe,
        )
        loss, parts = photometric_loss(img[..., :3], target, opt_params.lambda_dssim)
        op_reg, sc_reg = reg_weights
        if op_reg or sc_reg:
            a = model.alive.astype(jnp.float32)
            n = jnp.maximum(jnp.sum(a), 1.0)
            loss = loss + op_reg * jnp.sum(jax.nn.sigmoid(model.masked_opacities()) * a) / n
            loss = loss + sc_reg * jnp.sum(jnp.mean(jnp.exp(model.scales), axis=1) * a) / n
        return loss, (parts, aux)

    def batch_loss(params, probe):
        losses, (parts, aux) = jax.vmap(
            view_loss, in_axes=(None, None, 0, 0), out_axes=(0, (0, 0))
        )(params, probe, cameras, targets)
        # Mean over views -> the grad transpose psums per-view cotangents
        # over the `data` axis (the ICI all-reduce).
        return jnp.mean(losses), (parts, aux)

    (loss, (parts, aux)), (g_params, g_probe) = jax.value_and_grad(
        batch_loss, argnums=(0, 1), has_aux=True
    )(params, probe)

    lrs = opt_params.lrs(state.step, camera_extent)
    new_params, new_opt = adam_update(params, g_params, state.opt, lrs)

    # Densification stats, accumulated over the whole batch of views.
    res_half = jnp.array([config.width, config.height], jnp.float32) * 0.5
    gnorm = jnp.linalg.norm(g_probe * res_half[None, :], axis=1)  # summed over views
    visible_any = jnp.any(aux["radii"] > 0, axis=0)
    visible_count = jnp.sum((aux["radii"] > 0).astype(jnp.float32), axis=0)
    max_radii_b = jnp.max(aux["radii"], axis=0)

    new_state = state.replace(
        model=state.model.replace_params(new_params),
        opt=new_opt,
        step=state.step + 1,
        max_radii=jnp.where(
            visible_any, jnp.maximum(state.max_radii, max_radii_b), state.max_radii
        ),
        grad_accum=state.grad_accum + gnorm,
        stat_denom=state.stat_denom + visible_count,
    )
    metrics = {
        "loss": loss,
        "l1": jnp.mean(parts["l1"]),
        "ssim": jnp.mean(parts["ssim"]),
        "overflow": jnp.any(aux["overflow"]),
    }
    if mesh is not None:
        new_state = jax.lax.with_sharding_constraint(new_state, NamedSharding(mesh, P()))
    return new_state, metrics


def batch_cameras(cameras: list) -> Camera:
    """Stack a list of same-resolution Cameras into one batched Camera pytree."""
    import numpy as np

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
