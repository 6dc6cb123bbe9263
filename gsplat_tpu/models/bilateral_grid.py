"""Bilateral-grid appearance modeling.

Per-train-image low-res (x, y, guidance) grid of 3x4 affine color transforms
applied to the render before the photometric loss — absorbs per-view
exposure/white-balance drift (reference: src/bilateral_grid.jl). The
reference hand-writes forward/backward kernels with atomic grid scatters;
here the trilinear slice is pure-JAX gathers whose autodiff transpose is an
XLA scatter-add — no custom kernels needed.

Semantics preserved (bilateral_grid.jl:122-173):
  - guidance = BT.601 grayscale of the *input* rgb, clamped to [0,1];
    differentiable through the guidance coordinate except where z saturates
    or lands exactly on a cell boundary;
  - pixel (0,0) hits cell 0, the last pixel the last cell;
  - identity affine init; non-finite inputs sanitized to 0.5;
  - TV prior with LichtFeld's /12n normalization;
  - LR schedule: 1k-step linear warmup from 1% + exp decay to 1%.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..train.optim import lr_exp_scheduler

BGRID_C2G = (0.299, 0.587, 0.114)  # ITU-R BT.601


def make_bilateral_grids(n_images: int, shape=(16, 16, 8)) -> jnp.ndarray:
    """(n_images, gx, gy, gz, 12) grids, identity affine in every cell.
    Coefficient d*4+c maps input channel c (r,g,b,1) to output channel d."""
    gx, gy, gz = shape
    g = np.zeros((n_images, gx, gy, gz, 12), np.float32)
    for d in range(3):
        g[..., d * 4 + d] = 1.0
    return jnp.asarray(g)


def bilateral_slice(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Apply the per-pixel affine transform trilinearly sampled at
    (x, y, grayscale). image: (H, W, 3); grid: (gx, gy, gz, 12)."""
    H, W, _ = image.shape
    gx, gy, gz = grid.shape[:3]

    img = jnp.where(jnp.isfinite(image), image, 0.5)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]

    wi = jnp.arange(W, dtype=jnp.float32)
    hi = jnp.arange(H, dtype=jnp.float32)
    x = (wi / max(W - 1, 1)) * (gx - 1)  # (W,)
    y = (hi / max(H - 1, 1)) * (gy - 1)  # (H,)
    guidance = jnp.clip(
        BGRID_C2G[0] * r + BGRID_C2G[1] * g + BGRID_C2G[2] * b, 0.0, 1.0
    )
    z = guidance * (gz - 1)  # (H, W)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.clip(jnp.floor(jax.lax.stop_gradient(z)).astype(jnp.int32), 0, gz - 1)
    x1 = jnp.minimum(x0 + 1, gx - 1)
    y1 = jnp.minimum(y0 + 1, gy - 1)
    z1 = jnp.minimum(z0 + 1, gz - 1)
    fx = (x - x0)[None, :, None]  # (1, W, 1)
    fy = (y - y0)[:, None, None]  # (H, 1, 1)
    fz = z - z0
    # No guidance gradient where z saturates or lands exactly on a cell
    # (bilateral_grid.jl:147-149).
    zd = jax.lax.stop_gradient(z)
    z_interior = (z0.astype(jnp.float32) != zd) & (z1.astype(jnp.float32) != zd)
    fz = jnp.where(z_interior, fz, jax.lax.stop_gradient(fz))[..., None]  # (H, W, 1)

    x0b = jnp.broadcast_to(x0[None, :], (H, W))
    x1b = jnp.broadcast_to(x1[None, :], (H, W))
    y0b = jnp.broadcast_to(y0[:, None], (H, W))
    y1b = jnp.broadcast_to(y1[:, None], (H, W))

    def corner(xi, yi, zi):
        return grid[xi, yi, zi]  # (H, W, 12)

    c000 = corner(x0b, y0b, z0)
    c100 = corner(x1b, y0b, z0)
    c010 = corner(x0b, y1b, z0)
    c110 = corner(x1b, y1b, z0)
    c001 = corner(x0b, y0b, z1)
    c101 = corner(x1b, y0b, z1)
    c011 = corner(x0b, y1b, z1)
    c111 = corner(x1b, y1b, z1)

    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    coeffs = (c00 * (1 - fy) + c10 * fy) * (1 - fz) + (
        c01 * (1 - fy) + c11 * fy
    ) * fz  # (H, W, 12)

    A = coeffs.reshape(H, W, 3, 4)
    rgb1 = jnp.stack([r, g, b, jnp.ones_like(r)], axis=-1)  # (H, W, 4)
    out = jnp.einsum("hwdc,hwc->hwd", A, rgb1)
    return jnp.where(jnp.isfinite(out), out, 0.5)


def tv_loss(grids: jnp.ndarray) -> jnp.ndarray:
    """Mean squared neighbor difference per axis, / (12 * n_images)
    (bilateral_grid.jl:106-116). grids: (n, gx, gy, gz, 12)."""
    n, gx, gy, gz, _ = grids.shape
    dx = grids[:, 1:] - grids[:, :-1]
    dy = grids[:, :, 1:] - grids[:, :, :-1]
    dz = grids[:, :, :, 1:] - grids[:, :, :, :-1]
    return (
        jnp.sum(dx**2) / max(1, (gx - 1) * gy * gz)
        + jnp.sum(dy**2) / max(1, gx * (gy - 1) * gz)
        + jnp.sum(dz**2) / max(1, gx * gy * (gz - 1))
    ) / (12.0 * n)


def bilateral_grid_lr(step, lr: float, max_steps: int, warmup_steps: int = 1000,
                      warmup_start: float = 0.01, final_factor: float = 0.01):
    """LichtFeld schedule (bilateral_grid.jl:50-63)."""
    warm = jnp.where(
        step < warmup_steps,
        warmup_start + (1.0 - warmup_start) * step / warmup_steps,
        1.0,
    )
    return warm * lr_exp_scheduler(step, lr, final_factor * lr, max_steps)
