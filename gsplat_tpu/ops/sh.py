"""Spherical-harmonics → RGB evaluation (degrees 0–3).

Differentiable re-design of the reference's `spherical_harmonics!` /
`∇spherical_harmonics!` kernel pair (reference:
src/rasterization/spherical_harmonics.jl:1-181). The forward is the same
closed form (+0.5 shift, clamp at 0 — the clamp's zero-gradient mask falls
out of autodiff of `maximum`, matching the reference's saved clamp mask);
the view-direction gradient flows back into the means through `normalize`
exactly as the reference's `∇normalize` does.

The active degree is a *traced* int32: bands above it are masked with
`where`, so ramping sh_degree 0→3 during training (training.jl:583) does not
trigger recompilation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import (
    F32_EPS,
    SH0,
    SH1,
    SH2C1,
    SH2C2,
    SH2C3,
    SH2C4,
    SH2C5,
    SH3C1,
    SH3C2,
    SH3C3,
    SH3C4,
    SH3C5,
    SH3C6,
    SH3C7,
    SH_COLOR_SHIFT,
)


def sh_basis(dirs: jnp.ndarray, degree, max_degree: int) -> jnp.ndarray:
    """SH basis values for unit directions.

    dirs: (..., 3); returns (..., (max_degree+1)²). Bands above the traced
    `degree` are zeroed (so coefficients beyond the active degree contribute
    nothing, like the reference's static-degree kernel specialization).
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    degree = jnp.asarray(degree)
    one = jnp.ones_like(x)
    out = [SH0 * one]
    if max_degree > 0:
        m1 = (degree >= 1).astype(x.dtype)
        out += [-SH1 * y * m1, SH1 * z * m1, -SH1 * x * m1]
    if max_degree > 1:
        m2 = (degree >= 2).astype(x.dtype)
        x2, y2, z2 = x * x, y * y, z * z
        xy, xz, yz = x * y, x * z, y * z
        out += [
            SH2C1 * xy * m2,
            SH2C2 * yz * m2,
            SH2C3 * (2.0 * z2 - x2 - y2) * m2,
            SH2C4 * xz * m2,
            SH2C5 * (x2 - y2) * m2,
        ]
    if max_degree > 2:
        m3 = (degree >= 3).astype(x.dtype)
        x2, y2, z2 = x * x, y * y, z * z
        xy = x * y
        out += [
            SH3C1 * y * (3.0 * x2 - y2) * m3,
            SH3C2 * xy * z * m3,
            SH3C3 * y * (4.0 * z2 - x2 - y2) * m3,
            SH3C4 * z * (2.0 * z2 - 3.0 * x2 - 3.0 * y2) * m3,
            SH3C5 * x * (4.0 * z2 - x2 - y2) * m3,
            SH3C6 * z * (x2 - y2) * m3,
            SH3C7 * x * (x2 - 3.0 * y2) * m3,
        ]
    return jnp.stack(out, axis=-1)


def sh_to_rgb(
    means: jnp.ndarray,  # (N, 3)
    shs: jnp.ndarray,  # (N, K, 3) with K = (max_degree+1)²
    camera_center: jnp.ndarray,  # (3,)
    degree,  # traced int: active SH degree
) -> jnp.ndarray:
    """Per-Gaussian RGB from SH coefficients; clamped at 0 (+0.5 shift).

    Reference: `compute_colors_from_sh` (spherical_harmonics.jl:41-74).
    Returns (N, 3).
    """
    K = shs.shape[1]
    max_degree = int(round(K**0.5)) - 1
    d = means - camera_center[None, :]
    norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    dirs = d / jnp.where(norm == 0, 1.0, norm)
    basis = sh_basis(dirs, degree, max_degree)  # (N, K)
    raw = jnp.einsum("nk,nkc->nc", basis, shs) + (SH_COLOR_SHIFT + F32_EPS)
    return jnp.maximum(0.0, raw)


def rgb_to_sh_dc(rgb):
    """[0,1] color → degree-0 SH coefficient (gaussians.jl:133)."""
    return (rgb - 0.5) / SH0


def sh_dc_to_rgb(sh):
    return sh * SH0 + 0.5
