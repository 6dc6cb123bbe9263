"""Differentiable EWA projection of 3D Gaussians onto the image plane.

TPU-native re-design of the reference's hand-written `project!`/`∇project!`
kernel pair (reference: src/rasterization/projection.jl:39-257). On TPU there
is no reason to hand-derive VJPs for this stage: the math is closed-form
array code that XLA fuses into a handful of vectorized ops, and `jax.grad`
produces exactly the reference's adjoints (verified against finite
differences in tests/test_projection.py). Reference-detached quantities
(the normal's axis argmin and facing sign, projection.jl:11-12) use
`jax.lax.stop_gradient`.

All functions are written per-Gaussian and `vmap`ed; everything is float32.
Culled Gaussians (near/far plane, degenerate covariance, small radius,
off-screen — projection.jl:79-118) are masked via `valid` rather than
early-returned, with `where`-guarded denominators so no NaN/Inf reaches the
gradient of masked lanes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import (
    BLUR_EPS,
    FAR_PLANE,
    FOV_CLAMP,
    MAX_EIGVAL_FLOOR,
    NEAR_PLANE,
    RADIUS_CLIP,
)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized quaternion (w, x, y, z) → rotation matrix.

    Reference: `unnorm_quat2rot` (src/rasterization/render.jl:322-333).
    """
    q = q / jnp.linalg.norm(q)
    w, x, y, z = q[0], q[1], q[2], q[3]
    x2, y2, z2 = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.array(
        [
            [1.0 - 2.0 * (y2 + z2), 2.0 * (xy - wz), 2.0 * (xz + wy)],
            [2.0 * (xy + wz), 1.0 - 2.0 * (x2 + z2), 2.0 * (yz - wx)],
            [2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (x2 + y2)],
        ],
        dtype=q.dtype,
    )


def quat_scale_to_cov(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Σ = (R S)(R S)ᵀ. Reference: render.jl:291-294."""
    R = quat_to_rotmat(q)
    M = R * scale[None, :]
    return M @ M.T


def _perspective(mean_cam, cov_cam, focal, principal_px, resolution_wh):
    """2D mean + 2D covariance of a camera-space Gaussian.

    Reference: `perspective_projection` (projection.jl:259-287), including the
    0.3·tan(fov) FOV clamp on the Jacobian's off-axis terms.
    `resolution_wh` is a float (2,) array [W, H].
    """
    tan_fov = 0.5 * resolution_wh / focal
    scaled_tan_fov = FOV_CLAMP * tan_fov

    z = mean_cam[2]
    rz = 1.0 / z
    rz2 = rz * rz

    mean_2d = rz * focal * mean_cam[:2] + principal_px

    lim = (resolution_wh - principal_px) / focal + scaled_tan_fov
    lim_neg = principal_px / focal + scaled_tan_fov
    txy = z * jnp.minimum(lim, jnp.maximum(-lim_neg, mean_cam[:2] * rz))

    # J = [[fx/z, 0, -fx tx/z²], [0, fy/z, -fy ty/z²]]
    J = jnp.array(
        [
            [focal[0] * rz, 0.0, -focal[0] * txy[0] * rz2],
            [0.0, focal[1] * rz, -focal[1] * txy[1] * rz2],
        ],
        dtype=mean_cam.dtype,
    )
    cov_2d = J @ cov_cam @ J.T
    return cov_2d, mean_2d


def _add_blur(cov_2d):
    """+BLUR_EPS px low-pass; returns blurred cov, its det, and the EWA
    compensation factor. Reference: `add_blur` (render.jl:387-396)."""
    det_orig = cov_2d[0, 0] * cov_2d[1, 1] - cov_2d[0, 1] * cov_2d[1, 0]
    cov_blur = cov_2d + BLUR_EPS * jnp.eye(2, dtype=cov_2d.dtype)
    det_blur = cov_blur[0, 0] * cov_blur[1, 1] - cov_blur[0, 1] * cov_blur[1, 0]
    safe_det = jnp.where(det_blur == 0, 1.0, det_blur)
    # sqrt has an infinite derivative at 0: keep its argument strictly
    # positive for the masked-out branch so no NaN enters masked gradients.
    ratio = det_orig / safe_det
    pos = ratio > 0.0
    compensation = jnp.where(pos, jnp.sqrt(jnp.where(pos, ratio, 1.0)), 0.0)
    return cov_blur, det_blur, compensation


def _max_eigval_2d(cov_2d, det):
    """Larger eigenvalue with the reference's 0.1 discriminant floor
    (render.jl:415-420)."""
    mid = 0.5 * (cov_2d[0, 0] + cov_2d[1, 1])
    return mid + jnp.sqrt(jnp.maximum(MAX_EIGVAL_FLOOR, mid * mid - det))


def _gaussian_normal(R_w2c, R_g, scale, mean_cam):
    """Camera-space unit normal: rotation column of the smallest scale axis,
    flipped toward the camera. Axis index and sign are detached
    (reference: projection.jl:14-27)."""
    k = jnp.argmin(scale)
    axis = R_g[:, k]
    n_cam = R_w2c @ axis
    sign = jnp.where(jnp.dot(jax.lax.stop_gradient(n_cam), jax.lax.stop_gradient(mean_cam)) > 0.0, -1.0, 1.0)
    return sign * n_cam


def project_one(
    mean,
    quat,
    scale,
    R_w2c,
    t_w2c,
    focal,
    principal_px,
    resolution_wh,
    *,
    near_plane=NEAR_PLANE,
    far_plane=FAR_PLANE,
    radius_clip=RADIUS_CLIP,
    with_normal: bool = False,
):
    """Project a single Gaussian. Returns a dict of outputs + `valid` mask.

    Mirrors `project!` (projection.jl:39-130): cull by z∉(near,far), det≤0,
    radius≤radius_clip, and the bbox fully off-screen; conic is the inverse of
    the blurred 2D covariance; radius = ceil(3σ_max).
    """
    f32 = mean.dtype
    mean_cam = R_w2c @ mean + t_w2c
    z = mean_cam[2]
    valid_z = (z > near_plane) & (z < far_plane)
    # Guard: all downstream math uses a safe z for culled Gaussians.
    safe_mean_cam = jnp.where(valid_z, mean_cam, jnp.array([0.0, 0.0, 1.0], f32))

    R_g = quat_to_rotmat(quat)
    M = R_g * scale[None, :]
    cov = M @ M.T
    cov_cam = R_w2c @ cov @ R_w2c.T

    cov_2d, mean_2d = _perspective(safe_mean_cam, cov_cam, focal, principal_px, resolution_wh)
    cov_2d, det, compensation = _add_blur(cov_2d)
    valid_det = det > 0.0
    safe_det = jnp.where(valid_det, det, 1.0)

    # conic = inverse of the blurred 2D covariance (render.jl:368-381).
    det_inv = 1.0 / safe_det
    conic = jnp.array(
        [cov_2d[1, 1] * det_inv, -cov_2d[0, 1] * det_inv, cov_2d[0, 0] * det_inv],
        dtype=f32,
    )

    lam = _max_eigval_2d(cov_2d, safe_det)
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam))
    radius = jax.lax.stop_gradient(radius_f).astype(jnp.int32)
    valid_radius = radius > radius_clip

    in_bounds = (
        (mean_2d[0] + radius_f > 0.0)
        & (mean_2d[0] - radius_f < resolution_wh[0])
        & (mean_2d[1] + radius_f > 0.0)
        & (mean_2d[1] - radius_f < resolution_wh[1])
    )
    valid = valid_z & valid_det & valid_radius & in_bounds

    out = {
        "depth": jnp.where(valid, z, 0.0),
        "mean_2d": jnp.where(valid, mean_2d, 0.0),
        "conic": jnp.where(valid, conic, 0.0),
        "radius": jnp.where(valid, radius, 0),
        "compensation": jnp.where(valid, compensation, 0.0),
        "valid": valid,
    }
    if with_normal:
        normal = _gaussian_normal(R_w2c, R_g, jax.lax.stop_gradient(scale), safe_mean_cam)
        out["normal"] = jnp.where(valid, normal, 0.0)
    return out


@partial(jax.jit, static_argnames=("with_normal", "near_plane", "far_plane", "radius_clip"))
def project(
    means,  # (N, 3)
    quats,  # (N, 4) wxyz, unnormalized
    scales,  # (N, 3) post-activation (exp applied)
    R_w2c,  # (3, 3)
    t_w2c,  # (3,)
    focal,  # (2,)
    principal_px,  # (2,) in pixels
    resolution_wh,  # (2,) float [W, H]
    *,
    near_plane=NEAR_PLANE,
    far_plane=FAR_PLANE,
    radius_clip=RADIUS_CLIP,
    with_normal: bool = False,
):
    """Vectorized projection of all Gaussians (vmap over `project_one`)."""
    fn = partial(
        project_one,
        near_plane=near_plane,
        far_plane=far_plane,
        radius_clip=radius_clip,
        with_normal=with_normal,
    )
    return jax.vmap(fn, in_axes=(0, 0, 0, None, None, None, None, None))(
        means, quats, scales, R_w2c, t_w2c, focal, principal_px, resolution_wh
    )
