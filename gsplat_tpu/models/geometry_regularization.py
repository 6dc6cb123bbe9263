"""Geometry regularization: depth-normal consistency + flatten loss.

Pure-array re-implementation of the reference (src/geometry_regularization.jl)
— it was already array code there, so this is the one subsystem that maps to
JAX almost definitionally. Semantics preserved:

  - expected depth e = max(D,0)/max(alpha,1e-6) back-projected along per-pixel
    rays; central-difference tangents -> cross-product normal; alpha-weighted
    1 - cos against the rendered normal channel;
  - alpha is NOT clamped in the differentiable path (the clamp-adjoint trap
    documented at geometry_regularization.jl:110-117);
  - validity gates (detached): 4-neighborhood alpha >= 0.5, relative depth
    jump <= 5%, finite, cross/render norms above floors; a view with < 64
    valid pixels (or weight < 16) contributes zero;
  - orientation flip toward the camera is detached (as in the rasterizer);
  - flatten loss: mean over Gaussians of exp(min scale axis) with a detached
    first-tie-wins one-hot.

Array convention: depth/alpha are (H, W); normals are (H, W, 3); rays are
(rx (W,), ry (H,)) so the ray through pixel (x, y) is (rx[x], ry[y], 1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NORMAL_MIN_ALPHA = 0.5
NORMAL_MAX_REL_DEPTH_JUMP = 0.05
NORMAL_MIN_EXPECTED_DEPTH = 1e-6
NORMAL_MIN_RENDER_NORM = 0.1
NORMAL_MIN_VALID_COUNT = 64.0
NORMAL_MIN_VALID_WEIGHT = 16.0
NORMAL_MIN_CROSS_NORM_SQ = 1e-24


def pixel_rays(camera):
    """(rx (W,), ry (H,)) camera-space ray components per pixel center
    (geometry_regularization.jl:53-62; half-pixel offset matches
    depth_supervision's sample convention)."""
    w, h = camera.width, camera.height
    fx, fy = camera.focal[0], camera.focal[1]
    cx = camera.principal[0] * w
    cy = camera.principal[1] * h
    rx = (jnp.arange(w, dtype=jnp.float32) + 0.5 - cx) / fx
    ry = (jnp.arange(h, dtype=jnp.float32) + 0.5 - cy) / fy
    return rx, ry


def depth_normal_consistency_loss(depth, alpha, normals, *, rays):
    """depth/alpha (H, W); normals (H, W, 3) camera-space; rays from
    pixel_rays. Reference: geometry_regularization.jl:87-183."""
    H, W = depth.shape
    if W <= 2 or H <= 2:
        return jnp.float32(0.0)
    rx, ry = rays

    sg = jax.lax.stop_gradient

    # Interior blocks (H-2, W-2); index [y, x].
    Rx_c = rx[1 : W - 1][None, :]
    Rx_p = rx[2:W][None, :]
    Rx_m = rx[0 : W - 2][None, :]
    Ry_c = ry[1 : H - 1][:, None]
    Ry_p = ry[2:H][:, None]
    Ry_m = ry[0 : H - 2][:, None]

    # alpha deliberately unclamped in the diff path (clamp-adjoint trap).
    e = jnp.maximum(depth, 0.0) / jnp.maximum(alpha, 1e-6)

    iy, ix = slice(1, H - 1), slice(1, W - 1)
    e_c = e[iy, ix]
    e_xp, e_xm = e[iy, 2:W], e[iy, 0 : W - 2]
    e_yp, e_ym = e[2:H, ix], e[0 : H - 2, ix]

    dx, dy = e_xp - e_xm, e_yp - e_ym
    tx1 = e_xp * Rx_p - e_xm * Rx_m
    tx2 = dx * Ry_c
    tx3 = dx
    ty1 = dy * Rx_c
    ty2 = e_yp * Ry_p - e_ym * Ry_m
    ty3 = dy

    n1 = tx2 * ty3 - tx3 * ty2
    n2 = tx3 * ty1 - tx1 * ty3
    n3 = tx1 * ty2 - tx2 * ty1
    n_sq = n1 * n1 + n2 * n2 + n3 * n3
    n_norm = jnp.sqrt(jnp.maximum(n_sq, NORMAL_MIN_CROSS_NORM_SQ))

    facing = sg(n1) * Rx_c + sg(n2) * Ry_c + sg(n3)
    sign = jnp.where(facing > 0.0, -1.0, 1.0)
    flip = sign / n_norm
    nd1, nd2, nd3 = n1 * flip, n2 * flip, n3 * flip

    nr1 = normals[iy, ix, 0]
    nr2 = normals[iy, ix, 1]
    nr3 = normals[iy, ix, 2]
    nr_sq = nr1 * nr1 + nr2 * nr2 + nr3 * nr3
    nr_norm = jnp.sqrt(jnp.maximum(nr_sq, NORMAL_MIN_RENDER_NORM**2))
    cos = (nd1 * nr1 + nd2 * nr2 + nd3 * nr3) / nr_norm

    # Validity & weights: constants w.r.t. AD.
    a = jnp.clip(sg(alpha), 0.0, 1.0)
    a_c = a[iy, ix]
    opaque = (
        (a_c >= NORMAL_MIN_ALPHA)
        & (a[iy, 2:W] >= NORMAL_MIN_ALPHA)
        & (a[iy, 0 : W - 2] >= NORMAL_MIN_ALPHA)
        & (a[2:H, ix] >= NORMAL_MIN_ALPHA)
        & (a[0 : H - 2, ix] >= NORMAL_MIN_ALPHA)
    )
    e_cd = sg(e_c)
    jump = NORMAL_MAX_REL_DEPTH_JUMP * e_cd
    continuous = (
        (e_cd >= NORMAL_MIN_EXPECTED_DEPTH)
        & (jnp.abs(sg(e_xp) - e_cd) <= jump)
        & (jnp.abs(sg(e_xm) - e_cd) <= jump)
        & (jnp.abs(sg(e_yp) - e_cd) <= jump)
        & (jnp.abs(sg(e_ym) - e_cd) <= jump)
    )
    ok = (
        opaque
        & continuous
        & jnp.isfinite(e_cd)
        & (sg(n_sq) >= NORMAL_MIN_CROSS_NORM_SQ)
        & (sg(nr_sq) >= NORMAL_MIN_RENDER_NORM**2)
    )
    w = jnp.where(ok, a_c, 0.0)
    count = jnp.sum(ok.astype(jnp.float32))
    sw = jnp.sum(w)

    loss = jnp.sum(w * (1.0 - cos)) / jnp.maximum(sw, 1.0)
    gate = (count >= NORMAL_MIN_VALID_COUNT) & (sw >= NORMAL_MIN_VALID_WEIGHT)
    return jnp.where(gate, loss, 0.0)


def flatten_loss(scales_raw, alive=None):
    """L1 on exp(min scale axis), detached first-tie-wins one-hot
    (geometry_regularization.jl:197-211). scales_raw: (N, 3) pre-exp."""
    if scales_raw.shape[0] == 0:
        return jnp.float32(0.0)
    sg = jax.lax.stop_gradient
    s = sg(scales_raw)
    hit = s == jnp.min(s, axis=1, keepdims=True)
    mask = (hit & (jnp.cumsum(hit, axis=1) == 1)).astype(jnp.float32)
    per = jnp.sum(jnp.exp(scales_raw) * mask, axis=1)
    if alive is not None:
        a = alive.astype(jnp.float32)
        return jnp.sum(per * a) / jnp.maximum(jnp.sum(a), 1.0)
    return jnp.mean(per)
