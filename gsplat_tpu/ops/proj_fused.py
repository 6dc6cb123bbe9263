"""Fused Pallas projection + spherical-harmonics kernel (forward + backward).

The vmapped-XLA projection (ops/projection.py) is correct but materializes
dozens of (N, ...) intermediates in HBM — ~6.7 ms at 100k Gaussians on a
v5e, versus ~0.2 ms of actual VPU math. This kernel computes the whole
per-Gaussian prologue — EWA projection (reference `project!`,
src/rasterization/projection.jl:39-130) and SH→RGB (reference
`spherical_harmonics!`, spherical_harmonics.jl:1-74) — in ONE pass:
HBM → VMEM → 200 flops of lane math → HBM.

Layout: structure-of-arrays with Gaussians on lanes. Inputs arrive packed as
(ATTR_ROWS, N) [means|quats|scales] and (3K, N) [SH, channel-minor]; camera
scalars (R, t, focal, principal, resolution, traced sh_degree) ride a (1, 128)
row so pose gradients stay traced (camera pose optimization differentiates
w.r.t. R/t). Output is a packed (OUT_ROWS, N) array of rows
[depth|mean2d|conic|radius|comp|valid|rgb|normal].

The backward kernel does NOT hand-derive the VJP (the reference hand-writes
`∇project!`/`∇color_from_sh!`, projection.jl:132-257): the kernel body is
ordinary traced JAX, so it recomputes the forward block and applies
`jax.vjp` to the SAME block function — exact adjoints (including the clamp
masks and the reference's detached argmin/sign/radius semantics, which enter
as `stop_gradient` in the forward math), fused into one kernel. Per-block
camera cotangents are emitted as partial rows and summed on the XLA side
(replacing the reference's @atomic vR/vt accumulation, projection.jl:243-255).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    BLUR_EPS,
    F32_EPS,
    FOV_CLAMP,
    MAX_EIGVAL_FLOOR,
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

G = 2048  # gaussians per grid step (lanes)

ATTR_ROWS = 16  # means(3) quats(4) scales(3) pad(6)
OUT_ROWS = 16
# Output row indices.
R_DEPTH, R_MX, R_MY, R_CA, R_CB, R_CC, R_RADIUS, R_COMP, R_VALID = range(9)
R_RGB = 9  # 9..11
R_NORMAL = 12  # 12..14

CAM_COLS = 128  # one (1, 128) row: R(9) t(3) focal(2) pp(2) res(2) shdeg(1)


def _cam_scalars(cam):
    """Unpack the (1, CAM_COLS) camera row into named scalars."""
    R = [[cam[0, 3 * i + j] for j in range(3)] for i in range(3)]
    t = [cam[0, 9 + i] for i in range(3)]
    focal = (cam[0, 12], cam[0, 13])
    pp = (cam[0, 14], cam[0, 15])
    res = (cam[0, 16], cam[0, 17])
    sh_degree = cam[0, 18]
    return R, t, focal, pp, res, sh_degree


def _block_math(attr, shs, cam, *, max_degree, with_normal, near, far, radius_clip, w=1):
    """All per-Gaussian math on one (·, G) block. attr (ATTR_ROWS·w, G/w),
    shs (3K·w, G/w), cam (1, CAM_COLS). Returns (OUT_ROWS·w, G/w).

    `w` is the sublane width of one logical row: with w=1 every per-Gaussian
    quantity is a (1, G) slice that occupies a single sublane of each vreg
    (1/8 VPU utilization); with w=8 the gaussian axis is split 8×(G/8) by a
    free row-major reshape on the XLA side, every row slice is a full
    (8, G/8) tile, and the same elementwise chain issues 8× fewer vector
    instructions. The split is elementwise-consistent across attr/shs/out,
    so the math is untouched."""
    f32 = jnp.float32
    sg = jax.lax.stop_gradient
    R, t, focal, pp, res, sh_degree = _cam_scalars(cam)

    rw = w  # the quaternion unpack below shadows `w`

    def row(a, i):
        return a[rw * i : rw * (i + 1), :]

    m = [row(attr, i) for i in range(3)]  # world mean rows (w, G/w)
    q = [row(attr, 3 + i) for i in range(4)]  # w x y z
    s = [row(attr, 7 + i) for i in range(3)]  # activated scales

    # --- quaternion -> rotation (render.jl:322-333) ---
    qn2 = q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]
    qinv = 1.0 / jnp.sqrt(jnp.maximum(qn2, 1e-24))  # exact: Mosaic rsqrt is the fast approx
    w, x, y, z = (qi * qinv for qi in q)
    x2, y2, z2 = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    Rg = [
        [1.0 - 2.0 * (y2 + z2), 2.0 * (xy - wz), 2.0 * (xz + wy)],
        [2.0 * (xy + wz), 1.0 - 2.0 * (x2 + z2), 2.0 * (yz - wx)],
        [2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (x2 + y2)],
    ]

    # --- Sigma = (Rg S)(Rg S)^T (render.jl:291-294), 6 unique entries ---
    M = [[Rg[i][j] * s[j] for j in range(3)] for i in range(3)]
    cov = [[sum(M[i][k] * M[j][k] for k in range(3)) for j in range(3)] for i in range(3)]

    # --- world -> camera ---
    mc = [sum(R[i][j] * m[j] for j in range(3)) + t[i] for i in range(3)]
    zc = mc[2]
    valid_z = (zc > near) & (zc < far)
    safe_z = jnp.where(valid_z, zc, 1.0)
    safe_mx = jnp.where(valid_z, mc[0], 0.0)
    safe_my = jnp.where(valid_z, mc[1], 0.0)

    # cov_cam = R cov R^T (projection.jl:375-380)
    RC = [[sum(R[i][k] * cov[k][j] for k in range(3)) for j in range(3)] for i in range(3)]
    cc_ = [[sum(RC[i][k] * R[j][k] for k in range(3)) for j in range(3)] for i in range(3)]

    # --- perspective (projection.jl:259-287) ---
    tanx = 0.5 * res[0] / focal[0]
    tany = 0.5 * res[1] / focal[1]
    rz = 1.0 / safe_z
    rz2 = rz * rz
    mean2d_x = rz * focal[0] * safe_mx + pp[0]
    mean2d_y = rz * focal[1] * safe_my + pp[1]
    limx = (res[0] - pp[0]) / focal[0] + FOV_CLAMP * tanx
    limy = (res[1] - pp[1]) / focal[1] + FOV_CLAMP * tany
    limx_n = pp[0] / focal[0] + FOV_CLAMP * tanx
    limy_n = pp[1] / focal[1] + FOV_CLAMP * tany
    tx = safe_z * jnp.minimum(limx, jnp.maximum(-limx_n, safe_mx * rz))
    ty = safe_z * jnp.minimum(limy, jnp.maximum(-limy_n, safe_my * rz))
    # J = [[a, 0, b], [0, c, d]]
    a = focal[0] * rz
    b = -focal[0] * tx * rz2
    c = focal[1] * rz
    d = -focal[1] * ty * rz2
    c00 = a * a * cc_[0][0] + 2.0 * a * b * cc_[0][2] + b * b * cc_[2][2]
    c01 = a * c * cc_[0][1] + a * d * cc_[0][2] + b * c * cc_[1][2] + b * d * cc_[2][2]
    c11 = c * c * cc_[1][1] + 2.0 * c * d * cc_[1][2] + d * d * cc_[2][2]

    # --- blur + conic + radius (render.jl:368-420) ---
    det_orig = c00 * c11 - c01 * c01
    c00b = c00 + BLUR_EPS
    c11b = c11 + BLUR_EPS
    det = c00b * c11b - c01 * c01
    valid_det = det > 0.0
    safe_det = jnp.where(valid_det, det, 1.0)
    ratio = det_orig / safe_det
    pos = ratio > 0.0
    comp = jnp.where(pos, jnp.sqrt(jnp.where(pos, ratio, 1.0)), 0.0)
    det_inv = 1.0 / safe_det
    conic_a = c11b * det_inv
    conic_b = -c01 * det_inv
    conic_c = c00b * det_inv
    mid = 0.5 * (c00b + c11b)
    lam = mid + jnp.sqrt(jnp.maximum(MAX_EIGVAL_FLOOR, mid * mid - safe_det))
    radius_f = sg(jnp.ceil(3.0 * jnp.sqrt(lam)))
    valid_radius = radius_f > radius_clip
    in_bounds = (
        (mean2d_x + radius_f > 0.0)
        & (mean2d_x - radius_f < res[0])
        & (mean2d_y + radius_f > 0.0)
        & (mean2d_y - radius_f < res[1])
    )
    valid = valid_z & valid_det & valid_radius & in_bounds
    vf = valid.astype(f32)

    # --- SH -> RGB (spherical_harmonics.jl:41-74) ---
    cam_center = [-sum(R[j][i] * t[j] for j in range(3)) for i in range(3)]
    dx = m[0] - cam_center[0]
    dy = m[1] - cam_center[1]
    dz = m[2] - cam_center[2]
    dn2 = dx * dx + dy * dy + dz * dz
    dinv = 1.0 / jnp.sqrt(jnp.maximum(dn2, 1e-24))
    dx, dy, dz = dx * dinv, dy * dinv, dz * dinv
    K = (max_degree + 1) ** 2
    basis = [SH0 * jnp.ones_like(dx)]
    if max_degree > 0:
        m1 = (sh_degree >= 1.0).astype(f32)
        basis += [-SH1 * dy * m1, SH1 * dz * m1, -SH1 * dx * m1]
    if max_degree > 1:
        m2 = (sh_degree >= 2.0).astype(f32)
        dx2, dy2, dz2 = dx * dx, dy * dy, dz * dz
        basis += [
            SH2C1 * dx * dy * m2,
            SH2C2 * dy * dz * m2,
            SH2C3 * (2.0 * dz2 - dx2 - dy2) * m2,
            SH2C4 * dx * dz * m2,
            SH2C5 * (dx2 - dy2) * m2,
        ]
    if max_degree > 2:
        m3 = (sh_degree >= 3.0).astype(f32)
        dx2, dy2, dz2 = dx * dx, dy * dy, dz * dz
        basis += [
            SH3C1 * dy * (3.0 * dx2 - dy2) * m3,
            SH3C2 * dx * dy * dz * m3,
            SH3C3 * dy * (4.0 * dz2 - dx2 - dy2) * m3,
            SH3C4 * dz * (2.0 * dz2 - 3.0 * dx2 - 3.0 * dy2) * m3,
            SH3C5 * dx * (4.0 * dz2 - dx2 - dy2) * m3,
            SH3C6 * dz * (dx2 - dy2) * m3,
            SH3C7 * dx * (dx2 - 3.0 * dy2) * m3,
        ]
    rgb = []
    for ch in range(3):
        acc = SH_COLOR_SHIFT + F32_EPS
        for k in range(K):
            acc = acc + basis[k] * row(shs, 3 * k + ch)
        rgb.append(jnp.maximum(0.0, acc))

    rows = [
        jnp.where(valid, zc, 0.0),
        jnp.where(valid, mean2d_x, 0.0),
        jnp.where(valid, mean2d_y, 0.0),
        jnp.where(valid, conic_a, 0.0),
        jnp.where(valid, conic_b, 0.0),
        jnp.where(valid, conic_c, 0.0),
        jnp.where(valid, radius_f, 0.0),
        jnp.where(valid, comp, 0.0),
        vf,
        rgb[0],
        rgb[1],
        rgb[2],
    ]
    if with_normal:
        # Rotation column of the smallest scale axis, flipped toward the
        # camera; axis index & sign detached (projection.jl:14-27).
        s0, s1, s2 = (sg(si) for si in s)
        k0 = (s0 <= s1) & (s0 <= s2)
        k1 = jnp.logical_not(k0) & (s1 <= s2)
        k2 = jnp.logical_not(k0) & jnp.logical_not(k1)
        f0, f1, f2 = (k.astype(f32) for k in (k0, k1, k2))
        ax = [Rg[i][0] * f0 + Rg[i][1] * f1 + Rg[i][2] * f2 for i in range(3)]
        n_cam = [sum(R[i][j] * ax[j] for j in range(3)) for i in range(3)]
        dot = sg(n_cam[0]) * sg(safe_mx) + sg(n_cam[1]) * sg(safe_my) + sg(n_cam[2]) * sg(safe_z)
        sign = jnp.where(dot > 0.0, -1.0, 1.0)
        rows += [jnp.where(valid, sign * n_cam[i], 0.0) for i in range(3)]
    else:
        rows += [jnp.zeros_like(zc)] * 3
    rows += [jnp.zeros_like(zc)] * (OUT_ROWS - len(rows))
    return jnp.concatenate(rows, axis=0)


def _gm_to_wide(x3d):
    """(8, gl, F) gaussian-major block -> (F*8, gl) wide lane layout.

    The wide mapping puts logical row r, sublane-group i at wide row
    8r + i with the SAME gaussian->(group, lane) assignment the XLA-side
    (F, N)->(F*8, N/8) reshape produces, so gm blocks mix freely with
    wide-layout outputs. Spelled as eight 2D sub-block transposes (XLU)
    plus a lane-preserving stack+reshape — Mosaic lowers both. Moving the
    transpose in-kernel is the point: the XLA-side (N,48).T SH relayout
    was 4.77 of the prologue's 6.45 ms at 1M capacity (micro16)."""
    f = x3d.shape[2]
    gl = x3d.shape[1]
    ts = [x3d[i].T for i in range(8)]  # (f, gl) each
    return jnp.stack(ts, axis=1).reshape(f * 8, gl)


def _math_kw(statics):
    kw = dict(statics)
    kw.pop("gm", None)  # layout flag for the call wrappers, not the math
    return kw


def _fwd_kernel(cam_ref, attr_ref, sh_ref, out_ref, *, statics):
    out_ref[:] = _block_math(attr_ref[:], sh_ref[:], cam_ref[:], **_math_kw(statics))


def _fwd_kernel_gm(cam_ref, attr_ref, sh_ref, out_ref, *, statics):
    out_ref[:] = _block_math(
        _gm_to_wide(attr_ref[:]), _gm_to_wide(sh_ref[:]), cam_ref[:],
        **_math_kw(statics),
    )


def _bwd_kernel_gm(cam_ref, attr_ref, sh_ref, g_ref, dattr_ref, dsh_ref, dcam_ref, *, statics):
    def fn(attr_gm, sh_gm, cam):
        return _block_math(
            _gm_to_wide(attr_gm), _gm_to_wide(sh_gm), cam, **_math_kw(statics)
        )

    _, vjp = jax.vjp(fn, attr_ref[:], sh_ref[:], cam_ref[:])
    d_attr, d_sh, d_cam = vjp(g_ref[:])  # gm-layout grads via the vjp
    dattr_ref[:] = d_attr
    dsh_ref[:] = d_sh
    dcam_ref[:] = jnp.concatenate(
        [d_cam, jnp.zeros((7, CAM_COLS), jnp.float32)], axis=0
    )[None]


def _bwd_kernel(cam_ref, attr_ref, sh_ref, g_ref, dattr_ref, dsh_ref, dcam_ref, *, statics):
    fn = functools.partial(_block_math, **_math_kw(statics))
    _, vjp = jax.vjp(fn, attr_ref[:], sh_ref[:], cam_ref[:])
    d_attr, d_sh, d_cam = vjp(g_ref[:])
    dattr_ref[:] = d_attr
    dsh_ref[:] = d_sh
    # Per-block partial camera grads, summed on the XLA side. The block is
    # (1, 8, CAM_COLS) for sublane alignment; the partial rides row 0.
    dcam_ref[:] = jnp.concatenate(
        [d_cam, jnp.zeros((7, CAM_COLS), jnp.float32)], axis=0
    )[None]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_call(cam, attr, shs, statics):
    st = dict(statics)
    w = st["w"]
    if st.get("gm"):
        # attr (n, ATTR_ROWS) / shs (n, k3) gaussian-major; w == 8.
        n, k3 = attr.shape[0], shs.shape[1]
        nl, gl = n // 8, G // 8
        out = pl.pallas_call(
            functools.partial(_fwd_kernel_gm, statics=statics),
            grid=(n // G,),
            in_specs=[
                pl.BlockSpec((1, CAM_COLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, gl, ATTR_ROWS), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, gl, k3), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((OUT_ROWS * 8, gl), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((OUT_ROWS * 8, nl), jnp.float32),
            interpret=_interpret(),
            # (n, F) -> (8, n/8, F) is a free contiguous row split; the
            # in-kernel _gm_to_wide reproduces the wide gaussian mapping.
        )(cam, attr.reshape(8, nl, ATTR_ROWS), shs.reshape(8, nl, k3))
        return out.reshape(OUT_ROWS, n)
    n = attr.shape[1]  # logical (padded) gaussian count
    k3 = shs.shape[0]
    nl, gl = n // w, G // w  # lanes per logical row / per grid step
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, statics=statics),
        grid=(n // G,),
        in_specs=[
            pl.BlockSpec((1, CAM_COLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ATTR_ROWS * w, gl), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k3 * w, gl), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((OUT_ROWS * w, gl), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS * w, nl), jnp.float32),
        interpret=_interpret(),
        # (AR, n) -> (AR*w, n/w) is row-major-identical: a free bitcast that
        # splits each logical row over w sublane rows (see _block_math).
    )(cam, attr.reshape(ATTR_ROWS * w, nl), shs.reshape(k3 * w, nl))
    return out.reshape(OUT_ROWS, n)


def _bwd_call(cam, attr, shs, g, statics):
    st = dict(statics)
    w = st["w"]
    if st.get("gm"):
        n, k3 = attr.shape[0], shs.shape[1]
        nl, gl = n // 8, G // 8
        d_attr, d_sh, d_cam = pl.pallas_call(
            functools.partial(_bwd_kernel_gm, statics=statics),
            grid=(n // G,),
            in_specs=[
                pl.BlockSpec((1, CAM_COLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, gl, ATTR_ROWS), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, gl, k3), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((OUT_ROWS * 8, gl), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((8, gl, ATTR_ROWS), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, gl, k3), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, CAM_COLS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((8, nl, ATTR_ROWS), jnp.float32),
                jax.ShapeDtypeStruct((8, nl, k3), jnp.float32),
                jax.ShapeDtypeStruct((n // G, 8, CAM_COLS), jnp.float32),
            ],
            interpret=_interpret(),
        )(cam, attr.reshape(8, nl, ATTR_ROWS), shs.reshape(8, nl, k3),
          g.reshape(OUT_ROWS * 8, nl))
        return (
            d_attr.reshape(n, ATTR_ROWS),
            d_sh.reshape(n, k3),
            jnp.sum(d_cam, axis=(0, 1))[None],
        )
    n = attr.shape[1]
    k3 = shs.shape[0]
    nl, gl = n // w, G // w
    d_attr, d_sh, d_cam = pl.pallas_call(
        functools.partial(_bwd_kernel, statics=statics),
        grid=(n // G,),
        in_specs=[
            pl.BlockSpec((1, CAM_COLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ATTR_ROWS * w, gl), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k3 * w, gl), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT_ROWS * w, gl), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ATTR_ROWS * w, gl), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k3 * w, gl), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, CAM_COLS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ATTR_ROWS * w, nl), jnp.float32),
            jax.ShapeDtypeStruct((k3 * w, nl), jnp.float32),
            jax.ShapeDtypeStruct((n // G, 8, CAM_COLS), jnp.float32),
        ],
        interpret=_interpret(),
    )(cam, attr.reshape(ATTR_ROWS * w, nl), shs.reshape(k3 * w, nl),
      g.reshape(OUT_ROWS * w, nl))
    return (
        d_attr.reshape(ATTR_ROWS, n),
        d_sh.reshape(k3, n),
        jnp.sum(d_cam, axis=(0, 1))[None],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _proj_sh_packed(cam, attr, shs, statics):
    return _fwd_call(cam, attr, shs, statics)


def _proj_vjp_fwd(cam, attr, shs, statics):
    return _fwd_call(cam, attr, shs, statics), (cam, attr, shs)


def _proj_vjp_bwd(statics, res, g):
    cam, attr, shs = res
    d_attr, d_sh, d_cam = _bwd_call(cam, attr, shs, g, statics)
    return d_cam, d_attr, d_sh


_proj_sh_packed.defvjp(_proj_vjp_fwd, _proj_vjp_bwd)


def project_and_sh_fused(
    means,  # (N, 3)
    quats,  # (N, 4) wxyz
    scales,  # (N, 3) activated
    shs,  # (N, K, 3)
    R_w2c,  # (3, 3)
    t_w2c,  # (3,)
    focal,  # (2,)
    principal_px,  # (2,)
    resolution_wh,  # (2,)
    sh_degree,  # traced int
    *,
    near_plane,
    far_plane,
    radius_clip,
    with_normal: bool,
):
    """Fused projection + SH. Returns the same dict as ops.projection.project
    plus "rgb" (N, 3). Differentiable w.r.t. every array input including the
    pose (R_w2c, t_w2c)."""
    import os

    n = means.shape[0]
    K = shs.shape[1]
    max_degree = int(round(K**0.5)) - 1
    n_pad = -(-n // G) * G
    k3 = max(8, 3 * K)  # sublane-friendly minimum
    wide = os.environ.get("GSPLAT_PROLOGUE_WIDE", "1") != "0"
    # Gaussian-major input layout (opt-in, wide only): attr/SH stay (N, F)
    # and the lane transpose happens inside the kernel (_gm_to_wide).
    # micro16 attributed 4.77 ms of the 1M-capacity prologue to the
    # XLA-side (N,48).T + wide split, but END-TO-END the gm spelling is
    # neutral standalone (7.51 vs 7.56 ms at 1M) and ~0.8 ms SLOWER in the
    # full bench train step (r5 autotune: 25.28 vs 24.44) — the isolated
    # relayout cost does not compose; XLA overlaps it. Default off;
    # bench.py autotunes the flag per chip.
    gm = wide and os.environ.get("GSPLAT_PROLOGUE_GM", "0") == "1"

    if gm:
        def padr(x):  # pad gaussian ROWS (usually a no-op: capacity % 4096 == 0)
            return jnp.pad(x, ((0, n_pad - n), (0, 0))) if n_pad != n else x

        attr = padr(jnp.concatenate(
            [means, quats, scales, jnp.zeros((n, ATTR_ROWS - 10), jnp.float32)],
            axis=1,
        ))
        shs_in = shs.reshape(n, 3 * K)
        if k3 != 3 * K:
            shs_in = jnp.concatenate(
                [shs_in, jnp.zeros((n, k3 - 3 * K), jnp.float32)], axis=1)
        shs_in = padr(shs_in)
    else:
        def pad(x):
            return jnp.pad(x, ((0, 0), (0, n_pad - n))) if n_pad != n else x

        attr = pad(
            jnp.concatenate(
                [means.T, quats.T, scales.T, jnp.zeros((ATTR_ROWS - 10, n), jnp.float32)],
                axis=0,
            )
        )
        shs_in = shs.reshape(n, 3 * K).T
        if k3 != 3 * K:
            shs_in = jnp.concatenate(
                [shs_in, jnp.zeros((k3 - 3 * K, n), jnp.float32)], axis=0)
        shs_in = pad(shs_in)

    cam = jnp.zeros((1, CAM_COLS), jnp.float32)
    cam = cam.at[0, 0:9].set(jnp.asarray(R_w2c, jnp.float32).reshape(9))
    cam = cam.at[0, 9:12].set(jnp.asarray(t_w2c, jnp.float32))
    cam = cam.at[0, 12:14].set(jnp.asarray(focal, jnp.float32))
    cam = cam.at[0, 14:16].set(jnp.asarray(principal_px, jnp.float32))
    cam = cam.at[0, 16:18].set(jnp.asarray(resolution_wh, jnp.float32))
    cam = cam.at[0, 18].set(jnp.asarray(sh_degree, jnp.float32))

    statics = (
        ("max_degree", max_degree),
        ("with_normal", with_normal),
        ("near", float(near_plane)),
        ("far", float(far_plane)),
        ("radius_clip", float(radius_clip)),
        # Sublane width of a logical row (see _block_math); 8 = full vregs.
        ("w", 8 if wide else 1),
        ("gm", gm),
    )
    out = _proj_sh_packed(cam, attr, shs_in, statics)[:, :n]

    res = {
        "depth": out[R_DEPTH],
        "mean_2d": out[R_MX : R_MY + 1].T,
        "conic": out[R_CA : R_CC + 1].T,
        "radius": jax.lax.stop_gradient(out[R_RADIUS]).astype(jnp.int32),
        "compensation": out[R_COMP],
        "valid": jax.lax.stop_gradient(out[R_VALID]) > 0.5,
        "rgb": out[R_RGB : R_RGB + 3].T,
    }
    if with_normal:
        res["normal"] = out[R_NORMAL : R_NORMAL + 3].T
    return res
