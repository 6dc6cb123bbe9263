"""Depth supervision: SSI loss with monocular depth priors, anchored to SfM.

Reference: src/depth_supervision.jl. The per-camera affine "anchor" mapping
prior values into (inverse-)depth is fitted ONCE at startup against the SfM
cloud (host-side numpy here — it ran on the host in the reference too); the
per-step loss is pure JAX.

Semantics preserved:
  - RANSAC affine fit: LS init -> MAD epsilon = 3*1.4826*median, 256 2-point
    hypotheses scored on a <=16384 subset, 2 LS refits; usability gates
    (>=256 samples, inlier fraction >= 0.3, |corr| >= 0.35); support
    quantiles 2%/98% (ransac_affine_fit, :136-200);
  - per-camera disparity & depth candidate fits with depth floor
    5%*median(z); dataset-wide disparity-vs-depth majority vote (mode :ssi)
    and slope-sign vote dropping outvoted cameras (fit_depth_anchors);
  - target construction with quantization deadband (through the inversion
    for the depth model) and the far-extrapolation flag target < p_far
    (depth_target, :425-438);
  - ssi_depth_loss: alpha-weighted Geman-McClure on the deadbanded residual
    of p = 1/(D/alpha + floor) — RAW alpha in the differentiable path (the
    clamp-adjoint trap) — scaled by the detached supported-pixel std, plus
    forward-difference gradient matching, normalized by sum(alpha);
    far-extrapolated pixels are supervised one-sidedly (never pulled nearer)
    and excluded from the gradient term (:473-536);
  - TOML sidecar cache keyed by a content fingerprint (:360-404).
"""
from __future__ import annotations

import hashlib
import os

import jax
import jax.numpy as jnp
import numpy as np

DEPTH_LOSS_MIN_ALPHA = 1e-3
DEPTH_LOSS_RESIDUAL_SCALE = 2.0


class DepthAnchor:
    """a*t + b maps prior t to inverse depth (disparity model) or depth."""

    __slots__ = ("a", "b", "floor", "disparity", "p_far")

    def __init__(self, a, b, floor, disparity, p_far):
        self.a = float(a)
        self.b = float(b)
        self.floor = float(floor)
        self.disparity = float(disparity)
        self.p_far = float(p_far)

    def to_dict(self):
        return {k: getattr(self, k) for k in self.__slots__}

    @classmethod
    def from_dict(cls, d):
        return cls(d["a"], d["b"], d["floor"], d["disparity"], d["p_far"])


class AnchorFit:
    __slots__ = ("a", "b", "corr", "inlier_fraction", "t_lo", "t_hi", "usable")

    def __init__(self, a, b, corr, inlier_fraction, t_lo, t_hi, usable):
        self.a, self.b = float(a), float(b)
        self.corr = float(corr)
        self.inlier_fraction = float(inlier_fraction)
        self.t_lo, self.t_hi = float(t_lo), float(t_hi)
        self.usable = bool(usable)


def ls_affine_fit(ts, ys, var_ridge: float = 1.5e-5):
    """y ~ a*t + b with slope ridge (depth_supervision.jl:120-127)."""
    mt, my = ts.mean(), ys.mean()
    cov = ((ts - mt) * (ys - my)).mean()
    var = ((ts - mt) ** 2).mean()
    a = cov / (var + var_ridge)
    return float(a), float(my - a * mt)


def ransac_affine_fit(
    ts,
    ys,
    *,
    rng=None,
    ransac_iterations: int = 256,
    min_anchor_samples: int = 256,
    anchor_min_inlier_fraction: float = 0.3,
    anchor_min_corr: float = 0.35,
    score_subset: int = 16_384,
    support_quantile: float = 0.02,
) -> AnchorFit:
    """RANSAC affine regression (depth_supervision.jl:136-200)."""
    rng = rng or np.random.default_rng(0)
    ts = np.asarray(ts, np.float64)
    ys = np.asarray(ys, np.float64)
    n = len(ts)
    a, b = ls_affine_fit(ts, ys)
    res = np.abs(ys - (a * ts + b))
    eps = max(3.0 * 1.4826 * np.median(res), 1e-8)

    if n <= score_subset:
        sub = np.arange(n)
    else:
        sub = np.round(np.linspace(0, n - 1, score_subset)).astype(int)

    def score(a, b):
        return int(np.sum(np.abs(ys[sub] - (a * ts[sub] + b)) <= eps))

    best = (a, b, score(a, b))
    for _ in range(ransac_iterations):
        i, j = rng.integers(0, n, 2)
        dt = ts[i] - ts[j]
        if abs(dt) < 1e-8:
            continue
        ai = (ys[i] - ys[j]) / dt
        bi = ys[i] - ai * ts[i]
        s = score(ai, bi)
        if s > best[2]:
            best = (ai, bi, s)

    a, b = best[0], best[1]
    inliers = np.array([], int)
    for _ in range(2):
        inliers = np.flatnonzero(np.abs(ys - (a * ts + b)) <= eps)
        if len(inliers) < min_anchor_samples:
            break
        a, b = ls_affine_fit(ts[inliers], ys[inliers])

    frac = len(inliers) / n
    if len(inliers) < 2:
        corr, t_lo, t_hi = 0.0, 0.0, 0.0
    else:
        with np.errstate(invalid="ignore"):
            c = np.corrcoef(ts[inliers], ys[inliers])[0, 1]
        corr = float(c) if np.isfinite(c) else 0.0
        ti = ts[inliers]
        t_lo = float(np.quantile(ti, support_quantile))
        t_hi = float(np.quantile(ti, 1.0 - support_quantile))

    usable = (
        n >= min_anchor_samples
        and frac >= anchor_min_inlier_fraction
        and abs(corr) >= anchor_min_corr
    )
    return AnchorFit(a, b, corr, frac, t_lo, t_hi, usable)


def robust_aabb(points, q: float = 0.01, pad: float = 0.1):
    lo = np.quantile(points, q, axis=0)
    hi = np.quantile(points, 1.0 - q, axis=0)
    m = pad * (hi - lo)
    return lo - m, hi + m


def collect_anchor_samples(
    points, camera, prior, *, aabb_min, aabb_max,
    near_plane: float = 0.2, max_anchor_samples: int = 262_144,
):
    """(prior value, camera-space z) pairs at projected SfM points
    (depth_supervision.jl:216-251). prior: (H, W)."""
    n = len(points)
    stride = max(1, -(-n // max_anchor_samples))
    pts = points[::stride]
    inbox = np.all((pts >= aabb_min) & (pts <= aabb_max), axis=1)
    pts = pts[inbox]
    R = np.asarray(camera.R)
    t = np.asarray(camera.t)
    p = pts @ R.T + t
    z = p[:, 2]
    ok = z > near_plane
    p, z = p[ok], z[ok]
    w, h = camera.width, camera.height
    fx, fy = np.asarray(camera.focal)
    cx = float(camera.principal[0]) * w
    cy = float(camera.principal[1]) * h
    px = np.floor(fx * p[:, 0] / z + cx).astype(int)
    py = np.floor(fy * p[:, 1] / z + cy).astype(int)
    ok = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    px, py, z = px[ok], py[ok], z[ok]
    tp = prior[py, px]
    ok = np.isfinite(tp) & (tp > 0)
    return tp[ok].astype(np.float32), z[ok].astype(np.float32)


def fit_depth_anchors(
    points, cameras, priors, *, mode: str = "ssi",
    min_anchor_samples: int = 256,
    depth_floor_fraction: float = 0.05,
    flat_prior_var: float = 1e-6,
    seed: int = 0,
):
    """Per-camera anchors with dataset-wide parameterization & slope votes
    (depth_supervision.jl:265-337). Returns list[DepthAnchor | None]."""
    modes = ("ssi", "ssi_disparity", "ssi_depth")
    if mode not in modes:
        raise ValueError(f"Invalid depth loss mode: {mode} not in {modes}")
    rng = np.random.default_rng(seed)

    anchors = [None] * len(cameras)
    fits = [None] * len(cameras)
    aabb_min, aabb_max = robust_aabb(np.asarray(points))
    for i, (cam, prior) in enumerate(zip(cameras, priors)):
        if prior is None:
            continue
        ts, zs = collect_anchor_samples(
            np.asarray(points), cam, prior, aabb_min=aabb_min, aabb_max=aabb_max
        )
        if len(ts) < min_anchor_samples or np.var(ts) < flat_prior_var:
            continue
        floor = max(1e-8, depth_floor_fraction * float(np.median(zs)))
        fits[i] = dict(
            floor=floor,
            disparity=ransac_affine_fit(
                ts, 1.0 / (zs + floor), rng=rng, min_anchor_samples=min_anchor_samples
            ),
            depth=ransac_affine_fit(ts, zs, rng=rng, min_anchor_samples=min_anchor_samples),
        )

    if mode == "ssi":
        votes = total = 0
        for fit in fits:
            if fit is None or not (fit["disparity"].usable or fit["depth"].usable):
                continue
            total += 1
            better_disp = not fit["depth"].usable or (
                fit["disparity"].usable
                and abs(fit["disparity"].corr) >= abs(fit["depth"].corr)
            )
            votes += int(better_disp)
        disparity = votes >= total - votes
    else:
        disparity = mode == "ssi_disparity"

    def selected(fit):
        return fit["disparity"] if disparity else fit["depth"]

    sign_vote = sum(
        int(np.sign(selected(f).a)) for f in fits if f is not None and selected(f).usable
    )
    slope_sign = 1.0 if sign_vote >= 0 else -1.0

    for i, fit in enumerate(fits):
        if fit is None:
            continue
        f = selected(fit)
        if not (f.usable and np.sign(f.a) == slope_sign):
            continue
        anchors[i] = make_anchor(
            f.a, f.b, fit["floor"], float(disparity), f.t_lo, f.t_hi
        )
    return anchors


def anchor_target_value(a, b, floor, disparity, t):
    """Scalar prior -> inverse-depth target (depth_supervision.jl:63-68)."""
    affine = a * t + b
    return min(affine, 1.0 / floor) if disparity > 0 else 1.0 / (affine + floor)


def make_anchor(a, b, floor, disparity, t_lo, t_hi) -> DepthAnchor:
    """Derive p_far from the support bracket (depth_supervision.jl:87-98):
    the farther endpoint target; degenerate/non-positive brackets yield 0
    (two-sided supervision everywhere)."""
    if not (t_hi > t_lo):
        return DepthAnchor(a, b, floor, disparity, 0.0)
    p_lo = anchor_target_value(a, b, floor, disparity, t_lo)
    p_hi = anchor_target_value(a, b, floor, disparity, t_hi)
    p_far = min(p_lo, p_hi)
    if not (np.isfinite(p_far) and p_far > 0.0):
        p_far = 0.0
    return DepthAnchor(a, b, floor, disparity, p_far)


# --- sidecar cache ---------------------------------------------------------


def anchors_fingerprint(points, names, mode: str) -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(points[:1024], np.float32).tobytes())
    h.update(str(len(points)).encode())
    h.update("|".join(names).encode())
    h.update(mode.encode())
    return h.hexdigest()[:16]


def save_anchor_cache(path: str, anchors, fingerprint: str) -> None:
    import json

    data = {
        "fingerprint": fingerprint,
        "anchors": [a.to_dict() if a is not None else None for a in anchors],
    }
    with open(path, "w") as f:
        json.dump(data, f)


def load_anchor_cache(path: str, fingerprint: str):
    import json

    if not os.path.exists(path):
        return None
    with open(path) as f:
        data = json.load(f)
    if data.get("fingerprint") != fingerprint:
        return None
    return [DepthAnchor.from_dict(d) if d is not None else None for d in data["anchors"]]


# --- per-step target + loss (pure JAX) -------------------------------------


def depth_target(anchor: DepthAnchor, prior, qstep: float):
    """(target inverse-depth, deadband half-width, valid, far_extrap)
    (depth_supervision.jl:425-438). prior: (H, W) jnp/np array."""
    prior = jnp.asarray(prior, jnp.float32)
    affine = anchor.a * prior + anchor.b
    valid = jnp.isfinite(prior) & (prior > 0.0) & (affine > 0.0)
    # Sanitize invalid pixels: the loss masks them by weight, but 0*nan
    # would still poison the sum (the reference only ever loads finite PNG
    # priors, so it never hits this).
    affine = jnp.where(valid, affine, 1.0)
    half_step = 0.5 * qstep * abs(anchor.a)
    if anchor.disparity > 0:
        target = jnp.minimum(affine, 1.0 / anchor.floor)
        half_band = jnp.full_like(prior, half_step)
    else:
        target = 1.0 / (affine + anchor.floor)
        half_band = half_step * target**2
    far_extrap = target < anchor.p_far
    return target, half_band, valid, far_extrap


def geman_mcclure(x):
    return 0.5 * x * x / (1.0 + x * x)


def deadband(r, half):
    return jnp.sign(r) * jnp.maximum(jnp.abs(r) - half, 0.0)


def ssi_depth_loss(
    depth_img, alpha, *, target, half_band, valid, far_extrap,
    depth_floor: float, grad_weight: float = 1.0,
):
    """SSI depth loss (depth_supervision.jl:473-536). All images (H, W)."""
    sg = jax.lax.stop_gradient
    a = jnp.clip(sg(alpha), 0.0, 1.0)
    w = jnp.where(valid & (a > DEPTH_LOSS_MIN_ALPHA), a, 0.0)
    sum_a = jnp.maximum(sg(jnp.sum(a)), 1.0)
    one_sided = jnp.where(far_extrap, 1.0, 0.0)
    w_sup = w * (1.0 - one_sided)

    # RAW alpha in the differentiable path (clamp-adjoint trap).
    p = 1.0 / (depth_img / jnp.maximum(alpha, 1e-6) + depth_floor)

    sw = jnp.maximum(jnp.sum(w_sup), 1e-6)
    mu = jnp.sum(w_sup * sg(p)) / sw
    sigma = jnp.maximum(
        jnp.sqrt(jnp.maximum(jnp.sum(w_sup * (sg(p) - mu) ** 2) / sw, 0.0)), 1e-6
    )
    iscale = 1.0 / (DEPTH_LOSS_RESIDUAL_SCALE * sigma)

    r = deadband(p - target, half_band)
    r = r - one_sided * jnp.minimum(r, 0.0)  # one-sided: only nearer penalized
    data = jnp.sum(w * geman_mcclure(r * iscale))

    # Forward differences along x (axis 1) and y (axis 0).
    hx = (p[:, 1:] - p[:, :-1]) - (target[:, 1:] - target[:, :-1])
    bx = half_band[:, 1:] + half_band[:, :-1]
    wx = jnp.minimum(w_sup[:, 1:], w_sup[:, :-1])
    grad_x = jnp.sum(wx * geman_mcclure(deadband(hx, bx) * iscale))

    hy = (p[1:, :] - p[:-1, :]) - (target[1:, :] - target[:-1, :])
    by = half_band[1:, :] + half_band[:-1, :]
    wy = jnp.minimum(w_sup[1:, :], w_sup[:-1, :])
    grad_y = jnp.sum(wy * geman_mcclure(deadband(hy, by) * iscale))

    return (data + grad_weight * (grad_x + grad_y)) / sum_a
