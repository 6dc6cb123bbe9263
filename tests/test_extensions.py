"""Auxiliary differentiable models: bilateral grid, geometry regularization,
sky dome, depth supervision, camera pose optimization.

Mirrors reference test categories 4 & 5 (runtests.jl:326-452, 522-553,
577-695, 760-902).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from conftest import finite_difference_grad

from gsplat_tpu.camera import Camera, rotation_6d_to_matrix
from gsplat_tpu.models.bilateral_grid import (
    bilateral_grid_lr,
    bilateral_slice,
    make_bilateral_grids,
    tv_loss,
)
from gsplat_tpu.models.camera_opt import pose_delta
from gsplat_tpu.models.depth_supervision import (
    depth_target,
    ls_affine_fit,
    make_anchor,
    ransac_affine_fit,
    ssi_depth_loss,
)
from gsplat_tpu.models.geometry_regularization import (
    depth_normal_consistency_loss,
    flatten_loss,
    pixel_rays,
)
from gsplat_tpu.models.sky_dome import (
    SkyDome,
    composite_sky,
    fibonacci_sphere,
    sky_dome_directions,
    sky_opacity_loss,
)


# --- bilateral grid (runtests.jl:522-553) ----------------------------------


def test_bilateral_identity_init(rng):
    grids = make_bilateral_grids(3)
    img = jnp.asarray(rng.uniform(0, 1, (32, 48, 3)), jnp.float32)
    out = bilateral_slice(img, grids[1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
    assert float(tv_loss(grids)) == 0.0


def test_bilateral_gradient_routes_to_used_grid(rng):
    grids = make_bilateral_grids(3)
    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)), jnp.float32)

    def loss(grids):
        return jnp.sum(bilateral_slice(img, grids[1]) ** 2)

    g = np.asarray(jax.grad(loss)(grids))
    assert np.any(g[1] != 0)
    assert np.all(g[0] == 0) and np.all(g[2] == 0)


def test_bilateral_affine_applies(rng):
    """A grid holding a constant non-identity affine transforms the colors."""
    grids = np.asarray(make_bilateral_grids(1)).copy()
    grids[0, ..., 3] = 0.25  # r output += 0.25 bias
    img = jnp.asarray(rng.uniform(0.2, 0.8, (16, 16, 3)), jnp.float32)
    out = np.asarray(bilateral_slice(img, jnp.asarray(grids[0])))
    np.testing.assert_allclose(out[..., 0], np.asarray(img)[..., 0] + 0.25, atol=1e-5)
    np.testing.assert_allclose(out[..., 1:], np.asarray(img)[..., 1:], atol=1e-5)


def test_bilateral_lr_schedule():
    lr = 2e-3
    assert float(bilateral_grid_lr(0, lr, 30000)) == pytest.approx(0.01 * lr, rel=1e-4)
    assert float(bilateral_grid_lr(1000, lr, 30000)) == pytest.approx(
        lr * (0.01) ** (1000 / 30000), rel=1e-3
    )


# --- geometry regularization (runtests.jl:613-695) -------------------------


def _plane_scene(w=32, h=32, nx=0.3, nz=-1.0):
    """Analytic slanted plane z = z0 + slope*x with its exact normal."""
    cam = Camera.create(width=w, height=h, focal=np.array([40.0, 40.0], np.float32))
    rx, ry = pixel_rays(cam)
    # plane: n . p = c with n=(nx, 0, nz); p = e*(rx, ry, 1)
    n = np.array([nx, 0.0, nz])
    n = n / np.linalg.norm(n)
    c = 4.0 * n[2]  # plane through (0, 0, 4): n . (0,0,4) = 4*nz
    denom = n[0] * np.asarray(rx)[None, :] + n[2]
    e = c / denom  # (H, W) expected depth along rays
    e = np.broadcast_to(e, (h, w)).astype(np.float32)
    alpha = np.ones((h, w), np.float32)
    depth = e * alpha
    normals = np.broadcast_to(n.astype(np.float32), (h, w, 3)).copy()
    return cam, (rx, ry), depth, alpha, normals


def test_normal_consistency_zero_on_exact_plane():
    cam, rays, depth, alpha, normals = _plane_scene()
    loss = depth_normal_consistency_loss(
        jnp.asarray(depth), jnp.asarray(alpha), jnp.asarray(normals), rays=rays
    )
    assert float(loss) < 1e-4


def test_normal_consistency_positive_on_wrong_normals():
    cam, rays, depth, alpha, normals = _plane_scene()
    wrong = np.broadcast_to(np.array([0.0, 1.0, 0.0], np.float32), normals.shape)
    loss = depth_normal_consistency_loss(
        jnp.asarray(depth), jnp.asarray(alpha), jnp.asarray(wrong), rays=rays
    )
    assert float(loss) > 0.5


def test_normal_consistency_alpha_quotient_identity():
    """The quotient rule alpha-cotangent identity grad_a ~ -(D/a)*grad_D
    (guards the clamp-adjoint trap, runtests.jl:638-695)."""
    cam, rays, depth, alpha, normals = _plane_scene()
    depth_j = jnp.asarray(depth) * 0.97  # slight mismatch so grads exist

    gD = jax.grad(
        lambda d: depth_normal_consistency_loss(
            d, jnp.asarray(alpha), jnp.asarray(normals), rays=rays
        )
    )(depth_j)
    gA = jax.grad(
        lambda a: depth_normal_consistency_loss(
            depth_j, a, jnp.asarray(normals), rays=rays
        )
    )(jnp.asarray(alpha))
    # At alpha == 1 (saturated!): d/da (D/a) = -D/a^2 = -(D/a) * d/dD(D/a)
    lhs = np.asarray(gA)
    rhs = -np.asarray(depth_j) / np.asarray(alpha) * np.asarray(gD)
    # Saturated pixels must carry gradient (the trap would zero them).
    assert np.abs(lhs).max() > 0
    np.testing.assert_allclose(lhs, rhs, rtol=1e-3, atol=1e-7)


def test_flatten_loss_tie_breaking():
    # All-tied scales: only the FIRST axis counts (runtests.jl:613-636).
    scales = jnp.zeros((4, 3), jnp.float32)
    loss = flatten_loss(scales)
    assert float(loss) == pytest.approx(1.0)  # exp(0), one axis per gaussian
    g = np.asarray(jax.grad(lambda s: flatten_loss(s))(scales))
    assert np.all(g[:, 0] != 0)
    assert np.all(g[:, 1:] == 0)


def test_flatten_loss_min_axis_only(rng):
    scales = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    g = np.asarray(jax.grad(lambda s: flatten_loss(s))(scales))
    mins = np.argmin(np.asarray(scales), axis=1)
    for i in range(8):
        nz = np.flatnonzero(g[i])
        assert list(nz) == [mins[i]]


# --- sky dome (runtests.jl:799-882) ----------------------------------------


def test_fibonacci_lattice_properties():
    dirs, spacing = fibonacci_sphere(1000)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=1), 1.0, atol=1e-5)
    # Equal-area: mean z ~ 0, both hemispheres populated.
    assert abs(dirs[:, 2].mean()) < 0.01
    assert spacing == pytest.approx(np.sqrt(4 * np.pi / 1000))


def test_hemisphere_cut():
    up = np.array([0.0, 0.0, 1.0], np.float32)
    dirs, _ = sky_dome_directions(500, "hemisphere", up)
    assert np.all(dirs @ up >= 0.0)
    assert abs(len(dirs) - 500) < 50  # cut lands near n
    with pytest.raises(ValueError):
        sky_dome_directions(10, "cube", up)


def test_sky_dome_hole_free():
    """Rendered dome alpha > 0.98 everywhere (sealed shell,
    runtests.jl:799-812)."""
    cam = Camera.create(width=64, height=64, focal=np.array([60.0, 60.0], np.float32))
    dome = SkyDome(cam, n_points=2048, shape="sphere", radius=10.0, impl="scan",
                   max_instances=1 << 16)
    from gsplat_tpu.ops.rasterize import RasterizerConfig, rasterize

    cfg = RasterizerConfig(width=64, height=64, mode="rgbd",
                           far_plane=4 * dome.radius, max_instances=1 << 16, impl="scan")
    img, aux = rasterize(
        dome.points, dome.rotations, jnp.exp(dome.scales_raw),
        jax.nn.sigmoid(dome.opacities_raw), dome.init_features_dc,
        camera=cam, config=cfg, sh_degree=0,
    )
    assert float(jnp.min(aux["alpha"])) > 0.98
    # Constant gray color everywhere.
    np.testing.assert_allclose(np.asarray(img[..., :3]), 0.5, atol=0.02)


def test_sky_dome_mixed_resolution():
    """SkyDome.render must follow the render camera's resolution, not the
    construction camera's (config_for caches per (W, H); the reference
    rebuilds its rasterizer on resize, gui/worker.jl:628-632)."""
    cam = Camera.create(width=64, height=48, focal=np.array([60.0, 60.0], np.float32))
    dome = SkyDome(cam, n_points=512, shape="sphere", radius=10.0, impl="scan",
                   max_instances=1 << 14)
    small = cam.with_resolution(32, 32)
    img = dome.render(small, dome.init_features_dc)
    assert img.shape == (32, 32, 3)
    img2 = dome.render(cam, dome.init_features_dc)
    assert img2.shape == (48, 64, 3)
    # The cache hands back one config object per resolution.
    assert dome.config_for(small) is dome.config_for(small)
    assert dome.config_for(cam) is dome.config


def test_composite_sky_identity(rng):
    img = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)), jnp.float32)
    sky = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)), jnp.float32)
    # alpha = 1: scene fully opaque, sky invisible.
    out = composite_sky(img, jnp.ones((8, 8)), sky)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))
    # alpha = 0: pure sky on top of zero image.
    out = composite_sky(jnp.zeros((8, 8, 3)), jnp.zeros((8, 8)), sky)
    np.testing.assert_allclose(np.asarray(out), np.asarray(sky))


def test_sky_opacity_loss_saturated_gradient(rng):
    """Gradient must survive at alpha == 1 (runtests.jl:884-902)."""
    alpha = jnp.ones((8, 8), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (8, 8)) > 0.5, jnp.float32)
    g = np.asarray(jax.grad(lambda a: sky_opacity_loss(a, mask))(alpha))
    m = np.asarray(mask) > 0
    assert np.all(g[m] > 0)
    assert np.all(g[~m] == 0)


# --- depth supervision (runtests.jl:326-452) -------------------------------


def test_ransac_outlier_robustness(rng):
    """25% gross outliers: RANSAC recovers the slope where LS is dragged off
    (calibrated to the reference test, runtests.jl:354-363)."""
    t = np.arange(1, 1001, dtype=np.float32)
    y = 2.0 * t + 3.0
    y[::4] = rng.uniform(-1000, 2000, len(y[::4])).astype(np.float32)
    fit = ransac_affine_fit(t, y, rng=rng)
    assert fit.usable
    assert fit.a == pytest.approx(2.0, abs=0.1)
    assert fit.corr > 0.8
    assert fit.inlier_fraction > 0.6
    # Clean data: exact recovery + support quantiles.
    f2 = ransac_affine_fit(t, 2.0 * t + 3.0, rng=rng)
    assert f2.a == pytest.approx(2.0, abs=1e-3)
    assert f2.b == pytest.approx(3.0, abs=1e-2)
    assert f2.t_lo == pytest.approx(np.quantile(t, 0.02), abs=1.0)
    assert f2.t_hi == pytest.approx(np.quantile(t, 0.98), abs=1.0)


def test_ransac_usability_gates(rng):
    # Too few samples.
    t = rng.uniform(0, 1, 50).astype(np.float32)
    fit = ransac_affine_fit(t, 2 * t, rng=rng)
    assert not fit.usable
    # No correlation.
    t = rng.uniform(0, 1, 2000).astype(np.float32)
    fit = ransac_affine_fit(t, rng.normal(size=2000).astype(np.float32), rng=rng)
    assert not fit.usable


def test_anchor_extrapolation_semantics():
    # Disparity anchor supported on t in [0.2, 0.8]: targets below the
    # far-end value are extrapolation (sky).
    anchor = make_anchor(a=1.0, b=0.1, floor=0.05, disparity=1.0, t_lo=0.2, t_hi=0.8)
    assert anchor.p_far == pytest.approx(0.3)  # min endpoint target
    prior = jnp.asarray(np.array([[0.05, 0.5, 0.9]], np.float32))
    target, half, valid, far = depth_target(anchor, prior, qstep=0.0)
    assert bool(far[0, 0]) and not bool(far[0, 1]) and not bool(far[0, 2])
    # Degenerate bracket -> p_far 0, no extrapolation flags.
    a2 = make_anchor(1.0, 0.1, 0.05, 1.0, 0.5, 0.5)
    assert a2.p_far == 0.0


def test_ssi_depth_loss_gradient_signs():
    """One-sided far-extrapolated pixels: only a nearer render is penalized
    (runtests.jl:419-452)."""
    H = W = 8
    floor = 0.05
    target = jnp.full((H, W), 0.2, jnp.float32)
    half = jnp.zeros((H, W))
    valid = jnp.ones((H, W), bool)
    alpha = jnp.full((H, W), 0.9, jnp.float32)

    def loss(depth, far):
        return ssi_depth_loss(
            depth, alpha, target=target, half_band=half, valid=valid,
            far_extrap=far, depth_floor=floor, grad_weight=0.0,
        )

    far = jnp.ones((H, W), bool)
    # Render NEARER than the target (p > target): penalized, grad pushes away.
    near_depth = jnp.full((H, W), 2.0, jnp.float32) * 0.9  # p = 1/(2+f) ~ 0.49
    g = np.asarray(jax.grad(lambda d: loss(d, far))(near_depth))
    assert np.all(g < 0)  # decrease p -> increase depth: push farther
    # Render FARTHER than the target (p < target): one-sided, zero gradient.
    far_depth = jnp.full((H, W), 20.0, jnp.float32) * 0.9
    g = np.asarray(jax.grad(lambda d: loss(d, far))(far_depth))
    np.testing.assert_allclose(g, 0.0, atol=1e-10)
    # Two-sided pixels DO pull farther renders nearer.
    g = np.asarray(jax.grad(lambda d: loss(d, jnp.zeros((H, W), bool)))(far_depth))
    assert np.all(g > 0)


def test_ssi_loss_alpha_gradient_at_saturation():
    """Raw (unclamped) alpha path: cotangent survives alpha == 1."""
    H = W = 8
    target = jnp.full((H, W), 0.3, jnp.float32)
    alpha = jnp.ones((H, W), jnp.float32)
    depth = jnp.full((H, W), 5.0, jnp.float32)
    g = np.asarray(
        jax.grad(
            lambda a: ssi_depth_loss(
                depth, a, target=target, half_band=jnp.zeros((H, W)),
                valid=jnp.ones((H, W), bool), far_extrap=jnp.zeros((H, W), bool),
                depth_floor=0.05, grad_weight=0.0,
            )
        )(alpha)
    )
    assert np.abs(g).max() > 0


# --- camera pose optimization (examples/pose_opt.jl) -----------------------


def test_rotation_6d_identity():
    d6 = jnp.array([1.0, 0, 0, 0, 1, 0], jnp.float32)
    np.testing.assert_allclose(np.asarray(rotation_6d_to_matrix(d6)), np.eye(3), atol=1e-6)


def test_pose_delta_zero_is_identity(rng):
    R = rotation_6d_to_matrix(jnp.asarray(rng.normal(size=6), jnp.float32))
    t = jnp.asarray(rng.normal(size=3), jnp.float32)
    R2, t2 = pose_delta(R, t, jnp.zeros(6), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-6)


def test_pose_gradients_flow_through_rasterizer(rng):
    """Gradients reach (drot, dt) through the render (the rasterizer's
    R_w2c/t_w2c path, rasterizer.jl:207,286-291)."""
    from gsplat_tpu.ops.rasterize import RasterizerConfig, rasterize
    from gsplat_tpu.ops.sh import rgb_to_sh_dc

    cam = Camera.create(width=32, height=32, focal=np.array([30.0, 30.0], np.float32))
    cfg = RasterizerConfig(width=32, height=32, mode="rgb", max_instances=2048,
                           chunk=8, impl="scan")
    n = 20
    means = jnp.asarray(np.stack([
        rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(2, 6, n)], 1), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.full((n, 3), 0.2, jnp.float32)
    opac = jnp.full((n,), 0.8, jnp.float32)
    shs = jnp.asarray(np.asarray(rgb_to_sh_dc(rng.uniform(0, 1, (n, 3)))), jnp.float32)[:, None]

    target, _ = rasterize(means, quats, scales, opac, shs, camera=cam, config=cfg, sh_degree=0)

    def loss(drot, dt):
        R, t = pose_delta(cam.R, cam.t, drot, dt)
        img, _ = rasterize(means, quats, scales, opac, shs, camera=cam, config=cfg,
                           sh_degree=0, R_w2c=R, t_w2c=t)
        return jnp.mean((img - target) ** 2)

    g_rot, g_t = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(rng.normal(size=6).astype(np.float32)) * 0.01,
        jnp.asarray(rng.normal(size=3).astype(np.float32)) * 0.01,
    )
    assert np.all(np.isfinite(np.asarray(g_rot))) and np.any(np.asarray(g_rot) != 0)
    assert np.all(np.isfinite(np.asarray(g_t))) and np.any(np.asarray(g_t) != 0)


def test_pose_optimization_recovers_perturbation(rng):
    """End-to-end pose recovery (reference examples/pose_opt.jl): optimize
    6D+translation deltas until a perturbed camera re-aligns."""
    from gsplat_tpu.ops.rasterize import RasterizerConfig, rasterize
    from gsplat_tpu.ops.sh import rgb_to_sh_dc
    import jax

    cam = Camera.create(width=48, height=48, focal=np.array([45.0, 45.0], np.float32))
    cfg = RasterizerConfig(width=48, height=48, mode="rgb", max_instances=4096,
                           chunk=8, impl="scan")
    n = 40
    means = jnp.asarray(np.stack([
        rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(2.5, 6, n)], 1), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.full((n, 3), 0.25, jnp.float32)
    opac = jnp.full((n,), 0.8, jnp.float32)
    shs = jnp.asarray(np.asarray(rgb_to_sh_dc(rng.uniform(0, 1, (n, 3)))), jnp.float32)[:, None]
    gt_args = (means, quats, scales, opac, shs)

    target, _ = rasterize(*gt_args, camera=cam, config=cfg, sh_degree=0)

    # Perturb the pose; recover it through the rasterizer's pose gradients.
    d6 = jnp.asarray(np.array([1, 0.03, -0.02, 0.02, 1, 0.03], np.float32))
    R_bad = cam.R @ rotation_6d_to_matrix(d6)
    t_bad = cam.t + jnp.asarray(np.array([0.05, -0.04, 0.03], np.float32))

    def loss(drot, dt, R0, t0):
        R, t = pose_delta(R0, t0, drot, dt)
        img, _ = rasterize(*gt_args, camera=cam, config=cfg, sh_degree=0, R_w2c=R, t_w2c=t)
        return jnp.mean((img - target) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    R0, t0 = R_bad, t_bad
    l0 = float(loss(jnp.zeros(6), jnp.zeros(3), R0, t0))
    lr = 1e-3
    for _ in range(60):
        (l, (g_r, g_t)) = grad_fn(jnp.zeros(6), jnp.zeros(3), R0, t0)
        # single-step Adam from zero state = sign-like step (camera_opt.py)
        dr = -lr * g_r / (jnp.abs(g_r) + 1e-15)
        dt = -lr * g_t / (jnp.abs(g_t) + 1e-15)
        R0, t0 = pose_delta(R0, t0, dr, dt)
    l1 = float(loss(jnp.zeros(6), jnp.zeros(3), R0, t0))
    assert l1 < l0 * 0.35, f"pose opt failed: {l0:.5f} -> {l1:.5f}"
