"""Gradcheck + behavior tests for the projection op.

Mirrors the reference's finite-difference backbone (test/runtests.jl:95-306):
every adjoint the reference hand-derives is checked here against central
differences through `jax.grad` of the same closed forms — including inside
and outside the FOV clamp (runtests.jl:188-192).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from conftest import finite_difference_grad

from gsplat_tpu.ops import projection as P


def test_quat_to_rotmat_orthonormal(rng):
    q = rng.normal(size=4)
    R = np.asarray(P.quat_to_rotmat(jnp.asarray(q)))
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)


def test_quat_to_rotmat_radial_nullspace(rng):
    """Gradient of any function of R(q) is orthogonal to q: scaling an
    unnormalized quaternion leaves R unchanged (runtests.jl:123)."""
    q = rng.normal(size=4)

    def f(q):
        return jnp.sum(jnp.sin(P.quat_to_rotmat(q)))

    g = np.asarray(jax.grad(f)(jnp.asarray(q)))
    assert abs(np.dot(g, q)) < 1e-10


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_quat_to_rotmat_gradcheck(seed):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=4)
    v = rng.normal(size=(3, 3))

    def f(q):
        return jnp.sum(P.quat_to_rotmat(jnp.asarray(q)) * v)

    g = np.asarray(jax.grad(f)(jnp.asarray(q)))
    g_fd = finite_difference_grad(lambda x: float(f(x)), q)
    np.testing.assert_allclose(g, g_fd, rtol=1e-5, atol=1e-8)


def test_quat_scale_to_cov_gradcheck(rng):
    q = rng.normal(size=4)
    s = np.exp(rng.normal(size=3) * 0.3)
    v = rng.normal(size=(3, 3))

    def f_q(q):
        return jnp.sum(P.quat_scale_to_cov(jnp.asarray(q), jnp.asarray(s)) * v)

    def f_s(s):
        return jnp.sum(P.quat_scale_to_cov(jnp.asarray(q), jnp.asarray(s)) * v)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_q)(jnp.asarray(q))),
        finite_difference_grad(lambda x: float(f_q(x)), q),
        rtol=1e-5,
        atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_s)(jnp.asarray(s))),
        finite_difference_grad(lambda x: float(f_s(x)), s),
        rtol=1e-5,
        atol=1e-8,
    )


def _camera_args():
    focal = jnp.array([300.0, 320.0])
    principal_px = jnp.array([320.0, 240.0])
    resolution = jnp.array([640.0, 480.0])
    return focal, principal_px, resolution


@pytest.mark.parametrize(
    "mean_cam",
    [
        np.array([0.3, -0.2, 2.0]),  # inside the FOV clamp
        np.array([8.0, 6.0, 2.0]),  # far outside: txy clamped
    ],
)
def test_perspective_projection_gradcheck(mean_cam, rng):
    """Inside AND outside the FOV clamp (reference runtests.jl:175-216):
    when clamped, the Jacobian's J[·,3] contribution routes to z."""
    focal, principal_px, resolution = _camera_args()
    cov = rng.normal(size=(3, 3))
    cov = cov @ cov.T + np.eye(3) * 0.1
    v_cov2d = rng.normal(size=(2, 2))
    v_mean2d = rng.normal(size=2)

    def f_mean(m):
        c2, m2 = P._perspective(jnp.asarray(m), jnp.asarray(cov), focal, principal_px, resolution)
        return jnp.sum(c2 * v_cov2d) + jnp.dot(m2, v_mean2d)

    def f_cov(c):
        c2, m2 = P._perspective(
            jnp.asarray(mean_cam), jnp.asarray(c), focal, principal_px, resolution
        )
        return jnp.sum(c2 * v_cov2d) + jnp.dot(m2, v_mean2d)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_mean)(jnp.asarray(mean_cam))),
        finite_difference_grad(lambda x: float(f_mean(x)), mean_cam, eps=1e-5),
        rtol=1e-4,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_cov)(jnp.asarray(cov))),
        finite_difference_grad(lambda x: float(f_cov(x)), cov, eps=1e-5),
        rtol=1e-4,
        atol=1e-7,
    )


def test_add_blur_gradcheck(rng):
    m = rng.normal(size=(2, 2))
    cov = m @ m.T + np.eye(2) * 0.05
    v = rng.normal(size=(2, 2))
    vc = rng.normal()

    def f(c):
        blurred, det, comp = P._add_blur(jnp.asarray(c))
        return jnp.sum(blurred * v) + comp * vc

    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(jnp.asarray(cov))),
        finite_difference_grad(lambda x: float(f(x)), cov, eps=1e-6),
        rtol=1e-4,
        atol=1e-7,
    )


def test_project_one_full_gradcheck(rng):
    """End-to-end gradcheck through the complete projection of one Gaussian."""
    mean = np.array([0.4, -0.3, 3.0])
    quat = rng.normal(size=4)
    scale = np.exp(rng.normal(size=3) * 0.3) * 0.1
    # Small rotation: keeps the Gaussian in front of the camera.
    R = np.asarray(P.quat_to_rotmat(jnp.asarray([1.0, 0.05, -0.03, 0.02])))
    t = np.array([0.1, 0.05, 0.2])
    focal, principal_px, resolution = _camera_args()

    v_mean2d = rng.normal(size=2)
    v_conic = rng.normal(size=3)
    v_depth = rng.normal()

    def loss(mean, quat, scale, R, t):
        out = P.project_one(
            mean,
            quat,
            scale,
            jnp.asarray(R),
            jnp.asarray(t),
            focal,
            principal_px,
            resolution,
        )
        return (
            jnp.dot(out["mean_2d"], v_mean2d)
            + jnp.dot(out["conic"], v_conic)
            + out["depth"] * v_depth
        )

    args = [jnp.asarray(a) for a in (mean, quat, scale, R, t)]
    out = P.project_one(*args[:3], args[3], args[4], focal, principal_px, resolution)
    assert bool(out["valid"]), "test Gaussian should be visible"

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["mean", "quat", "scale", "R", "t"]
    vals = [mean, quat, scale, R, t]
    for i, (name, val) in enumerate(zip(names, vals)):

        def f(x, i=i):
            a = list(vals)
            a[i] = x
            return float(loss(*[jnp.asarray(y) for y in a]))

        g_fd = finite_difference_grad(f, val, eps=1e-5)
        np.testing.assert_allclose(
            np.asarray(grads[i]), g_fd, rtol=2e-4, atol=1e-6, err_msg=f"grad wrt {name}"
        )


def test_project_culling():
    """Near/far-plane and off-screen culls produce valid=False and zeroed
    outputs (projection.jl:79-118)."""
    focal, principal_px, resolution = _camera_args()
    means = jnp.array(
        [
            [0.0, 0.0, 0.1],  # behind near plane
            [0.0, 0.0, 2000.0],  # past far plane
            [0.0, 0.0, 5.0],  # visible
            [100.0, 0.0, 2.0],  # far off-screen
        ]
    )
    n = means.shape[0]
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    scales = jnp.full((n, 3), 0.05)
    out = P.project(
        means,
        quats,
        scales,
        jnp.eye(3),
        jnp.zeros(3),
        focal,
        principal_px,
        resolution,
    )
    valid = np.asarray(out["valid"])
    assert list(valid) == [False, False, True, False]
    assert np.all(np.asarray(out["radius"])[~valid] == 0)
    assert np.all(np.isfinite(np.asarray(out["mean_2d"])))


def test_project_culled_gradients_are_zero_and_finite(rng):
    """Masked Gaussians contribute exactly zero, finite gradients — the
    reference's early-return-on-radii==0 guarantee (projection.jl:170-176)."""
    focal, principal_px, resolution = _camera_args()
    means = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 5.0]])
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
    scales = jnp.full((2, 3), 0.05)

    def loss(means):
        out = P.project(
            means, quats, scales, jnp.eye(3), jnp.zeros(3), focal, principal_px, resolution
        )
        return jnp.sum(out["mean_2d"]) + jnp.sum(out["conic"]) + jnp.sum(out["depth"])

    g = np.asarray(jax.grad(loss)(means))
    assert np.all(np.isfinite(g))
    assert np.all(g[0] == 0.0)
    assert np.any(g[1] != 0.0)


def test_gaussian_normal_smallest_axis_detached(rng):
    """Normal = rotation column of the smallest scale axis, camera-facing;
    scale gets no gradient through the argmin (runtests.jl:577-611)."""
    q = rng.normal(size=4)
    scale = np.array([0.5, 0.05, 0.3])  # axis 1 smallest
    mean_cam = np.array([0.0, 0.0, 3.0])
    R_w2c = np.eye(3)

    R_g = P.quat_to_rotmat(jnp.asarray(q))
    n = P._gaussian_normal(jnp.asarray(R_w2c), R_g, jnp.asarray(scale), jnp.asarray(mean_cam))
    n = np.asarray(n)
    np.testing.assert_allclose(np.linalg.norm(n), 1.0, rtol=1e-6)
    col = np.asarray(R_g)[:, 1]
    assert np.allclose(n, col) or np.allclose(n, -col)
    assert np.dot(n, mean_cam) <= 0.0  # faces the camera

    def f(s):
        return jnp.sum(
            P._gaussian_normal(jnp.asarray(R_w2c), R_g, s, jnp.asarray(mean_cam))
        )

    g_scale = np.asarray(jax.grad(f)(jnp.asarray(scale)))
    assert np.all(g_scale == 0.0)
