"""Fused Pallas projection+SH kernel vs the pure-JAX oracle.

Differential testing (interpret mode on CPU): values and every gradient —
including the camera pose's — must match ops.projection.project +
ops.sh.sh_to_rgb, which are themselves finite-difference-checked
(tests/test_projection.py, tests/test_sh.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.constants import FAR_PLANE, NEAR_PLANE, RADIUS_CLIP
from gsplat_tpu.ops.proj_fused import project_and_sh_fused
from gsplat_tpu.ops.projection import project
from gsplat_tpu.ops.sh import sh_to_rgb


@pytest.fixture()
def scene(rng):
    n = 300
    means = jnp.asarray(
        np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(-1, 9, n)], 1),
        jnp.float32,
    )
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.exp(jnp.asarray(rng.uniform(-3, -1, (n, 3)), jnp.float32))
    shs = jnp.asarray(rng.normal(size=(n, 16, 3)) * 0.3, jnp.float32)
    R = jnp.asarray(np.linalg.qr(rng.normal(size=(3, 3)))[0], jnp.float32)
    t = jnp.asarray(np.array([0.1, -0.2, 0.5]), jnp.float32)
    cam = dict(
        focal=jnp.array([60.0, 65.0]),
        pp=jnp.array([33.0, 31.0]),
        res=jnp.array([64.0, 64.0]),
    )
    return means, quats, scales, shs, R, t, cam


@pytest.mark.parametrize("degree,with_normal", [(0, False), (2, False), (3, True)])
def test_fused_forward_matches_oracle(scene, degree, with_normal):
    means, quats, scales, shs, R, t, cam = scene
    ref = project(
        means, quats, scales, R, t, cam["focal"], cam["pp"], cam["res"],
        with_normal=with_normal,
    )
    rgb_ref = sh_to_rgb(means, shs, -R.T @ t, degree)
    out = project_and_sh_fused(
        means, quats, scales, shs, R, t, cam["focal"], cam["pp"], cam["res"], degree,
        near_plane=NEAR_PLANE, far_plane=FAR_PLANE, radius_clip=RADIUS_CLIP,
        with_normal=with_normal,
    )
    for k in ("depth", "mean_2d", "conic", "compensation"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), rtol=2e-4, atol=2e-4, err_msg=k
        )
    np.testing.assert_array_equal(np.asarray(out["radius"]), np.asarray(ref["radius"]))
    np.testing.assert_array_equal(np.asarray(out["valid"]), np.asarray(ref["valid"]))
    np.testing.assert_allclose(
        np.asarray(out["rgb"]), np.asarray(rgb_ref), rtol=2e-4, atol=2e-4
    )
    if with_normal:
        np.testing.assert_allclose(
            np.asarray(out["normal"]), np.asarray(ref["normal"]), rtol=2e-4, atol=2e-4
        )


def test_fused_gradients_match_oracle(scene):
    means, quats, scales, shs, R, t, cam = scene

    def loss_fused(means, quats, scales, shs, R, t):
        o = project_and_sh_fused(
            means, quats, scales, shs, R, t, cam["focal"], cam["pp"], cam["res"], 3,
            near_plane=NEAR_PLANE, far_plane=FAR_PLANE, radius_clip=RADIUS_CLIP,
            with_normal=True,
        )
        return (
            jnp.sum(o["mean_2d"] ** 2) * 0.01 + jnp.sum(o["conic"]) * 0.01
            + jnp.sum(o["depth"]) * 0.1 + jnp.sum(o["rgb"] ** 2)
            + jnp.sum(o["normal"] * 0.3) + jnp.sum(o["compensation"])
        )

    def loss_ref(means, quats, scales, shs, R, t):
        o = project(
            means, quats, scales, R, t, cam["focal"], cam["pp"], cam["res"],
            with_normal=True,
        )
        rgb = sh_to_rgb(means, shs, -R.T @ t, 3)
        return (
            jnp.sum(o["mean_2d"] ** 2) * 0.01 + jnp.sum(o["conic"]) * 0.01
            + jnp.sum(o["depth"]) * 0.1 + jnp.sum(rgb ** 2)
            + jnp.sum(o["normal"] * 0.3) + jnp.sum(o["compensation"])
        )

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(means, quats, scales, shs, R, t)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(means, quats, scales, shs, R, t)
    for nm, a, b in zip(("means", "quats", "scales", "shs", "R", "t"), g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4, err_msg=nm
        )


def test_fused_rasterize_matches_scan_impl(rng):
    """End-to-end: impl='pallas' (fused prologue + Pallas blend, interpret
    mode) == impl='scan' (pure-JAX prologue + scan blend) for image AND
    input gradients."""
    from gsplat_tpu.camera import Camera
    from gsplat_tpu.ops.rasterize import RasterizerConfig, rasterize

    cam = Camera.create(width=32, height=32, focal=np.array([30.0, 30.0], np.float32))
    n = 80
    means = jnp.asarray(np.stack([
        rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(2, 6, n)], 1), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.full((n, 3), 0.2, jnp.float32)
    opac = jnp.full((n,), 0.7, jnp.float32)
    shs = jnp.asarray(rng.normal(size=(n, 4, 3)) * 0.3, jnp.float32)

    outs = {}
    for impl in ("scan", "pallas"):
        cfg = RasterizerConfig(width=32, height=32, mode="rgbd",
                               max_instances=4096, impl=impl,
                               chunk=8 if impl == "scan" else 128)

        def loss(means, quats, scales, opac, shs):
            img, _ = rasterize(means, quats, scales, opac, shs,
                               camera=cam, config=cfg, sh_degree=1)
            return jnp.mean(img ** 2), img

        (l, img), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4), has_aux=True)(
            means, quats, scales, opac, shs
        )
        outs[impl] = (np.asarray(img), [np.asarray(x) for x in g])

    np.testing.assert_allclose(outs["pallas"][0], outs["scan"][0], rtol=1e-4, atol=1e-5)
    for nm, a, b in zip(("means", "quats", "scales", "opac", "shs"),
                        outs["pallas"][1], outs["scan"][1]):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4, err_msg=nm)
