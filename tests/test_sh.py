"""Spherical harmonics: value + gradient checks (runtests.jl categories 1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from conftest import finite_difference_grad

from gsplat_tpu.constants import SH0
from gsplat_tpu.ops import sh as SH


def test_degree0_constant_color(rng):
    means = rng.normal(size=(5, 3))
    shs = rng.normal(size=(5, 1, 3))
    out = np.asarray(SH.sh_to_rgb(jnp.asarray(means), jnp.asarray(shs), jnp.zeros(3), 0))
    expect = np.maximum(0.0, SH0 * shs[:, 0, :] + 0.5 + 1.1920929e-7)
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_rgb_sh_roundtrip(rng):
    rgb = rng.uniform(0.2, 0.8, size=(4, 3))
    back = np.asarray(SH.sh_dc_to_rgb(SH.rgb_to_sh_dc(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, rtol=1e-6)


@pytest.mark.parametrize("degree", [0, 1, 2, 3])
def test_sh_gradcheck(degree, rng):
    """Gradients w.r.t. coefficients AND means (view-direction path through
    normalize — reference ∇normalize, spherical_harmonics.jl:174-181)."""
    n = 3
    means = rng.normal(size=(n, 3)) + np.array([0, 0, 4.0])
    shs = rng.normal(size=(n, 16, 3)) * 0.3
    cam = np.array([0.1, -0.2, 0.0])
    v = rng.normal(size=(n, 3))

    def loss_means(m):
        return jnp.sum(SH.sh_to_rgb(jnp.asarray(m), jnp.asarray(shs), jnp.asarray(cam), degree) * v)

    def loss_shs(s):
        return jnp.sum(
            SH.sh_to_rgb(jnp.asarray(means), jnp.asarray(s), jnp.asarray(cam), degree) * v
        )

    g = np.asarray(jax.grad(loss_means)(jnp.asarray(means)))
    g_fd = finite_difference_grad(lambda x: float(loss_means(x)), means, eps=1e-5)
    np.testing.assert_allclose(g, g_fd, rtol=1e-4, atol=1e-7)

    gs = np.asarray(jax.grad(loss_shs)(jnp.asarray(shs)))
    gs_fd = finite_difference_grad(lambda x: float(loss_shs(x)), shs, eps=1e-5)
    np.testing.assert_allclose(gs, gs_fd, rtol=1e-4, atol=1e-7)


def test_degree_masks_bands_and_gradients(rng):
    """Coefficients above the active degree contribute nothing and receive
    zero gradient (the reference's static-degree specialization)."""
    means = rng.normal(size=(2, 3)) + np.array([0, 0, 4.0])
    shs = rng.normal(size=(2, 16, 3))
    cam = np.zeros(3)

    out1 = SH.sh_to_rgb(jnp.asarray(means), jnp.asarray(shs), jnp.asarray(cam), 1)
    shs2 = shs.copy()
    shs2[:, 4:, :] = 0.0  # zero bands 2-3
    out2 = SH.sh_to_rgb(jnp.asarray(means), jnp.asarray(shs2), jnp.asarray(cam), 1)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-7)

    g = np.asarray(
        jax.grad(
            lambda s: jnp.sum(SH.sh_to_rgb(jnp.asarray(means), s, jnp.asarray(cam), 1))
        )(jnp.asarray(shs))
    )
    assert np.all(g[:, 4:, :] == 0.0)
    assert np.any(g[:, :4, :] != 0.0)


def test_clamp_zeroes_gradient():
    """Clamped (negative) channels give zero gradient — the reference's saved
    clamp mask (spherical_harmonics.jl:73, :90)."""
    means = jnp.array([[0.0, 0.0, 5.0]])
    shs = jnp.zeros((1, 1, 3)).at[0, 0, 0].set(-10.0)  # red far below 0

    def loss(s):
        return jnp.sum(SH.sh_to_rgb(means, s, jnp.zeros(3), 0))

    g = np.asarray(jax.grad(loss)(shs))
    assert g[0, 0, 0] == 0.0  # clamped channel
    assert g[0, 0, 1] != 0.0 and g[0, 0, 2] != 0.0
