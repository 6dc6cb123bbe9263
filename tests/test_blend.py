"""Blend: chunked-scan formulation vs independent sequential oracle.

This is the differential-testing pattern the reference uses for fused SSIM
(runtests.jl:496-520): same inputs, two structurally different
implementations, values AND gradients must agree.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from conftest import finite_difference_grad

from gsplat_tpu.constants import TILE_PIXELS
from gsplat_tpu.ops.blend_ref import blend_ref
from gsplat_tpu.ops.blend_scan import F_PAD, ROW_FEAT, blend_scan


def make_instances(rng, grid_wh, n_per_tile, n_feat, chunk, opacity_scale=1.0):
    """Random plausible instance table with chunk-aligned tile ranges."""
    gx, gy = grid_wh
    n_tiles = gx * gy
    counts = rng.integers(0, n_per_tile + 1, size=n_tiles).astype(np.int32)
    pcounts = -(-counts // chunk) * chunk
    starts = np.concatenate([[0], np.cumsum(pcounts)[:-1]]).astype(np.int32)
    I_pad = max(int(np.sum(pcounts)), chunk)

    inst = np.zeros((F_PAD, I_pad), np.float32)
    for t in range(n_tiles):
        ty, tx = divmod(t, gx)
        c = counts[t]
        s = starts[t]
        # means near the tile so many pixels see them
        inst[0, s : s + c] = tx * 16 + rng.uniform(-4, 20, c)
        inst[1, s : s + c] = ty * 16 + rng.uniform(-4, 20, c)
        # conic = inverse of a random SPD 2x2
        for j in range(c):
            m = rng.normal(size=(2, 2))
            cov = m @ m.T + np.eye(2) * 2.0
            inv = np.linalg.inv(cov)
            inst[2, s + j] = inv[0, 0]
            inst[3, s + j] = inv[0, 1]
            inst[4, s + j] = inv[1, 1]
        inst[5, s : s + c] = rng.uniform(0.05, 1.0, c) * opacity_scale
        inst[ROW_FEAT : ROW_FEAT + n_feat, s : s + c] = rng.uniform(0, 1, (n_feat, c))
    # Table layout is (I_pad, F_PAD): instances are rows (see blend_scan.py).
    return np.ascontiguousarray(inst.T), starts, counts


@pytest.mark.parametrize("n_feat", [3, 4])
def test_scan_matches_sequential_oracle(rng, n_feat):
    grid = (2, 2)
    chunk = 8
    inst, starts, counts = make_instances(rng, grid, 37, n_feat, chunk)
    color, T, contrib = blend_scan(
        jnp.asarray(inst), jnp.asarray(starts), jnp.asarray(counts),
        grid_wh=grid, n_feat=n_feat, chunk=chunk,
    )
    color_r, T_r, contrib_r = blend_ref(inst, starts, counts, grid_wh=grid, n_feat=n_feat)
    np.testing.assert_allclose(np.asarray(color), color_r, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(T), T_r, rtol=2e-5, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(contrib), contrib_r)


def test_scan_matches_oracle_with_saturation(rng):
    """High opacities: exercises the 0.99 cap and the T<1e-4 early stop."""
    grid = (2, 1)
    chunk = 8
    inst, starts, counts = make_instances(rng, grid, 64, 3, chunk, opacity_scale=3.0)
    color, T, contrib = blend_scan(
        jnp.asarray(inst), jnp.asarray(starts), jnp.asarray(counts),
        grid_wh=grid, n_feat=3, chunk=chunk,
    )
    color_r, T_r, contrib_r = blend_ref(inst, starts, counts, grid_wh=grid, n_feat=3)
    assert np.asarray(T).min() < 1e-3, "saturation not reached; weak test"
    np.testing.assert_allclose(np.asarray(color), color_r, rtol=1e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(T), T_r, rtol=1e-4, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(contrib), contrib_r)


def test_blend_gradcheck(rng):
    """Finite-difference gradcheck through the scan blend (float64)."""
    grid = (1, 1)
    chunk = 4
    inst, starts, counts = make_instances(rng, grid, 9, 3, chunk)
    g_color = rng.normal(size=(1, TILE_PIXELS, 3))
    g_T = rng.normal(size=(1, TILE_PIXELS))

    def loss(inst_arr):
        color, T, _ = blend_scan(
            inst_arr.astype(jnp.float64),
            jnp.asarray(starts),
            jnp.asarray(counts),
            grid_wh=grid,
            n_feat=3,
            chunk=chunk,
        )
        return jnp.sum(color * g_color) + jnp.sum(T * g_T)

    g = np.asarray(jax.grad(loss)(jnp.asarray(inst, jnp.float64)))
    g_fd = finite_difference_grad(lambda x: float(loss(jnp.asarray(x))), inst.astype(np.float64), eps=1e-6)
    # columns 6+n_feat.. are unused padding: zero grads
    assert np.all(g[:, 9:] == 0.0)
    np.testing.assert_allclose(g, g_fd, rtol=1e-4, atol=1e-7)


def test_alpha_identity():
    """Σ α·T telescopes: blended constant-1 feature == 1 - T_final — the
    identity that lets the alpha channel be derived instead of composited
    (reference constant-1 channel, rasterizer.jl:383)."""
    rng = np.random.default_rng(3)
    grid = (1, 1)
    chunk = 8
    inst, starts, counts = make_instances(rng, grid, 30, 4, chunk)
    inst[:, ROW_FEAT + 3] = (inst[:, 5] > 0).astype(np.float32)  # constant-1 feature
    color, T, _ = blend_scan(
        jnp.asarray(inst), jnp.asarray(starts), jnp.asarray(counts),
        grid_wh=grid, n_feat=4, chunk=chunk,
    )
    np.testing.assert_allclose(
        np.asarray(color)[..., 3], 1.0 - np.asarray(T), rtol=1e-5, atol=1e-6
    )
