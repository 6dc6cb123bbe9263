"""Pallas blend kernels vs the chunked-scan executable spec.

Differential testing (the reference's fused-SSIM pattern, runtests.jl:496-520):
same instance tables, Pallas fwd/bwd (interpret mode on CPU) vs pure-JAX scan
autodiff — values AND gradients must agree.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.constants import CHUNK, TILE_PIXELS
from gsplat_tpu.ops.blend_pallas import blend_pallas
from gsplat_tpu.ops.blend_scan import blend_scan
from test_blend import make_instances


def _pad_to_chunk(inst, starts, counts):
    """Re-pad a chunk=8-built table is not valid for Pallas; build with CHUNK."""
    raise NotImplementedError


def _run_both(inst, starts, counts, grid, n_feat):
    args = (jnp.asarray(inst), jnp.asarray(starts), jnp.asarray(counts))
    out_p = blend_pallas(*args, grid_wh=grid, n_feat=n_feat, chunk=CHUNK)
    out_s = blend_scan(*args, grid_wh=grid, n_feat=n_feat, chunk=CHUNK)
    return out_p, out_s


@pytest.mark.parametrize("n_feat", [3, 4, 7])
def test_pallas_forward_matches_scan(rng, n_feat):
    grid = (2, 2)
    inst, starts, counts = make_instances(rng, grid, 300, n_feat, CHUNK)
    (c_p, T_p, n_p), (c_s, T_s, n_s) = _run_both(inst, starts, counts, grid, n_feat)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(T_p), np.asarray(T_s), rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_s))


def test_pallas_forward_saturated(rng):
    """High opacity: 0.99 cap + T<1e-4 early termination paths."""
    grid = (2, 1)
    inst, starts, counts = make_instances(rng, grid, 400, 3, CHUNK, opacity_scale=3.0)
    (c_p, T_p, n_p), (c_s, T_s, n_s) = _run_both(inst, starts, counts, grid, 3)
    assert np.asarray(T_s).min() < 1e-3, "saturation not reached; weak test"
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(T_p), np.asarray(T_s), rtol=1e-3, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_s))


@pytest.mark.parametrize("opacity_scale", [1.0, 3.0])
def test_pallas_gradients_match_scan(rng, opacity_scale):
    grid = (2, 1)
    n_feat = 4
    inst, starts, counts = make_instances(
        rng, grid, 300, n_feat, CHUNK, opacity_scale=opacity_scale
    )
    g_color = jnp.asarray(rng.normal(size=(2, TILE_PIXELS, n_feat)), jnp.float32)
    g_T = jnp.asarray(rng.normal(size=(2, TILE_PIXELS)), jnp.float32)
    args = (jnp.asarray(starts), jnp.asarray(counts))

    def loss(fn, x):
        color, T, _ = fn(x, *args, grid_wh=grid, n_feat=n_feat, chunk=CHUNK)
        return jnp.sum(color * g_color) + jnp.sum(T * g_T)

    g_p = np.asarray(jax.grad(lambda x: loss(blend_pallas, x))(jnp.asarray(inst)))
    g_s = np.asarray(jax.grad(lambda x: loss(blend_scan, x))(jnp.asarray(inst)))
    assert np.all(np.isfinite(g_p))
    # Padding rows carry no gradient.
    assert np.all(g_p[:, 6 + n_feat :] == 0.0)
    scale = np.maximum(np.abs(g_s), 1e-3)
    np.testing.assert_allclose(g_p / scale, g_s / scale, rtol=0, atol=5e-3)


def test_pallas_empty_tiles(rng):
    """Tiles with zero instances produce background (T=1) and zero grads."""
    grid = (2, 2)
    n_feat = 3
    inst, starts, counts = make_instances(rng, grid, 130, n_feat, CHUNK)
    counts = counts.copy()
    counts[1] = 0  # empty a tile (its slots remain but are not counted)
    (c_p, T_p, n_p), (c_s, T_s, n_s) = _run_both(inst, starts, counts, grid, n_feat)
    np.testing.assert_allclose(np.asarray(c_p)[1], 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(T_p)[1], 1.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_s))


@pytest.mark.parametrize("tb", [2, 4])
def test_pallas_forward_tiles_per_step(rng, tb):
    """The tile-batched forward (TB tiles per grid step, incl. a grid that
    does NOT divide TB) must match the scan spec exactly like TB=1."""
    grid = (3, 2)  # 6 tiles; tb=4 forces dummy-tile padding
    n_feat = 3
    inst, starts, counts = make_instances(rng, grid, 500, n_feat, CHUNK)
    args = (jnp.asarray(inst), jnp.asarray(starts), jnp.asarray(counts))
    c_p, T_p, n_p = blend_pallas(
        *args, grid_wh=grid, n_feat=n_feat, chunk=CHUNK, tiles_per_step=tb
    )
    c_s, T_s, n_s = blend_scan(*args, grid_wh=grid, n_feat=n_feat, chunk=CHUNK)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(T_p), np.asarray(T_s), rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_s))


@pytest.mark.parametrize("tb", [2, 3])
def test_pallas_gradients_with_tiles_per_step(rng, tb):
    """Gradients through the TB-batched forward AND backward kernels must
    equal TB=1. tb=3 over 4 tiles forces dummy-tile padding and groups of
    unequal replay length (the masked-DMA paths in _bwd_kernel_tb)."""
    grid = (2, 2)
    n_feat = 3
    inst, starts, counts = make_instances(rng, grid, 300, n_feat, CHUNK)
    args = (jnp.asarray(starts), jnp.asarray(counts))

    def loss(i_, tb):
        c, T, _ = blend_pallas(
            jnp.asarray(i_), *args, grid_wh=grid, n_feat=n_feat, chunk=CHUNK,
            tiles_per_step=tb,
        )
        return jnp.sum(c * c) + jnp.sum(T)

    g1 = jax.grad(lambda i_: loss(i_, 1))(jnp.asarray(inst))
    g2 = jax.grad(lambda i_: loss(i_, tb))(jnp.asarray(inst))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5, atol=1e-7)


def test_pallas_tb_bwd_early_exit_mixed_lengths(rng):
    """TB backward with saturated tiles: per-tile replay lengths inside one
    group differ by several chunks (tile_count_eff), exercising the
    exhausted-tile masking of compute, in-DMA waits, and out-DMA starts."""
    grid = (2, 2)
    n_feat = 3
    inst, starts, counts = make_instances(
        rng, grid, 8 * CHUNK, n_feat, CHUNK, opacity_scale=40.0
    )
    counts = counts.copy()
    counts[1] = CHUNK  # one short tile in the first group
    args = (jnp.asarray(starts), jnp.asarray(counts))

    def loss(i_, tb):
        c, T, _ = blend_pallas(
            jnp.asarray(i_), *args, grid_wh=grid, n_feat=n_feat, chunk=CHUNK,
            tiles_per_step=tb,
        )
        return jnp.sum(c * c) + jnp.sum(T)

    g1 = jax.grad(lambda i_: loss(i_, 1))(jnp.asarray(inst))
    g2 = jax.grad(lambda i_: loss(i_, 2))(jnp.asarray(inst))
    assert np.all(np.isfinite(np.asarray(g2)))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("tb,n_feat", [(1, 3), (2, 3), (1, 7)])
def test_pallas_forward_sigma_mm(rng, tb, n_feat):
    """Monomial-basis sigma (one (P,6)@(6,K) MXU matmul per chunk) must match
    the scan spec; the reassociated tile-local form only differs by bounded
    f32 rounding (and by keeping center pixels the direct form would drop on
    a tiny-negative sigma — none in this data). n_feat=7 covers rgbdn."""
    grid = (3, 2)
    inst, starts, counts = make_instances(rng, grid, 500, n_feat, CHUNK)
    args = (jnp.asarray(inst), jnp.asarray(starts), jnp.asarray(counts))
    c_p, T_p, n_p = blend_pallas(
        *args, grid_wh=grid, n_feat=n_feat, chunk=CHUNK,
        tiles_per_step=tb, sigma_mm=True,
    )
    c_s, T_s, n_s = blend_scan(*args, grid_wh=grid, n_feat=n_feat, chunk=CHUNK)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(T_p), np.asarray(T_s), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_s))


@pytest.mark.parametrize("opacity_scale", [1.0, 3.0])
def test_pallas_gradients_sigma_mm(rng, opacity_scale):
    """Backward recombination of all five conic/mean cotangent pixel sums
    from ONE (6,P)@(P,K) matmul must match the scan-autodiff gradients."""
    grid = (2, 1)
    n_feat = 4
    inst, starts, counts = make_instances(
        rng, grid, 300, n_feat, CHUNK, opacity_scale=opacity_scale
    )
    g_color = jnp.asarray(rng.normal(size=(2, TILE_PIXELS, n_feat)), jnp.float32)
    g_T = jnp.asarray(rng.normal(size=(2, TILE_PIXELS)), jnp.float32)
    args = (jnp.asarray(starts), jnp.asarray(counts))

    def loss(fn, x, **kw):
        color, T, _ = fn(x, *args, grid_wh=grid, n_feat=n_feat, chunk=CHUNK, **kw)
        return jnp.sum(color * g_color) + jnp.sum(T * g_T)

    g_p = np.asarray(
        jax.grad(lambda x: loss(blend_pallas, x, sigma_mm=True))(jnp.asarray(inst))
    )
    g_s = np.asarray(jax.grad(lambda x: loss(blend_scan, x))(jnp.asarray(inst)))
    assert np.all(np.isfinite(g_p))
    assert np.all(g_p[:, 6 + n_feat :] == 0.0)
    scale = np.maximum(np.abs(g_s), 1e-3)
    np.testing.assert_allclose(g_p / scale, g_s / scale, rtol=0, atol=5e-3)


def test_pallas_bwd_early_exit_bound(rng):
    """The backward replay starts at the last contributing chunk
    (max_p n_contrib), skipping saturated-past chunks entirely; gradients for
    skipped instances must be exactly zero and the rest must match the scan
    oracle. Opacity near the 0.99 cap saturates tiles within the first chunk
    of several."""
    grid = (2, 1)
    n_feat = 3
    inst, starts, counts = make_instances(
        rng, grid, 6 * CHUNK, n_feat, CHUNK, opacity_scale=50.0
    )
    args = (jnp.asarray(starts), jnp.asarray(counts))

    def loss(fn, x):
        color, T, _ = fn(x, *args, grid_wh=grid, n_feat=n_feat, chunk=CHUNK)
        return jnp.sum(color * color) + jnp.sum(T)

    _, _, n_contrib = blend_pallas(
        jnp.asarray(inst), *args, grid_wh=grid, n_feat=n_feat, chunk=CHUNK
    )
    max_contrib = int(np.asarray(n_contrib).max(axis=1).max())
    assert max_contrib < 5 * CHUNK, "saturation too weak to skip a chunk"

    g_p = np.asarray(jax.grad(lambda x: loss(blend_pallas, x))(jnp.asarray(inst)))
    g_s = np.asarray(jax.grad(lambda x: loss(blend_scan, x))(jnp.asarray(inst)))
    assert np.all(np.isfinite(g_p))
    scale = np.maximum(np.abs(g_s), 1e-3)
    np.testing.assert_allclose(g_p / scale, g_s / scale, rtol=0, atol=5e-3)
    # Instances past every pixel's n_contrib carry exactly zero gradient.
    per_tile_max = np.asarray(n_contrib).max(axis=1)
    for ti in range(2):
        s, c = int(starts[ti]), int(counts[ti])
        dead_from = s + int(per_tile_max[ti])
        assert np.all(g_p[dead_from : s + c] == 0.0)


# --- sub-chunk alignment (forward-only render tables, chunk < 128) ----------


@pytest.mark.parametrize("align,tb", [(32, 1), (32, 4), (64, 1), (16, 2)])
def test_pallas_forward_sub_align(rng, align, tb):
    """chunk<CHUNK tables: tiles start at `align` boundaries INSIDE shared
    128-wide DMA slabs (lane-offset rank masks). Values and n_contrib must
    match the scan spec run on the same table."""
    grid = (3, 2)
    n_feat = 3
    inst, starts, counts = make_instances(rng, grid, 200, n_feat, align)
    assert any(s % CHUNK for s in starts), "layout never exercised sub-align"
    args = (jnp.asarray(inst), jnp.asarray(starts), jnp.asarray(counts))
    c_p, T_p, n_p = blend_pallas(
        *args, grid_wh=grid, n_feat=n_feat, chunk=align, tiles_per_step=tb
    )
    c_s, T_s, n_s = blend_scan(*args, grid_wh=grid, n_feat=n_feat, chunk=align)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(T_p), np.asarray(T_s), rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_s))


def test_pallas_sub_align_saturated(rng):
    """Early termination with lane-offset ranks: a tile whose instances
    begin mid-slab must terminate at the same contribution count."""
    grid = (2, 2)
    inst, starts, counts = make_instances(rng, grid, 300, 3, 32, opacity_scale=3.0)
    args = (jnp.asarray(inst), jnp.asarray(starts), jnp.asarray(counts))
    c_p, T_p, n_p = blend_pallas(*args, grid_wh=grid, n_feat=3, chunk=32)
    c_s, T_s, n_s = blend_scan(*args, grid_wh=grid, n_feat=3, chunk=32)
    assert np.asarray(T_s).min() < 1e-3, "saturation not reached; weak test"
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_s))


def test_pallas_sub_align_backward_refuses(rng):
    """The atomics-free backward requires CHUNK-aligned slabs; chunk<128
    must fail loudly under differentiation, not silently corrupt."""
    grid = (2, 1)
    inst, starts, counts = make_instances(rng, grid, 100, 3, 32)
    args = (jnp.asarray(starts), jnp.asarray(counts))

    def loss(x):
        c, T, _ = blend_pallas(x, *args, grid_wh=grid, n_feat=3, chunk=32)
        return jnp.sum(c)

    with pytest.raises(NotImplementedError, match="forward-only"):
        jax.grad(loss)(jnp.asarray(inst))


# --- pixel-major forward ("pm") ---------------------------------------------


@pytest.mark.parametrize("tb,n_feat", [(1, 3), (4, 4), (3, 7)])
def test_pm_forward_matches_scan(rng, tb, n_feat):
    """The pixel-major kernel on CHUNK-aligned multi-chunk tables: values
    and n_contrib must match the scan spec (multi-slab DMA loop + cross-
    chunk linear-T carries)."""
    grid = (3, 2)
    inst, starts, counts = make_instances(rng, grid, 3 * CHUNK, n_feat, CHUNK)
    args = (jnp.asarray(inst), jnp.asarray(starts), jnp.asarray(counts))
    c_p, T_p, n_p = blend_pallas(
        *args, grid_wh=grid, n_feat=n_feat, chunk=CHUNK, tiles_per_step=tb,
        algo="pm",
    )
    c_s, T_s, n_s = blend_scan(*args, grid_wh=grid, n_feat=n_feat, chunk=CHUNK)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(T_p), np.asarray(T_s), rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_s))


def test_pm_forward_saturated_early_exit(rng):
    """Saturation: the 0.99 cap, T<1e-4 termination, per-group skip-on-done
    and the while-level early exit must leave values equal to the spec."""
    grid = (2, 1)
    inst, starts, counts = make_instances(rng, grid, 400, 3, CHUNK, opacity_scale=3.0)
    args = (jnp.asarray(inst), jnp.asarray(starts), jnp.asarray(counts))
    c_p, T_p, n_p = blend_pallas(
        *args, grid_wh=grid, n_feat=3, chunk=CHUNK, tiles_per_step=2, algo="pm"
    )
    c_s, T_s, n_s = blend_scan(*args, grid_wh=grid, n_feat=3, chunk=CHUNK)
    assert np.asarray(T_s).min() < 1e-3, "saturation not reached; weak test"
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(T_p), np.asarray(T_s), rtol=1e-3, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_s))


def test_pm_empty_tiles(rng):
    grid = (2, 2)
    inst, starts, counts = make_instances(rng, grid, 130, 3, CHUNK)
    counts = counts.copy()
    counts[1] = 0
    c_p, T_p, n_p = blend_pallas(
        jnp.asarray(inst), jnp.asarray(starts), jnp.asarray(counts),
        grid_wh=grid, n_feat=3, chunk=CHUNK, tiles_per_step=4, algo="pm",
    )
    np.testing.assert_allclose(np.asarray(c_p)[1], 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(T_p)[1], 1.0, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(n_p)[1], 0)


def test_pm_forward_under_grad_uses_cm_backward(rng):
    """algo='pm' with a CHUNK-aligned table is differentiable: the vjp's
    residuals are layout-identical, the backward replay stays chunk-major.
    Gradients must match the all-chunk-major spelling."""
    grid = (2, 1)
    n_feat = 3
    inst, starts, counts = make_instances(rng, grid, 300, n_feat, CHUNK)
    args = (jnp.asarray(starts), jnp.asarray(counts))

    def loss(x, algo):
        c, T, _ = blend_pallas(
            x, *args, grid_wh=grid, n_feat=n_feat, chunk=CHUNK, algo=algo
        )
        return jnp.sum(c * c) + jnp.sum(T)

    g_pm = np.asarray(jax.grad(lambda x: loss(x, "pm"))(jnp.asarray(inst)))
    g_cm = np.asarray(jax.grad(lambda x: loss(x, "cm"))(jnp.asarray(inst)))
    # pm carries T linearly, cm in log space: forward values differ by
    # reduction-order noise that the shared backward replay then sees.
    scale = np.maximum(np.abs(g_cm), 1e-3)
    np.testing.assert_allclose(g_pm / scale, g_cm / scale, rtol=0, atol=5e-3)
