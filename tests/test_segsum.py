"""segsum_pallas: the streaming per-Gaussian gradient reduction.

Covers the kernel contract (run-end rows hold full segment sums) against a
numpy oracle, and end-to-end gradient equality of the three backward
spellings of the instance-gather transpose (scatter / segscan / segsum) —
the reduction that replaces the reference's @atomic accumulation
(reference: src/rasterization/render.jl:242-282).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu import Camera, RasterizerConfig, rasterize
from gsplat_tpu.ops.segsum_pallas import BLOCK, segsum_scan
from gsplat_tpu.ops.sh import rgb_to_sh_dc


def _random_segments(rng, n_rows, n_segs, f=16):
    """Sorted segment ids covering [0, n_rows) + zero-padded tail."""
    # Random run lengths (some zero) summing to <= n_rows.
    lens = rng.integers(0, 9, size=n_segs)
    while lens.sum() > n_rows:
        lens[rng.integers(n_segs)] = 0
    seg = np.repeat(np.arange(n_segs), lens)
    total = len(seg)
    pad = n_rows - total
    seg = np.concatenate([seg, np.full(pad, np.int64(0x7FFFFFFF))]).astype(np.int32)
    v = rng.normal(size=(n_rows, f)).astype(np.float32)
    v[total:] = 0.0
    return v, seg, lens, total


@pytest.mark.parametrize("n_rows", [BLOCK, 3 * BLOCK])
def test_segsum_scan_run_ends(rng, n_rows):
    n_segs = 300
    v, seg, lens, total = _random_segments(rng, n_rows, n_segs)
    out = np.asarray(segsum_scan(jnp.asarray(v), jnp.asarray(seg)))
    offsets = np.cumsum(lens) - lens
    ends = offsets + lens - 1
    expected = np.zeros((n_segs, v.shape[1]), np.float32)
    np.add.at(expected, seg[:total], v[:total])
    got = np.where((lens > 0)[:, None], out[np.clip(ends, 0, n_rows - 1)], 0.0)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_segsum_scan_single_long_run(rng):
    """One segment spanning many blocks exercises the cross-block carry."""
    n = 2 * BLOCK
    v = rng.normal(size=(n, 16)).astype(np.float32)
    seg = np.zeros(n, np.int32)
    out = np.asarray(segsum_scan(jnp.asarray(v), jnp.asarray(seg)))
    np.testing.assert_allclose(out[-1], v.sum(axis=0), rtol=2e-5, atol=2e-5)


def _grads(monkeypatch, mode, rng):
    monkeypatch.setenv("GSPLAT_GATHER_BWD", mode)
    n = 64
    means = np.stack(
        [rng.uniform(-1.5, 1.5, n), rng.uniform(-1.5, 1.5, n), rng.uniform(2, 8, n)],
        axis=1,
    ).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = np.exp(rng.uniform(-3.0, -1.5, size=(n, 3))).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, size=n).astype(np.float32)
    shs = np.asarray(rgb_to_sh_dc(rng.uniform(0, 1, size=(n, 3)).astype(np.float32)))[
        :, None, :
    ]
    cam = Camera.create(width=64, height=64, focal=np.array([60.0, 60.0], np.float32))
    cfg = RasterizerConfig(
        width=64, height=64, mode="rgb", max_instances=4096, chunk=8, impl="scan"
    )

    def loss(means, scales, opac):
        img, _ = rasterize(
            jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(shs),
            camera=cam, config=cfg, sh_degree=0,
        )
        return jnp.sum(img**2)

    return jax.grad(loss, argnums=(0, 1, 2))(means, scales, opac)


def test_backward_modes_agree(rng, monkeypatch):
    """scatter / segscan / segsum produce the same per-Gaussian gradients."""
    g_scatter = _grads(monkeypatch, "scatter", np.random.default_rng(3))
    g_segscan = _grads(monkeypatch, "segscan", np.random.default_rng(3))
    g_segsum = _grads(monkeypatch, "segsum", np.random.default_rng(3))
    for a, b in zip(g_scatter, g_segscan):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    for a, b in zip(g_scatter, g_segsum):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
