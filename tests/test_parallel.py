"""Multi-chip sharding on the 8-virtual-device CPU mesh.

The reference has no distributed layer (SURVEY.md §2.8); these tests gate
the TPU build's scale-out seams: sharded == replicated allclose.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.camera import Camera
from gsplat_tpu.data.colmap import make_synthetic_dataset
from gsplat_tpu.models.gaussians import GaussianModel
from gsplat_tpu.ops.projection import project
from gsplat_tpu.parallel import (
    batch_cameras,
    data_parallel_train_step,
    make_mesh,
    project_sharded,
)
from gsplat_tpu.train.optim import OptimizationParams
from gsplat_tpu.train.trainer import TrainState


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs the 8-virtual-device CPU mesh"
)


def test_project_sharded_matches_replicated(rng):
    n = 64  # divides 8 devices
    mesh = make_mesh(8, axis="gauss")
    means = jnp.asarray(np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(1, 9, n)], 1), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.exp(jnp.asarray(rng.uniform(-3, -1, (n, 3)), jnp.float32))
    R = jnp.eye(3)
    t = jnp.zeros(3)
    focal = jnp.array([60.0, 60.0])
    pp = jnp.array([32.0, 32.0])
    res = jnp.array([64.0, 64.0])

    ref = project(means, quats, scales, R, t, focal, pp, res)
    out = project_sharded(means, quats, scales, R, t, focal, pp, res, mesh=mesh)
    for k in ("mean_2d", "depth", "conic", "radius"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), rtol=1e-6, atol=1e-6
        )


def test_data_parallel_step_matches_single_device(rng):
    ds = make_synthetic_dataset(n_points=60, n_views=8, width=32, height=32, holdout=0)
    model = GaussianModel.create(ds.points, ds.colors, ds.scales, max_sh_degree=0)
    state = TrainState.create(model)
    cams = batch_cameras([ds.cameras[i] for i in range(8)])
    targets = jnp.stack([jnp.asarray(ds.images[i]) for i in range(8)])
    bg = jnp.zeros(3, jnp.float32)
    from gsplat_tpu.ops.rasterize import RasterizerConfig

    cfg = RasterizerConfig(width=32, height=32, mode="rgb", max_instances=4096, impl="scan")
    p = OptimizationParams()

    kw = dict(config=cfg, opt_params=p, camera_extent=float(ds.camera_extent))
    s_ref, m_ref = data_parallel_train_step(state, cams, targets, bg, 0, mesh=None, **kw)
    mesh = make_mesh(8, axis="data")
    s_par, m_par = data_parallel_train_step(state, cams, targets, bg, 0, mesh=mesh, **kw)

    np.testing.assert_allclose(float(m_par["loss"]), float(m_ref["loss"]), rtol=1e-5)
    for k, v in s_ref.model.params().items():
        np.testing.assert_allclose(
            np.asarray(s_par.model.params()[k]), np.asarray(v), rtol=1e-4, atol=1e-6,
            err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(s_par.grad_accum), np.asarray(s_ref.grad_accum), rtol=1e-3, atol=1e-6
    )


def test_data_parallel_converges(rng):
    """A few DP steps reduce the loss (full pipeline on the mesh)."""
    ds = make_synthetic_dataset(n_points=60, n_views=8, width=32, height=32, holdout=0)
    model = GaussianModel.create(
        ds.points + rng.normal(0, 0.03, ds.points.shape).astype(np.float32),
        ds.colors, ds.scales, max_sh_degree=0)
    state = TrainState.create(model)
    cams = batch_cameras([ds.cameras[i] for i in range(8)])
    targets = jnp.stack([jnp.asarray(ds.images[i]) for i in range(8)])
    from gsplat_tpu.ops.rasterize import RasterizerConfig

    cfg = RasterizerConfig(width=32, height=32, mode="rgb", max_instances=4096, impl="scan")
    mesh = make_mesh(8, axis="data")
    kw = dict(config=cfg, opt_params=OptimizationParams(),
              camera_extent=float(ds.camera_extent), mesh=mesh)
    losses = []
    for _ in range(20):
        state, m = data_parallel_train_step(state, cams, targets, jnp.zeros(3, jnp.float32), 0, **kw)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]


def test_tile_sharded_render_matches_replicated(rng):
    """Tile-sharded blend == single-device render (values AND gradients)."""
    from gsplat_tpu.ops.rasterize import RasterizerConfig, rasterize
    from gsplat_tpu.ops.sh import rgb_to_sh_dc
    from gsplat_tpu.parallel import render_tile_sharded

    mesh = make_mesh(8, axis="tile")
    n = 60
    cam = Camera.create(width=64, height=64, focal=np.array([60.0, 60.0], np.float32))
    cfg = RasterizerConfig(width=64, height=64, mode="rgb", max_instances=4096, impl="pallas")
    means = jnp.asarray(np.stack([
        rng.uniform(-1.5, 1.5, n), rng.uniform(-1.5, 1.5, n), rng.uniform(2, 8, n)], 1), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.exp(jnp.asarray(rng.uniform(-3, -1.5, (n, 3)), jnp.float32))
    opac = jnp.asarray(rng.uniform(0.3, 0.95, n), jnp.float32)
    shs = jnp.asarray(np.asarray(rgb_to_sh_dc(rng.uniform(0, 1, (n, 3)))), jnp.float32)[:, None]

    img_ref, _ = rasterize(means, quats, scales, opac, shs, camera=cam, config=cfg, sh_degree=0)
    img_sh, aux = render_tile_sharded(
        means, quats, scales, opac, shs, camera=cam, config=cfg, sh_degree=0, mesh=mesh)
    np.testing.assert_allclose(np.asarray(img_sh), np.asarray(img_ref[..., :3]),
                               rtol=1e-4, atol=1e-5)

    # Gradients: the shard_map transpose psums per-shard cotangents.
    def loss_sharded(m):
        img, _ = render_tile_sharded(m, quats, scales, opac, shs, camera=cam,
                                     config=cfg, sh_degree=0, mesh=mesh)
        return jnp.sum(img ** 2)

    def loss_ref(m):
        img, _ = rasterize(m, quats, scales, opac, shs, camera=cam, config=cfg, sh_degree=0)
        return jnp.sum(img[..., :3] ** 2)

    g_sh = np.asarray(jax.grad(loss_sharded)(means))
    g_ref = np.asarray(jax.grad(loss_ref)(means))
    scale = np.maximum(np.abs(g_ref), 1e-4)
    np.testing.assert_allclose(g_sh / scale, g_ref / scale, rtol=0, atol=5e-3)
