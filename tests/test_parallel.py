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


def test_data_parallel_full_loss_step(rng):
    """DP(mesh=8) == DP(single) on the FULL train step: bilateral + depth +
    sky dome + sky loss + normal + pose opt all active (VERDICT r1 item 4 —
    the DP step shares _step_core with the sequential Trainer, no reduced
    fork)."""
    import dataclasses
    import os

    from gsplat_tpu.train.trainer import Trainer

    ds = make_synthetic_dataset(n_points=600, n_views=8, width=48, height=48, holdout=0)
    # Depth priors: inverse depth written at the SfM points' projected pixels
    # so the RANSAC anchors are usable.
    depths, masks = [], []
    for i in range(8):
        cam = ds.cameras[i]
        pc = (np.asarray(cam.R) @ ds.points.T + np.asarray(cam.t)[:, None]).T
        f = np.asarray(cam.focal)
        pp = np.asarray(cam.principal) * 48
        z = np.maximum(pc[:, 2], 0.1)
        px = (pc[:, 0] / z * f[0] + pp[0]).astype(int)
        py = (pc[:, 1] / z * f[1] + pp[1]).astype(int)
        inb = (px >= 0) & (px < 48) & (py >= 0) & (py < 48) & (pc[:, 2] > 0.1)
        disp = np.clip(1.5 / z, 0, 1)
        prior = np.full((48, 48), float(np.median(disp[inb])), np.float32)
        prior[py[inb], px[inb]] = disp[inb]
        depths.append(prior)
        masks.append(rng.uniform(0, 1, (48, 48)).astype(np.float32))
    ds = dataclasses.replace(
        ds, depths=depths, depth_qsteps=[1 / 255] * 8, sky_masks=masks
    )

    p = OptimizationParams(
        use_depth_loss=True, use_sky_loss=True, sky_loss_from_iter=0,
        use_sky_dome=True, sky_dome_points=128, use_bilateral_grid=True,
        use_normal_loss=True, normal_from_iter=0, use_pose_opt=True,
    )
    model = GaussianModel.create(ds.points, ds.colors, ds.scales, max_sh_degree=0)
    trainer = Trainer(model, ds, opt_params=p, max_instances=16384)
    assert set(trainer.features) == {
        "bilateral", "depth", "sky_dome", "sky_loss", "normal", "pose"
    }

    inputs = trainer._build_chunk_inputs(8, 0)
    bg = jnp.zeros(3, jnp.float32)
    kw = dict(
        config=trainer.config_for(ds.cameras[0]),
        opt_params=p,
        camera_extent=trainer.camera_extent,
        features=trainer.features,
        sky=trainer.sky,
    )
    # Identity-initialized grids have zero TV; perturb so the term is live.
    state = trainer.state
    g = state.aux["bilateral_grids"]
    state = state.replace(
        aux={**state.aux, "bilateral_grids": g + 0.01 * jnp.asarray(
            rng.normal(size=g.shape), jnp.float32
        )}
    )
    s_ref, m_ref = data_parallel_train_step(
        state, inputs["cam_b"], inputs["targets_b"], bg, 0,
        inputs["tis"], inputs["ex_b"], mesh=None, **kw,
    )
    mesh = make_mesh(8, axis="data")
    s_par, m_par = data_parallel_train_step(
        state, inputs["cam_b"], inputs["targets_b"], bg, 0,
        inputs["tis"], inputs["ex_b"], mesh=mesh, **kw,
    )

    # Every loss term is actually exercised.
    for k in ("l1", "ssim", "tv", "depth", "sky", "flatten", "normal"):
        assert float(m_ref["terms"][k]) != 0.0, f"term {k} inert"
    np.testing.assert_allclose(float(m_par["loss"]), float(m_ref["loss"]), rtol=1e-5)
    for k, v in s_ref.model.params().items():
        np.testing.assert_allclose(
            np.asarray(s_par.model.params()[k]), np.asarray(v),
            rtol=1e-4, atol=1e-6, err_msg=k,
        )
    for k in s_ref.aux:
        np.testing.assert_allclose(
            np.asarray(s_par.aux[k]), np.asarray(s_ref.aux[k]),
            rtol=1e-4, atol=1e-6, err_msg=k,
        )
    for k in s_ref.poses:
        np.testing.assert_allclose(
            np.asarray(s_par.poses[k]), np.asarray(s_ref.poses[k]),
            rtol=1e-4, atol=1e-6, err_msg=k,
        )


def test_fully_sharded_render_matches_replicated(rng):
    """§2.8 layout 2 (fullshard.py): gauss-sharded prologue + instance
    all-to-all + tile-sharded blend with NO replicated table must match the
    single-device rasterize() — forward image AND parameter gradients (the
    backward crosses the all-to-all transpose, the local scatter/gather
    transposes, and the pose-operand psum)."""
    from gsplat_tpu.ops.rasterize import RasterizerConfig, rasterize
    from gsplat_tpu.parallel.fullshard import render_fully_sharded

    n = 256  # divides 8 devices
    W = H = 64
    mesh = make_mesh(8, axis="shard")
    means = jnp.asarray(np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(2, 8, n)], 1), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.exp(jnp.asarray(rng.uniform(-2.5, -1.2, (n, 3)), jnp.float32))
    opac = jnp.asarray(rng.uniform(0.2, 0.9, n), jnp.float32)
    shs = jnp.asarray(rng.uniform(-0.3, 0.3, (n, 1, 3)), jnp.float32)
    cam = Camera.create(width=W, height=H, focal=np.array([70.0, 70.0], np.float32))
    cfg = RasterizerConfig(width=W, height=H, mode="rgb", max_instances=8192, impl="pallas")

    img_ref, aux_ref = rasterize(
        means, quats, scales, opac, shs, camera=cam, config=cfg, sh_degree=0
    )
    img_sh, aux_sh = render_fully_sharded(
        means, quats, scales, opac, shs,
        camera=cam, config=cfg, sh_degree=0, mesh=mesh, exchange_budget=2048,
    )
    assert not bool(aux_sh["overflow"])
    assert not bool(aux_ref["overflow"])
    np.testing.assert_allclose(
        np.asarray(img_sh), np.asarray(img_ref), rtol=1e-4, atol=1e-5
    )

    tgt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)

    def loss_ref(m, o, s):
        img, _ = rasterize(m, quats, s, o, shs, camera=cam, config=cfg, sh_degree=0)
        return jnp.mean((img - tgt) ** 2)

    def loss_sh(m, o, s):
        img, _ = render_fully_sharded(
            m, quats, s, o, shs, camera=cam, config=cfg, sh_degree=0,
            mesh=mesh, exchange_budget=2048,
        )
        return jnp.mean((img - tgt) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(means, opac, scales)
    g_sh = jax.grad(loss_sh, argnums=(0, 1, 2))(means, opac, scales)
    for a, b, name in zip(g_sh, g_ref, ("means", "opacities", "scales")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6, err_msg=name
        )


def test_fully_sharded_exchange_overflow_flag(rng):
    """A too-small per-pair exchange budget must raise the traced overflow
    flag (the Trainer's grow-and-replay signal), not crash."""
    from gsplat_tpu.ops.rasterize import RasterizerConfig
    from gsplat_tpu.parallel.fullshard import render_fully_sharded

    n = 64
    mesh = make_mesh(8, axis="shard")
    means = jnp.asarray(np.stack([
        np.zeros(n), np.zeros(n), np.full(n, 4.0)], 1), jnp.float32)  # all in center
    quats = jnp.asarray(np.tile([1.0, 0, 0, 0], (n, 1)), jnp.float32)
    scales = jnp.full((n, 3), 0.5, jnp.float32)
    opac = jnp.full((n,), 0.8, jnp.float32)
    shs = jnp.zeros((n, 1, 3), jnp.float32)
    cam = Camera.create(width=32, height=32, focal=np.array([40.0, 40.0], np.float32))
    cfg = RasterizerConfig(width=32, height=32, mode="rgb", max_instances=2048, impl="pallas")
    _, aux = render_fully_sharded(
        means, quats, scales, opac, shs,
        camera=cam, config=cfg, sh_degree=0, mesh=mesh, exchange_budget=1,
    )
    assert bool(aux["overflow"])


def test_phase_split_backward_matches_monolithic(rng):
    """SURVEY §2.8 / VERDICT r2 #6: the explicit phase-split backward
    (per-microbatch psum_scatter of cotangent partials + sharded Adam +
    all-gather) must reproduce the monolithic GSPMD-all-reduce DP step to
    reduction-order tolerance — params, Adam moments, metrics, and
    densification stats."""
    from gsplat_tpu.parallel import phase_split_train_step
    from gsplat_tpu.ops.rasterize import RasterizerConfig

    B = 16  # 8 devices x 2 local views -> 2 microbatches of 1
    ds = make_synthetic_dataset(n_points=60, n_views=B, width=32, height=32, holdout=0)
    model = GaussianModel.create(
        ds.points, ds.colors, ds.scales, max_sh_degree=0, capacity=64
    )
    state = TrainState.create(model)
    cams = batch_cameras([ds.cameras[i] for i in range(B)])
    targets = jnp.stack([jnp.asarray(ds.images[i]) for i in range(B)])
    bg = jnp.zeros(3, jnp.float32)
    cfg = RasterizerConfig(width=32, height=32, mode="rgb", max_instances=4096, impl="scan")
    p = OptimizationParams()
    kw = dict(config=cfg, opt_params=p, camera_extent=float(ds.camera_extent))

    s_ref, m_ref = data_parallel_train_step(state, cams, targets, bg, 0, mesh=None, **kw)
    mesh = make_mesh(8, axis="data")
    for n_micro in (1, 2):
        s_ps, m_ps = phase_split_train_step(
            state, cams, targets, bg, 0, mesh=mesh, n_micro=n_micro, **kw
        )
        np.testing.assert_allclose(float(m_ps["loss"]), float(m_ref["loss"]), rtol=1e-5)
        np.testing.assert_allclose(float(m_ps["l1"]), float(m_ref["l1"]), rtol=1e-5)
        for k, v in s_ref.model.params().items():
            np.testing.assert_allclose(
                np.asarray(s_ps.model.params()[k]), np.asarray(v),
                rtol=1e-4, atol=1e-6, err_msg=f"{k} (n_micro={n_micro})",
            )
        for mom in ("mu", "nu"):
            for k in s_ref.model.params():
                np.testing.assert_allclose(
                    np.asarray(s_ps.opt[mom][k]), np.asarray(s_ref.opt[mom][k]),
                    rtol=1e-4, atol=1e-8, err_msg=f"{mom}/{k}",
                )
        np.testing.assert_allclose(
            np.asarray(s_ps.grad_accum), np.asarray(s_ref.grad_accum),
            rtol=1e-3, atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(s_ps.stat_denom), np.asarray(s_ref.stat_denom)
        )
        np.testing.assert_array_equal(
            np.asarray(s_ps.max_radii), np.asarray(s_ref.max_radii)
        )
        assert int(s_ps.step) == int(s_ref.step) == 1
        assert int(s_ps.opt["step"]) == int(s_ref.opt["step"])


def test_phase_split_schedule_collective_inside_scan(rng):
    """VERDICT r3 #9: pin the overlap STRUCTURE. The per-microbatch
    reduce-scatter must be issued INSIDE the microbatch scan body (so
    microbatch k's collective can overlap microbatch k+1's backward on real
    ICI), and the params/moments all-gather must sit OUTSIDE the scan. The
    jaxpr is backend-independent, so this holds the schedule shape even
    though no multi-chip wall-clock can be measured here."""
    from gsplat_tpu.parallel import phase_split_train_step
    from gsplat_tpu.ops.rasterize import RasterizerConfig

    B = 16
    ds = make_synthetic_dataset(n_points=60, n_views=B, width=32, height=32, holdout=0)
    model = GaussianModel.create(
        ds.points, ds.colors, ds.scales, max_sh_degree=0, capacity=64
    )
    state = TrainState.create(model)
    cams = batch_cameras([ds.cameras[i] for i in range(B)])
    targets = jnp.stack([jnp.asarray(ds.images[i]) for i in range(B)])
    bg = jnp.zeros(3, jnp.float32)
    cfg = RasterizerConfig(width=32, height=32, mode="rgb", max_instances=4096, impl="scan")
    mesh = make_mesh(8, axis="data")
    jaxpr = jax.make_jaxpr(
        lambda s, c, t: phase_split_train_step(
            s, c, t, bg, 0,
            config=cfg, opt_params=OptimizationParams(),
            camera_extent=float(ds.camera_extent), mesh=mesh, n_micro=2,
        )
    )(state, cams, targets)

    def walk(jx, in_scan):
        """Yield (primitive_name, inside_scan) over all nested equations."""
        for eqn in jx.eqns:
            yield eqn.primitive.name, in_scan
            for v in eqn.params.values():
                for sub in jax.tree_util.tree_leaves(
                    v, is_leaf=lambda x: hasattr(x, "jaxpr") or hasattr(x, "eqns")
                ):
                    inner = getattr(sub, "jaxpr", sub)
                    if hasattr(inner, "eqns"):
                        yield from walk(
                            inner, in_scan or eqn.primitive.name == "scan"
                        )

    prims = list(walk(jaxpr.jaxpr, False))
    rs_in_scan = [p for p, ins in prims if p == "reduce_scatter" and ins]
    rs_outside = [p for p, ins in prims if p == "reduce_scatter" and not ins]
    ag_in_scan = [p for p, ins in prims if p == "all_gather" and ins]
    ag_outside = [p for p, ins in prims if p == "all_gather" and not ins]
    n_params = len(state.model.params())
    assert len(rs_in_scan) == n_params, (
        f"expected one in-scan reduce-scatter per parameter, got {sorted(set(p for p, _ in prims))}"
    )
    assert not rs_outside, "reduce-scatter leaked out of the microbatch scan"
    assert not ag_in_scan, "all-gather must not run per microbatch"
    assert len(ag_outside) >= n_params  # params + mu + nu re-replication
