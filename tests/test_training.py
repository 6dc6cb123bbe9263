"""End-to-end training slice: synthetic scene convergence + serialization.

The M2 gate (SURVEY.md §7): a small scene trained with densification off
must converge to sane PSNR; checkpoint and PLY round-trips must be exact.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.data.colmap import make_synthetic_dataset
from gsplat_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from gsplat_tpu.models.gaussians import (
    GaussianModel,
    export_ply,
    import_ply,
    initial_scales,
)
from gsplat_tpu.train.optim import OptimizationParams, lr_exp_scheduler
from gsplat_tpu.train.trainer import Trainer, TrainState


@pytest.fixture(scope="module")
def dataset():
    return make_synthetic_dataset(n_points=120, n_views=8, width=48, height=48)


def make_trainer(dataset, **kw):
    model = GaussianModel.create(
        dataset.points + np.random.default_rng(1).normal(0, 0.02, dataset.points.shape).astype(np.float32),
        dataset.colors,
        dataset.scales,
        max_sh_degree=0,
    )
    return Trainer(model, dataset, max_instances=8192, **kw)


def test_training_converges(dataset):
    trainer = make_trainer(dataset)
    v0 = trainer.validate(quantize=False)
    trainer.train(120)
    v1 = trainer.validate(quantize=False)
    assert np.isfinite(v1["psnr"])
    assert v1["psnr"] > v0["psnr"] + 2.0, f"PSNR {v0['psnr']:.2f} -> {v1['psnr']:.2f}"
    assert v1["psnr"] > 20.0, f"final PSNR too low: {v1['psnr']:.2f}"


def test_lr_scheduler_endpoints():
    assert np.isclose(float(lr_exp_scheduler(0, 1.6e-4, 1.6e-6, 30_000)), 1.6e-4)
    assert np.isclose(float(lr_exp_scheduler(30_000, 1.6e-4, 1.6e-6, 30_000)), 1.6e-6)
    mid = float(lr_exp_scheduler(15_000, 1.6e-4, 1.6e-6, 30_000))
    assert np.isclose(mid, np.sqrt(1.6e-4 * 1.6e-6), rtol=1e-5)


def test_checkpoint_roundtrip(dataset, tmp_path):
    trainer = make_trainer(dataset)
    trainer.train(3)
    path = str(tmp_path / "ck.safetensors")
    cam = dataset.cameras[0]
    save_checkpoint(path, trainer.state, camera=cam)

    state2, cam2, meta = load_checkpoint(path)
    assert meta["format"] == "gsplat_tpu-checkpoint-1"
    assert int(state2.step) == int(trainer.state.step)
    alive = np.asarray(trainer.state.model.alive)
    for k, v in trainer.state.model.params().items():
        np.testing.assert_array_equal(np.asarray(v)[alive], np.asarray(state2.model.params()[k]))
    for k in trainer.state.opt["mu"]:
        np.testing.assert_array_equal(
            np.asarray(trainer.state.opt["mu"][k])[alive], np.asarray(state2.opt["mu"][k])
        )
    np.testing.assert_allclose(np.asarray(cam2.R), np.asarray(cam.R))

    # Resume training from the loaded state works.
    trainer2 = Trainer(state2.model, dataset, max_instances=8192)
    trainer2.state = state2
    trainer2.train(2)
    assert int(trainer2.state.step) == int(trainer.state.step) + 2


def test_reference_checkpoint_import(dataset, tmp_path):
    """A `GaussianSplatting.jl-checkpoint-1` file loads into a TrainState
    with exact params, Adam moments, and step (reference schema:
    checkpoint.jl:15-70, gaussians.jl:91-102, training.jl:397-414,419-447).

    The file is hand-built to the reference writer's layout: Julia arrays
    are column-major, serialized in C order with reversed dims — points
    (3, N) lands as an (N, 3) tensor, features (3, K, N) as (N, K, 3),
    opacities (1, N) as (N, 1); scalars ride __metadata__ as strings."""
    from safetensors.numpy import save_file

    trainer = make_trainer(dataset)
    trainer.train(3)
    st = trainer.state
    alive = np.asarray(st.model.alive)
    n = int(alive.sum())

    def julia_view(name, x):
        x = np.asarray(x)[alive]
        if name == "opacities":
            return np.ascontiguousarray(x.reshape(n, 1))
        return np.ascontiguousarray(x)

    tensors, meta = {}, {}
    for k, v in st.model.params().items():
        tensors[f"gaussians.{k}"] = julia_view(k, v)
    for name in st.model.params():
        tensors[f"optimizers.{name}.mu.1"] = julia_view(name, st.opt["mu"][name])
        tensors[f"optimizers.{name}.nu.1"] = julia_view(name, st.opt["nu"][name])
        meta[f"optimizers.{name}.n_moments"] = "1"
        meta[f"optimizers.{name}.current_step"] = str(int(st.opt["step"]))
    meta["gaussians.sh_degree"] = str(st.model.sh_degree)
    meta["gaussians.max_sh_degree"] = str(st.model.max_sh_degree)
    meta["step"] = str(int(st.step))
    meta["format"] = "GaussianSplatting.jl-checkpoint-1"
    # An optional group the importer must skip gracefully.
    tensors["sky.gaussians.points"] = np.zeros((4, 3), np.float32)
    path = str(tmp_path / "ref.safetensors")
    save_file(tensors, path, metadata=meta)

    state2, cam2, meta2 = load_checkpoint(path)
    assert meta2.get("imported_from") == "GaussianSplatting.jl-checkpoint-1"
    assert cam2 is None
    assert int(state2.step) == int(st.step)
    assert int(state2.opt["step"]) == int(st.opt["step"])
    for k, v in st.model.params().items():
        np.testing.assert_array_equal(
            np.asarray(v)[alive], np.asarray(state2.model.params()[k]), err_msg=k)
    for k in st.model.params():
        np.testing.assert_array_equal(
            np.asarray(st.opt["mu"][k])[alive], np.asarray(state2.opt["mu"][k]))
        np.testing.assert_array_equal(
            np.asarray(st.opt["nu"][k])[alive], np.asarray(state2.opt["nu"][k]))

    # Resume training from the imported state works.
    trainer2 = Trainer(state2.model, dataset, max_instances=8192)
    trainer2.state = state2
    trainer2.train(2)
    assert int(trainer2.state.step) == int(st.step) + 2


def test_checkpoint_rejects_junk(tmp_path):
    from safetensors.numpy import save_file

    path = str(tmp_path / "junk.safetensors")
    save_file({"x": np.zeros(3, np.float32)}, path, metadata={"format": "other"})
    with pytest.raises(ValueError):
        load_checkpoint(path)


def test_ply_roundtrip(dataset, tmp_path):
    model = GaussianModel.create(
        dataset.points, dataset.colors, dataset.scales, max_sh_degree=3
    )
    path = str(tmp_path / "scene.ply")
    export_ply(model, path)

    # Header spells `float` and f_rest is channel-major (gaussians.jl:157-200).
    with open(path, "rb") as f:
        header = f.read(2000).split(b"end_header")[0].decode()
    assert "property float x" in header
    assert "property float f_rest_44" in header  # 3*15 channel-major coeffs
    assert "float32" not in header

    m2 = import_ply(path)
    assert m2.capacity == int(model.n_alive)
    np.testing.assert_allclose(np.asarray(m2.points), np.asarray(model.points), atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(m2.features_rest), np.asarray(model.features_rest), atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(m2.opacities), np.asarray(model.opacities), atol=1e-7)
    assert m2.sh_degree == 3


def test_ply_degree0(tmp_path, rng):
    pts = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
    model = GaussianModel.create(pts, np.full((10, 3), 0.5, np.float32), np.full(10, 0.1, np.float32), max_sh_degree=0)
    path = str(tmp_path / "d0.ply")
    export_ply(model, path)
    m2 = import_ply(path)
    assert m2.features_rest.shape[1] == 0
    np.testing.assert_allclose(np.asarray(m2.points), pts, atol=1e-7)


def test_capacity_growth_preserves_params(dataset):
    model = GaussianModel.create(dataset.points, dataset.colors, dataset.scales)
    n = int(model.n_alive)
    big = model.with_capacity(model.capacity + 64)
    assert int(big.n_alive) == n
    np.testing.assert_array_equal(np.asarray(big.points)[:n], np.asarray(model.points)[:n])
    # Dead rows never render: raw opacity is very negative.
    assert float(jnp.max(big.masked_opacities()[n:])) < -10


def test_training_with_extensions(dataset):
    """Full loss closure: bilateral grid + sky dome + sky loss + normal terms
    all active and finite; aux params receive updates."""
    from gsplat_tpu.train.optim import OptimizationParams

    ds = dataset
    # Attach synthetic sky masks so the sky loss activates.
    ds.sky_masks = [np.zeros((c.height, c.width), np.float32) for c in ds.cameras]
    for m in ds.sky_masks:
        m[:8] = 1.0  # top rows are "sky"
    p = OptimizationParams(
        use_bilateral_grid=True,
        use_sky_dome=True,
        sky_dome_points=512,
        use_sky_loss=True,
        sky_loss_from_iter=1,
        use_normal_loss=True,
        normal_from_iter=2,
        use_depth_loss=False,
    )
    model = GaussianModel.create(
        ds.points, ds.colors, ds.scales, max_sh_degree=0
    )
    trainer = Trainer(model, ds, opt_params=p, max_instances=16384)
    assert trainer.mode == "rgbdn"
    assert set(trainer.features) == {"bilateral", "sky_dome", "sky_loss", "normal"}
    g0 = np.asarray(trainer.state.aux["bilateral_grids"]).copy()
    s0 = np.asarray(trainer.state.aux["sky_dc"]).copy()
    trainer.train(6)
    m = trainer.train_step()
    assert np.isfinite(float(m["loss"]))
    for k in ("l1", "ssim", "tv", "sky", "flatten", "normal"):
        assert np.isfinite(float(m["terms"][k])), k
    # Aux parameters actually trained.
    assert not np.array_equal(np.asarray(trainer.state.aux["bilateral_grids"]), g0)
    assert not np.array_equal(np.asarray(trainer.state.aux["sky_dc"]), s0)
    v = trainer.validate(quantize=False)
    assert np.isfinite(v["psnr"])
    ds.sky_masks = []


def test_training_with_depth_priors():
    """Depth supervision end-to-end: GT depths as priors, anchors fitted,
    depth term active and finite."""
    from gsplat_tpu.ops.rasterize import RasterizerConfig, render
    from gsplat_tpu.train.optim import OptimizationParams

    # Needs >= 256 projected SfM samples per view for anchor fitting.
    ds = make_synthetic_dataset(n_points=1500, n_views=6, width=48, height=48)
    model_gt = GaussianModel.create(ds.points, ds.colors, ds.scales, max_sh_degree=0,
                                    init_opacity=0.8)
    # Render GT inverse-ish depth priors from the ground-truth model.
    priors = []
    for cam in ds.cameras:
        cfg = RasterizerConfig(width=cam.width, height=cam.height, mode="rgbd",
                               max_instances=8192, impl="scan")
        img, _ = render(*model_gt.render_args(), camera=cam, config=cfg, sh_degree=0)
        d = np.asarray(img[..., 3])
        a = np.asarray(img[..., 4])
        e = np.where(a > 0.3, d / np.maximum(a, 1e-6), np.nan)
        priors.append((1.0 / np.maximum(e, 0.1)).astype(np.float32))  # disparity-ish prior
    ds.depths = priors
    p = OptimizationParams(use_depth_loss=True, use_sky_loss=False)
    model = GaussianModel.create(ds.points, ds.colors, ds.scales, max_sh_degree=0)
    trainer = Trainer(model, ds, opt_params=p, max_instances=16384)
    # The volumetric synthetic cloud has no surface for the auto-fit to anchor
    # against (rendered depth is the front of the cloud, SfM z is its volume),
    # so inject exact identity anchors: priors ARE disparities 1/e here.
    from gsplat_tpu.models.depth_supervision import DepthAnchor

    trainer.anchors = [
        DepthAnchor(a=1.0, b=0.0, floor=0.1, disparity=1.0, p_far=0.0)
        for _ in ds.cameras
    ]
    trainer.depth_qsteps = [0.0] * len(ds.cameras)
    trainer.features = tuple(set(trainer.features) | {"depth"})
    trainer.mode = "rgbd"
    trainer._configs.clear()
    assert "depth" in trainer.features
    trainer.train(4)
    m = trainer.train_step()
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["terms"]["depth"]))
    assert float(m["terms"]["depth"]) != 0.0
    ds.depths = []


def test_checkpoint_aux_groups_roundtrip(dataset, tmp_path):
    """Optional subsystem state (bilateral grids, sky colors) survives
    checkpointing (reference optional groups, checkpoint.jl:15-70)."""
    from gsplat_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    p = OptimizationParams(use_bilateral_grid=True, use_sky_dome=True,
                           sky_dome_points=256, use_depth_loss=False,
                           use_sky_loss=False)
    model = GaussianModel.create(dataset.points, dataset.colors, dataset.scales,
                                 max_sh_degree=0)
    trainer = Trainer(model, dataset, opt_params=p, max_instances=8192)
    trainer.train(2)
    path = str(tmp_path / "aux.safetensors")
    save_checkpoint(path, trainer.state)
    s2, _, _ = load_checkpoint(path)
    assert set(s2.aux) == {"bilateral_grids", "sky_dc"}
    np.testing.assert_array_equal(
        np.asarray(s2.aux["bilateral_grids"]),
        np.asarray(trainer.state.aux["bilateral_grids"]),
    )
    np.testing.assert_array_equal(
        np.asarray(s2.opt["mu"]["sky_dc"]), np.asarray(trainer.state.opt["mu"]["sky_dc"])
    )


def _final_params(trainer):
    return {k: np.asarray(v) for k, v in trainer.state.model.params().items()}


def test_overflow_rollback_chunked(dataset):
    """Mid-chunk instance-budget overflow must not bias training: the chunk
    is rolled back to its pre-chunk state, the budget grows, and the same
    views are replayed untruncated (VERDICT r1 weakness 4; the reference
    never truncates, rasterizer.jl:333-343)."""
    model_kw = dict(max_sh_degree=0)
    rng = np.random.default_rng(1)
    pts = dataset.points + rng.normal(0, 0.02, dataset.points.shape).astype(np.float32)

    def run(max_instances):
        model = GaussianModel.create(pts, dataset.colors, dataset.scales, **model_kw)
        tr = Trainer(model, dataset, max_instances=max_instances, seed=0)
        tr.train(2 * tr.chunk_steps)
        return tr

    small = run(256)   # overflows immediately -> rollback + growth
    big = run(1 << 15)  # never overflows
    assert small.max_instances > 256, "expected the tiny budget to grow"

    ps, pb = _final_params(small), _final_params(big)
    for k in ps:
        np.testing.assert_allclose(ps[k], pb[k], rtol=2e-5, atol=2e-6, err_msg=k)


def test_overflow_rollback_stepwise(dataset):
    """Same rollback semantics on the stepwise (train_step) path."""
    rng = np.random.default_rng(1)
    pts = dataset.points + rng.normal(0, 0.02, dataset.points.shape).astype(np.float32)

    def run(max_instances):
        model = GaussianModel.create(pts, dataset.colors, dataset.scales, max_sh_degree=0)
        tr = Trainer(model, dataset, max_instances=max_instances, seed=0)
        for _ in range(3):
            tr.train_step()
        return tr

    small = run(256)
    big = run(1 << 15)
    assert small.max_instances > 256
    ps, pb = _final_params(small), _final_params(big)
    for k in ps:
        np.testing.assert_allclose(ps[k], pb[k], rtol=2e-5, atol=2e-6, err_msg=k)


def test_joint_pose_opt_training(dataset):
    """BASELINE config 4 (joint pipeline): perturbed train-view poses are
    recovered WHILE the scene trains, with the bilateral grid active
    (reference examples/pose_opt.jl integrated into the Trainer)."""
    import dataclasses

    from gsplat_tpu.camera import rotation_6d_to_matrix
    from gsplat_tpu.models.camera_opt import pose_delta

    rng = np.random.default_rng(3)
    true_R = {v: np.asarray(dataset.cameras[v].R) for v in dataset.train_ids}
    true_t = {v: np.asarray(dataset.cameras[v].t) for v in dataset.train_ids}

    # Perturb a subset of train views; the untouched views anchor the gauge
    # (with every pose free, scene+poses can drift to a transformed frame).
    pert = set(dataset.train_ids[:2])
    perturbed = dataclasses.replace(dataset)  # shallow copy
    cams = list(dataset.cameras)
    for v in pert:
        d6 = np.array([1, 0, 0, 0, 1, 0], np.float32) + np.concatenate(
            [rng.normal(0, 0.015, 3), rng.normal(0, 0.015, 3)]
        ).astype(np.float32)
        R_bad = np.asarray(cams[v].R @ rotation_6d_to_matrix(jnp.asarray(d6)))
        t_bad = true_t[v] + rng.normal(0, 0.02, 3).astype(np.float32)
        cams[v] = cams[v].with_pose(R_bad, t_bad)
    perturbed.cameras = cams

    def pose_err(poses):
        R = np.asarray(poses["R"])
        t = np.asarray(poses["t"])
        errs = []
        for i, v in enumerate(dataset.train_ids):
            if v in pert:
                errs.append(
                    np.linalg.norm(R[i] - true_R[v]) + np.linalg.norm(t[i] - true_t[v])
                )
        return float(np.mean(errs))

    def run(use_pose):
        model = GaussianModel.create(
            dataset.points, dataset.colors, dataset.scales,
            max_sh_degree=0, init_opacity=0.8,
        )
        p = OptimizationParams(
            use_pose_opt=use_pose, pose_opt_lr=2e-3, use_bilateral_grid=True,
            use_depth_loss=False,
        )
        tr = Trainer(model, perturbed, opt_params=p, max_instances=8192)
        tr.train(240)
        return tr

    trainer = run(use_pose=True)
    assert "pose" in trainer.features and "bilateral" in trainer.features

    # The perturbed poses move meaningfully toward the truth while the
    # scene trains (full recovery needs the scene frozen — on a toy
    # 6-view scene the model co-adapts; on real scenes the many anchored
    # views dominate).
    e0 = pose_err(TrainState.create(trainer.state.model, poses={
        "R": jnp.stack([jnp.asarray(perturbed.cameras[v].R) for v in dataset.train_ids]),
        "t": jnp.stack([jnp.asarray(perturbed.cameras[v].t) for v in dataset.train_ids]),
    }).poses)
    e1 = pose_err(trainer.state.poses)
    assert np.isfinite(e1)
    assert e1 < 0.7 * e0, f"pose error did not recover: {e0:.4f} -> {e1:.4f}"

    # Functional gate: with corrupted train poses, pose opt must beat
    # no-pose-opt on held-out views.
    baseline = run(use_pose=False)
    psnr_on = trainer.validate(quantize=False)["psnr"]
    psnr_off = baseline.validate(quantize=False)["psnr"]
    assert psnr_on > psnr_off + 0.2, f"pose opt gained nothing: {psnr_off:.2f} -> {psnr_on:.2f}"

    # Optimized cameras reflect the recovered poses.
    oc = trainer.optimized_cameras()
    np.testing.assert_allclose(
        np.asarray(oc[0].R), np.asarray(trainer.state.poses["R"][0]), atol=1e-6
    )

    # Poses survive a checkpoint round-trip.
    import tempfile

    from gsplat_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "pose.safetensors")
        save_checkpoint(path, trainer.state)
        s2, _, _ = load_checkpoint(path)
        np.testing.assert_array_equal(
            np.asarray(s2.poses["R"]), np.asarray(trainer.state.poses["R"])
        )


def test_trainer_profile_writes_trace(tmp_path):
    """Trainer.profile wraps training in the JAX/XLA profiler and writes a
    TensorBoard/Perfetto trace directory (SURVEY §5 tracing row)."""
    import os

    from gsplat_tpu.data.colmap import make_synthetic_dataset
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.train.trainer import Trainer

    ds = make_synthetic_dataset(n_points=50, n_views=3, width=48, height=48)
    model = GaussianModel.create(ds.points, ds.colors, ds.scales, max_sh_degree=0)
    tr = Trainer(model, ds, max_instances=4096)
    out = str(tmp_path / "trace")
    tr.profile(4, out)
    assert tr.step == 4
    files = [
        os.path.join(r, f) for r, _, fs in os.walk(out) for f in fs
    ]
    assert any("trace" in f or f.endswith(".pb") or f.endswith(".json.gz") for f in files), files


def test_blur_matmul_matches_conv_oracle(rng):
    """The banded-matmul blur (the MXU spelling) must equal the depthwise
    conv composition — value AND gradient (differential testing, the
    reference's fused-SSIM pattern, runtests.jl:496-520)."""
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.train.losses import _blur, _blur_conv, ssim

    # (64, 48): single-block path; (136, 122): the bench-resolution divisors
    # (544=4x136, 976=8x122) exercising multi-block windows both axes;
    # (37, 41): primes -> full-band fallback.
    for h, w in ((64, 48), (136, 122), (37, 41)):
        img = jnp.asarray(rng.uniform(0, 1, (h, w, 15)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(_blur(img)), np.asarray(_blur_conv(img)), rtol=1e-5, atol=1e-6
        )
    x = jnp.asarray(rng.uniform(0, 1, (48, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 1, (48, 64, 3)), jnp.float32)
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
    g = jax.grad(lambda a: ssim(a, y))(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_long_horizon_schedule_behaviors(rng):
    """Long-horizon training behaviors in one 3.2k-step run (VERDICT r1
    weak #2): the SH ramp reaches max degree, densification grows the
    population inside the densify window, the step-3000 opacity reset
    actually drops activated opacities, screen-size pruning engages after
    it, and quality still improves end-to-end."""
    import jax

    from gsplat_tpu.data.colmap import make_synthetic_dataset
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.train.strategy import create_strategy
    from gsplat_tpu.train.trainer import Trainer

    ds = make_synthetic_dataset(n_points=120, n_views=5, width=32, height=32, seed=7)
    model = GaussianModel.create(
        ds.points, ds.colors, ds.scales, capacity=4096, max_sh_degree=2
    )
    tr = Trainer(
        model, ds, strategy=create_strategy("default"), max_instances=16384,
        sh_ramp_every=1000,
    )
    v0 = tr.validate()
    n0 = int(tr.state.model.n_alive)

    tr.train(2900)
    assert tr.sh_degree == 2, "SH ramp should reach max degree by step 2000"
    n_mid = int(tr.state.model.n_alive)
    assert n_mid > n0, "densification window should have grown the population"
    op_before_reset = np.asarray(jax.nn.sigmoid(tr.state.model.masked_opacities()))

    tr.train(200)  # crosses the step-3000 opacity reset
    op_after = np.asarray(jax.nn.sigmoid(tr.state.model.masked_opacities()))
    alive = np.asarray(tr.state.model.alive).astype(bool)
    # Reset clamps opacities to <= 0.01 at step 3000; 200 later steps can
    # recover some, but the mean must still sit well below the pre-reset mean.
    assert op_after[alive].mean() < 0.6 * op_before_reset[alive].mean(), (
        op_after[alive].mean(), op_before_reset[alive].mean()
    )

    tr.train(100)
    v1 = tr.validate()
    assert v1["psnr"] > v0["psnr"] + 5, (v0["psnr"], v1["psnr"])


def _poisoned_trainer(n_views=8, poison_ti=3):
    """Fresh dataset (never the shared fixture — we mutate images) with ONE
    train view's target poisoned with NaN."""
    ds = make_synthetic_dataset(n_points=120, n_views=n_views, width=48, height=48)
    vid = ds.train_ids[poison_ti]
    img = np.asarray(ds.images[vid]).copy()
    img[:8, :8, :] = np.nan
    ds.images[vid] = img
    model = GaussianModel.create(
        ds.points + np.random.default_rng(1).normal(0, 0.02, ds.points.shape).astype(np.float32),
        ds.colors, ds.scales, max_sh_degree=0,
    )
    return Trainer(model, ds, max_instances=8192)


def test_forensics_replays_failing_view_chunked(monkeypatch):
    """The NaN abort's forensics must replay the EXACT failing step's view —
    the report then provably reproduces the non-finite gradients (a wrong
    view replays finite grads and the report degrades to its fallback line).
    Reference nonfinite_gradient_report, training.jl:534-573."""
    monkeypatch.setenv("GST_DEBUG", "1")
    trainer = _poisoned_trainer()
    with pytest.raises(FloatingPointError) as ei:
        trainer.train(40)
    msg = str(ei.value)
    assert "Loss is not finite" in msg
    assert "non-finite entries" in msg, msg


def test_forensics_replays_failing_view_stepwise(monkeypatch):
    monkeypatch.setenv("GST_DEBUG", "1")
    trainer = _poisoned_trainer()
    with pytest.raises(FloatingPointError) as ei:
        trainer._train_stepwise(40)
    msg = str(ei.value)
    assert "Loss is not finite" in msg
    assert "non-finite entries" in msg, msg
