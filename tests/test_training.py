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
