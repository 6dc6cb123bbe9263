"""Chunked (lax.scan + pipelined dispatch) training == stepwise training.

The TPU path always trains through scan-chunks with speculative dispatch and
host barriers at strategy boundaries (trainer._train); the stepwise path is
the simple per-step loop. The two must produce identical parameters across a
horizon that crosses EVERY kind of boundary: densify events, an opacity
reset, and an SH-ramp step landing mid-horizon. This pins the machinery the
quality runs use at scale to the per-step semantics the rest of the suite
verifies.
"""
import numpy as np
import pytest

from gsplat_tpu.data.colmap import make_synthetic_dataset
from gsplat_tpu.models.gaussians import GaussianModel
from gsplat_tpu.train.strategy import DefaultStrategy, MCMCStrategy
from gsplat_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def dataset():
    return make_synthetic_dataset(n_points=130, n_views=6, width=48, height=48)


def _strategy():
    # Compressed cadence: densify at 8/16/24, opacity reset at 12 and 24 —
    # all inside the 30-step horizon.
    return DefaultStrategy(
        densify_from_iter=8,
        densify_until_iter=100,
        densification_interval=8,
        opacity_reset_interval=12,
        seed=0,
    )


def _make_trainer(dataset, **kw):
    model = GaussianModel.create(
        dataset.points
        + np.random.default_rng(1).normal(0, 0.02, dataset.points.shape).astype(np.float32),
        dataset.colors,
        dataset.scales,
        max_sh_degree=2,
    )
    return Trainer(
        model, dataset, strategy=_strategy(), max_instances=8192, seed=0,
        sh_ramp_every=10, **kw
    )


def test_chunked_equals_stepwise(dataset, monkeypatch):
    n = 30

    chunked = _make_trainer(dataset)
    assert chunked._can_chunk()
    chunked.chunk_steps = 7  # does NOT divide the boundaries: forces cuts
    chunked.train(n)

    stepwise = _make_trainer(dataset)
    monkeypatch.setattr(type(stepwise), "_can_chunk", lambda self: False)
    stepwise.train(n)

    assert int(chunked.state.step) == int(stepwise.state.step) == n
    assert chunked.sh_degree == stepwise.sh_degree
    np.testing.assert_array_equal(
        np.asarray(chunked.state.model.alive), np.asarray(stepwise.state.model.alive)
    )
    pc = {k: np.asarray(v) for k, v in chunked.state.model.params().items()}
    ps = {k: np.asarray(v) for k, v in stepwise.state.model.params().items()}
    for k in pc:
        np.testing.assert_allclose(pc[k], ps[k], rtol=2e-5, atol=2e-6, err_msg=k)
    # Optimizer moments and densify stats agree too (same surgery applied).
    for grp in ("mu", "nu"):
        for k, v in chunked.state.opt[grp].items():
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(stepwise.state.opt[grp][k]),
                rtol=2e-5, atol=2e-6, err_msg=f"{grp}/{k}",
            )
    np.testing.assert_allclose(
        np.asarray(chunked.state.grad_accum),
        np.asarray(stepwise.state.grad_accum), rtol=2e-4, atol=1e-5,
    )


def test_chunked_equals_stepwise_mcmc(dataset, monkeypatch):
    """Same equivalence for MCMC: in-jit per-step position noise keyed by
    state.step plus refine (relocate/grow) at boundaries."""
    n = 24

    def make(**kw):
        model = GaussianModel.create(
            dataset.points
            + np.random.default_rng(1).normal(0, 0.02, dataset.points.shape).astype(np.float32),
            dataset.colors,
            dataset.scales,
            max_sh_degree=1,
        )
        strat = MCMCStrategy(
            max_cap=600, start_refine=6, stop_refine=100, refine_every=7,
            max_scale=10.0, seed=0,
        )
        return Trainer(
            model, dataset, strategy=strat, max_instances=8192, seed=0,
            sh_ramp_every=10, **kw
        )

    chunked = make()
    assert chunked._can_chunk()
    chunked.chunk_steps = 5  # does not divide refine_every=7
    chunked.train(n)

    stepwise = make()
    monkeypatch.setattr(type(stepwise), "_can_chunk", lambda self: False)
    stepwise.train(n)

    assert int(chunked.state.step) == int(stepwise.state.step) == n
    np.testing.assert_array_equal(
        np.asarray(chunked.state.model.alive), np.asarray(stepwise.state.model.alive)
    )
    pc = {k: np.asarray(v) for k, v in chunked.state.model.params().items()}
    ps = {k: np.asarray(v) for k, v in stepwise.state.model.params().items()}
    for k in pc:
        np.testing.assert_allclose(pc[k], ps[k], rtol=2e-5, atol=2e-6, err_msg=k)
