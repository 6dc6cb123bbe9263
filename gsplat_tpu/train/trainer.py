"""Training engine: jitted train step, validation, host-side Trainer loop.

TPU-native redesign of the reference Trainer/step!/validate
(reference: src/training.jl:185-818). The reference's mutable trainer
becomes a `TrainState` pytree advanced by a pure, jitted `train_step`:

    render (custom-vjp Pallas blend) -> photometric loss -> grads ->
    per-param Adam -> densification stats accumulation

Things that must escape jit (view selection, SH ramp bookkeeping, strategy
refinement every 100 steps, capacity growth) live on the host `Trainer`,
matching the reference's own step cadence (strategy.jl:76-105).

The per-Gaussian screen-gradient statistics the reference persists out of
its backward kernel (gstate.∇means_2d, states.jl:22-31) are obtained here
with a zero-valued `means2d_probe` argument whose gradient IS d(loss)/d(mean_2d)
— no kernel plumbing, just an extra cotangent output of the same autodiff call.
Stats match strategy.jl:118-136: accum += |pixel-grad * resolution/2|,
denom += 1, max_radii = max(radii), all gated on radius > 0.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..camera import Camera
from ..models.gaussians import GaussianModel
from ..ops.rasterize import RasterizerConfig, render
from .losses import photometric_loss, psnr, quantize8, ssim, mse as mse_fn
from .optim import OptimizationParams, adam_init, adam_update


@struct.dataclass
class TrainState:
    model: GaussianModel
    opt: dict
    step: jnp.ndarray  # () int32
    # Densification statistics (DefaultStrategy, strategy.jl:24-49).
    max_radii: jnp.ndarray  # (C,) int32
    grad_accum: jnp.ndarray  # (C,) f32
    stat_denom: jnp.ndarray  # (C,) f32

    @classmethod
    def create(cls, model: GaussianModel) -> "TrainState":
        c = model.capacity
        return cls(
            model=model,
            opt=adam_init(model.params()),
            step=jnp.zeros((), jnp.int32),
            max_radii=jnp.zeros((c,), jnp.int32),
            grad_accum=jnp.zeros((c,), jnp.float32),
            stat_denom=jnp.zeros((c,), jnp.float32),
        )

    def reset_stats(self) -> "TrainState":
        c = self.model.capacity
        return self.replace(
            max_radii=jnp.zeros((c,), jnp.int32),
            grad_accum=jnp.zeros((c,), jnp.float32),
            stat_denom=jnp.zeros((c,), jnp.float32),
        )


@partial(jax.jit, static_argnames=("config", "opt_params", "camera_extent"))
def train_step(
    state: TrainState,
    camera: Camera,
    target,  # (H, W, 3) f32
    background,  # (3,)
    sh_degree,  # traced int
    *,
    config: RasterizerConfig,
    opt_params: OptimizationParams,
    camera_extent: float,
):
    """One optimization step. Returns (new_state, metrics dict)."""
    params = state.model.params()
    probe = jnp.zeros((state.model.capacity, 2), jnp.float32)

    def loss_fn(params, probe):
        model = state.model.replace_params(params)
        img, aux = render(
            *model.render_args(),
            camera=camera,
            config=config,
            sh_degree=sh_degree,
            background=background,
            means2d_probe=probe,
        )
        image = img[..., :3]
        loss, parts = photometric_loss(image, target, opt_params.lambda_dssim)
        return loss, (parts, aux)

    (loss, (parts, aux)), (g_params, g_probe) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, probe)

    lrs = opt_params.lrs(state.step, camera_extent)
    new_params, new_opt = adam_update(params, g_params, state.opt, lrs)

    # Densification stats (strategy.jl:118-136): NDC-equivalent screen grads.
    res_half = jnp.array([config.width, config.height], jnp.float32) * 0.5
    gnorm = jnp.linalg.norm(g_probe * res_half[None, :], axis=1)
    visible = aux["radii"] > 0
    new_state = state.replace(
        model=state.model.replace_params(new_params),
        opt=new_opt,
        step=state.step + 1,
        max_radii=jnp.where(visible, jnp.maximum(state.max_radii, aux["radii"]), state.max_radii),
        grad_accum=jnp.where(visible, state.grad_accum + gnorm, state.grad_accum),
        stat_denom=jnp.where(visible, state.stat_denom + 1.0, state.stat_denom),
    )
    metrics = {
        "loss": loss,
        "l1": parts["l1"],
        "ssim": parts["ssim"],
        "n_instances": aux["n_instances"],
        "overflow": aux["overflow"],
    }
    return new_state, metrics


@partial(jax.jit, static_argnames=("config", "quantize"))
def eval_view(model: GaussianModel, camera: Camera, target, sh_degree, *, config, quantize=True):
    """Per-view SSIM/MSE/PSNR (reference validate, training.jl:487-532)."""
    img, _ = render(*model.render_args(), camera=camera, config=config, sh_degree=sh_degree)
    image = img[..., :3]
    if quantize:
        image = quantize8(image)
    return {
        "ssim": ssim(image, target),
        "mse": mse_fn(image, target),
        "psnr": psnr(image, target),
    }


class Trainer:
    """Host-side loop: view shuffling, SH ramp, strategy cadence, metrics.

    Mirrors the reference Trainer (training.jl:185-272) minus the GUI.
    """

    def __init__(
        self,
        model: GaussianModel,
        dataset,
        *,
        opt_params: OptimizationParams | None = None,
        mode: str = "rgb",
        max_instances: int = 1 << 20,
        strategy=None,
        sh_ramp_every: int = 1000,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.opt_params = opt_params or OptimizationParams()
        self.state = TrainState.create(model)
        self.strategy = strategy
        self.sh_ramp_every = sh_ramp_every
        self.mode = mode
        self.max_instances = max_instances
        self.rng = np.random.default_rng(seed)
        self._epoch: list = []
        self._configs: dict = {}
        self.camera_extent = float(dataset.camera_extent)
        self.sh_degree = 0
        self.impl = "pallas" if jax.default_backend() == "tpu" else "scan"
        self.history: list = []

    def config_for(self, camera: Camera) -> RasterizerConfig:
        key = (camera.width, camera.height)
        if key not in self._configs:
            self._configs[key] = RasterizerConfig(
                width=camera.width,
                height=camera.height,
                mode=self.mode,
                max_instances=self.max_instances,
                impl=self.impl,
            )
        return self._configs[key]

    def _next_view(self):
        if not self._epoch:
            self._epoch = list(self.dataset.train_ids)
            self.rng.shuffle(self._epoch)
        vid = self._epoch.pop()
        return self.dataset.cameras[vid], self.dataset.images[vid], vid

    @property
    def step(self) -> int:
        return int(self.state.step)

    def train_step(self):
        """One step: SH ramp, view pick, jitted update, strategy hook."""
        step = self.step
        if step > 0 and step % self.sh_ramp_every == 0:
            self.sh_degree = min(self.sh_degree + 1, self.state.model.max_sh_degree)

        camera, image, vid = self._next_view()
        cfg = self.config_for(camera)
        if self.opt_params.random_background:
            background = jnp.asarray(self.rng.random(3), jnp.float32)
        else:
            background = jnp.zeros(3, jnp.float32)

        self.state, metrics = train_step(
            self.state,
            camera,
            jnp.asarray(image),
            background,
            self.sh_degree,
            config=cfg,
            opt_params=self.opt_params,
            camera_extent=self.camera_extent,
        )
        if self.strategy is not None:
            self.state = self.strategy.post_train_step(self.state, self, step + 1)
        return metrics

    def train(self, n_steps: int, log_every: int = 0):
        for i in range(n_steps):
            m = self.train_step()
            if log_every and (self.step % log_every == 0 or i == n_steps - 1):
                loss = float(m["loss"])
                self.history.append((self.step, loss))
                print(
                    f"step {self.step}: loss={loss:.5f} l1={float(m['l1']):.5f} "
                    f"ssim={float(m['ssim']):.4f} "
                    f"alive={int(self.state.model.n_alive)}",
                    flush=True,
                )
        return self.state

    def validate(self, quantize: bool = True) -> dict:
        """Mean SSIM/MSE/PSNR over test views, per-view-then-mean
        (the reference reduction, training.jl:487-532)."""
        if not self.dataset.test_ids:
            return {}
        acc = {"ssim": 0.0, "mse": 0.0, "psnr": 0.0}
        for vid in self.dataset.test_ids:
            cam = self.dataset.cameras[vid]
            out = eval_view(
                self.state.model,
                cam,
                jnp.asarray(self.dataset.images[vid]),
                self.sh_degree,
                config=self.config_for(cam),
                quantize=quantize,
            )
            for k in acc:
                acc[k] += float(out[k])
        n = len(self.dataset.test_ids)
        return {k: v / n for k, v in acc.items()}
