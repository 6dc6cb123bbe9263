"""Training engine: jitted train step, validation, host-side Trainer loop.

TPU-native redesign of the reference Trainer/step!/validate
(reference: src/training.jl:185-818). The reference's mutable trainer
becomes a `TrainState` pytree advanced by a pure, jitted `train_step`:

    render (custom-vjp Pallas blend) -> [sky composite] -> [bilateral slice]
    -> L1+SSIM + reg + tv + depth + sky + flatten + normal -> grads ->
    per-param Adam (+ grids, + sky colors) -> densification stats

mirroring the reference loss closure (training.jl:641-752) term for term.
Things that must escape jit (view selection, SH ramp bookkeeping, strategy
refinement every 100 steps, capacity growth, overflow regrowth) live on the
host `Trainer`, matching the reference's own step cadence.

The per-Gaussian screen-gradient statistics the reference persists out of
its backward kernel (gstate.∇means_2d, states.jl:22-31) are obtained here
with a zero-valued `means2d_probe` argument whose gradient IS
d(loss)/d(mean_2d) — an extra cotangent of the same autodiff call.
Stats match strategy.jl:118-136: accum += |pixel-grad * resolution/2|,
denom += 1, max_radii = max(radii), all gated on radius > 0.

Per-view optional inputs (depth targets, sky masks) are always passed as
arrays with a weight that zeroes absent ones — one trace for all views.
"""
from __future__ import annotations

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
    # Optional auxiliary trainables: bilateral_grids, sky_dc.
    aux: dict = struct.field(default_factory=dict)
    # Optional per-train-view optimized poses {"R": (V,3,3), "t": (V,3)} —
    # updated by single-step-Adam sign steps and re-absorbed every step
    # (reference CameraOpt, camera_opt.jl:33-53), NOT by the main Adam.
    poses: dict = struct.field(default_factory=dict)

    @classmethod
    def create(
        cls, model: GaussianModel, aux: dict | None = None, poses: dict | None = None
    ) -> "TrainState":
        c = model.capacity
        aux = aux or {}
        opt = adam_init(model.params() | aux)
        return cls(
            model=model,
            opt=opt,
            step=jnp.zeros((), jnp.int32),
            max_radii=jnp.zeros((c,), jnp.int32),
            grad_accum=jnp.zeros((c,), jnp.float32),
            stat_denom=jnp.zeros((c,), jnp.float32),
            aux=aux,
            poses=poses or {},
        )

    def reset_stats(self) -> "TrainState":
        c = self.model.capacity
        return self.replace(
            max_radii=jnp.zeros((c,), jnp.int32),
            grad_accum=jnp.zeros((c,), jnp.float32),
            stat_denom=jnp.zeros((c,), jnp.float32),
        )


LOSS_TERMS = ("l1", "ssim", "reg", "tv", "depth", "sky", "flatten", "normal")


def _step_core(
    state: TrainState,
    camera: Camera,
    target,  # (H, W, 3) f32
    background,  # (3,)
    sh_degree,  # traced int
    view_idx,  # traced int: index into train-view-aligned aux arrays
    extras,  # dict of per-view arrays (depth target pack, sky mask, rays)
    *,
    config: RasterizerConfig,
    opt_params: OptimizationParams,
    camera_extent: float,
    reg_weights: tuple = (0.0, 0.0),  # (opacity_reg, scale_reg) — strategy hook
    features: tuple = (),  # subset of {"bilateral","depth","sky_dome","sky_loss","normal"}
    sky=None,  # SkyDome (static by identity; frozen geometry enters as consts)
    mcmc_noise: tuple | None = None,  # (noise_lr, max_scale, seed): per-step noise in-jit
):
    """One optimization step. Returns (new_state, metrics dict).

    Batched-views mode: when `target` is (B, H, W, 3) — with `camera`,
    `view_idx`, and `extras` carrying a matching leading axis — the per-view
    loss is vmapped and the step optimizes the MEAN over B views. This is the
    data-parallel step (parallel/data_parallel.py shards the batch axis over
    the mesh; the mean's gradient transpose is the per-Gaussian psum over ICI
    that replaces the reference backward's global atomics, SURVEY §2.8).
    Densification statistics accumulate per view exactly as B sequential
    steps would (per-view probe rows recover per-view screen-gradient norms).
    """
    p = opt_params
    use_bilateral = "bilateral" in features
    use_depth = "depth" in features
    use_sky_dome = "sky_dome" in features
    use_sky_loss = "sky_loss" in features
    use_normal = "normal" in features
    use_pose = "pose" in features

    batch = target.ndim == 4
    B = target.shape[0] if batch else 1

    params = state.model.params()
    aux_params = dict(state.aux)
    cap = state.model.capacity
    probe = jnp.zeros(((B, cap, 2) if batch else (cap, 2)), jnp.float32)
    # Zero-valued pose deltas: their gradient IS the pose gradient, always
    # linearized around the current pose (reference CameraOpt semantics —
    # deltas absorbed and reset each step, camera_opt.jl:33-53).
    lead = (B,) if batch else ()
    pose_params = {
        "drot": jnp.zeros(lead + (6,), jnp.float32),
        "dt": jnp.zeros(lead + (3,), jnp.float32),
    }
    step_f = state.step.astype(jnp.float32)

    def view_loss(params, aux_params, probe, pose_params, camera, target, view_idx, extras):
        model = state.model.replace_params(params)
        if use_pose:
            from ..models.camera_opt import pose_delta

            R_v = state.poses["R"][view_idx]
            t_v = state.poses["t"][view_idx]
            R_w2c, t_w2c = pose_delta(
                R_v, t_v, pose_params["drot"], pose_params["dt"]
            )
        else:
            R_w2c = t_w2c = None
        img, aux = render(
            *model.render_args(),
            camera=camera,
            config=config,
            sh_degree=sh_degree,
            background=background,
            R_w2c=R_w2c,
            t_w2c=t_w2c,
            means2d_probe=probe,
        )
        image = img[..., :3]
        terms = {k: 0.0 for k in LOSS_TERMS}

        depth_img = img[..., 3] if config.mode != "rgb" else None
        alpha_img = img[..., 4] if config.mode != "rgb" else None

        # Far-field dome behind the scene, before appearance correction
        # (training.jl:670-677).
        if use_sky_dome:
            sky_rgb = sky.render(camera, aux_params["sky_dc"], config=None)
            from ..models.sky_dome import composite_sky

            image = composite_sky(image, alpha_img, sky_rgb)

        # Per-view appearance correction before the photometric loss.
        if use_bilateral:
            from ..models.bilateral_grid import bilateral_slice

            image = bilateral_slice(image, aux_params["bilateral_grids"][view_idx])

        loss, parts = photometric_loss(image, target, p.lambda_dssim)
        terms["l1"] = (1.0 - p.lambda_dssim) * parts["l1"]
        terms["ssim"] = p.lambda_dssim * (1.0 - parts["ssim"])

        op_reg, sc_reg = reg_weights
        if op_reg or sc_reg:
            # Strategy regularization hook (mcmc.jl:104-107), masked mean
            # over alive rows (the reference has no dead rows).
            a = model.alive.astype(jnp.float32)
            n = jnp.maximum(jnp.sum(a), 1.0)
            reg = op_reg * jnp.sum(jax.nn.sigmoid(model.masked_opacities()) * a) / n
            reg += sc_reg * jnp.sum(jnp.mean(jnp.exp(model.scales), axis=1) * a) / n
            terms["reg"] = reg
            loss = loss + reg

        if use_bilateral:
            from ..models.bilateral_grid import tv_loss

            terms["tv"] = p.tv_loss_weight * tv_loss(aux_params["bilateral_grids"])
            loss = loss + terms["tv"]

        if use_depth:
            from ..models.depth_supervision import ssi_depth_loss

            # Weight decays to final_scale over depth_loss_steps
            # (training.jl:618-620); zero for views without an anchor.
            decay = p.depth_loss_final_scale ** jnp.clip(
                step_f / p.depth_loss_steps, 0.0, 1.0
            )
            w = p.depth_loss_weight * decay * extras["depth_weight"]
            terms["depth"] = w * ssi_depth_loss(
                depth_img,
                alpha_img,
                target=extras["depth_target"],
                half_band=extras["depth_half_band"],
                valid=extras["depth_valid"] > 0.5,
                far_extrap=extras["depth_far_extrap"] > 0.5,
                depth_floor=extras["depth_floor"],
                grad_weight=p.depth_loss_gradient_weight,
            )
            loss = loss + terms["depth"]

        if use_sky_loss:
            from ..models.sky_dome import sky_opacity_loss

            # From sky_loss_from_iter on (training.jl:633-637); masks absent
            # for a view arrive as zeros.
            gate = (step_f >= p.sky_loss_from_iter).astype(jnp.float32)
            terms["sky"] = (
                p.sky_loss_weight * gate * sky_opacity_loss(alpha_img, extras["sky_mask"])
            )
            loss = loss + terms["sky"]

        if use_normal:
            from ..models.geometry_regularization import (
                depth_normal_consistency_loss,
                flatten_loss,
            )

            gate = (step_f >= p.normal_from_iter).astype(jnp.float32)
            terms["flatten"] = gate * p.normal_flatten_weight * flatten_loss(
                model.scales, model.alive
            )
            terms["normal"] = gate * p.normal_consistency_weight * (
                depth_normal_consistency_loss(
                    depth_img, alpha_img, img[..., 5:8],
                    rays=(extras["rays_x"], extras["rays_y"]),
                )
            )
            loss = loss + terms["flatten"] + terms["normal"]

        return loss, (terms, parts, aux)

    if batch:

        def loss_fn(params, aux_params, probe, pose_params):
            losses, aux_out = jax.vmap(
                view_loss, in_axes=(None, None, 0, 0, 0, 0, 0, 0)
            )(params, aux_params, probe, pose_params, camera, target, view_idx, extras)
            return jnp.mean(losses), aux_out

    else:

        def loss_fn(params, aux_params, probe, pose_params):
            return view_loss(
                params, aux_params, probe, pose_params, camera, target, view_idx, extras
            )

    (loss, (terms, parts, aux)), (g_params, g_aux, g_probe, g_pose) = (
        jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(
            params, aux_params, probe, pose_params
        )
    )

    lrs = p.lrs(state.step, camera_extent)
    if use_bilateral:
        from ..models.bilateral_grid import bilateral_grid_lr

        lrs["bilateral_grids"] = bilateral_grid_lr(
            step_f, p.bilateral_grid_lr, p.bilateral_grid_lr_steps
        )
    if use_sky_dome:
        lrs["sky_dc"] = p.sky_dome_lr

    all_params = params | aux_params
    all_grads = g_params | g_aux
    new_all, new_opt = adam_update(all_params, all_grads, state.opt, lrs)
    new_params = {k: new_all[k] for k in params}
    new_aux = {k: new_all[k] for k in aux_params}

    new_poses = state.poses
    if use_pose:
        from ..models.camera_opt import pose_delta

        # Single-step Adam from zero state (bias-corrected t=1: mhat=g,
        # vhat=g^2) = an elementwise sign step of size pose_opt_lr — exactly
        # the reference's reset-every-step Adam (camera_opt.jl:33-41). The
        # sign step is invariant to the batch mean's 1/B gradient scaling.
        eps = 1e-15
        upd = {
            k: -p.pose_opt_lr * g / (jnp.sqrt(g * g) + eps)
            for k, g in g_pose.items()
        }
        pd = jax.vmap(pose_delta) if batch else pose_delta
        new_R, new_t = pd(
            state.poses["R"][view_idx], state.poses["t"][view_idx],
            upd["drot"], upd["dt"],
        )
        new_poses = {
            "R": state.poses["R"].at[view_idx].set(new_R),
            "t": state.poses["t"].at[view_idx].set(new_t),
        }

    # Densification stats (strategy.jl:118-136): NDC-equivalent screen grads.
    res_half = jnp.array([config.width, config.height], jnp.float32) * 0.5
    if batch:
        # Per-view probe rows; undo the mean's 1/B so each view's norm
        # matches what a sequential step would have accumulated.
        gnorm = jnp.linalg.norm(g_probe * (B * res_half)[None, None, :], axis=-1)
        visible = aux["radii"] > 0  # (B, C)
        new_max_radii = jnp.maximum(
            state.max_radii, jnp.max(jnp.where(visible, aux["radii"], 0), axis=0)
        )
        new_grad_accum = state.grad_accum + jnp.sum(
            jnp.where(visible, gnorm, 0.0), axis=0
        )
        new_denom = state.stat_denom + jnp.sum(visible.astype(jnp.float32), axis=0)
    else:
        gnorm = jnp.linalg.norm(g_probe * res_half[None, :], axis=1)
        visible = aux["radii"] > 0
        new_max_radii = jnp.where(
            visible, jnp.maximum(state.max_radii, aux["radii"]), state.max_radii
        )
        new_grad_accum = jnp.where(visible, state.grad_accum + gnorm, state.grad_accum)
        new_denom = jnp.where(visible, state.stat_denom + 1.0, state.stat_denom)
    new_state = state.replace(
        model=state.model.replace_params(new_params),
        opt=new_opt,
        step=state.step + 1,
        max_radii=new_max_radii,
        grad_accum=new_grad_accum,
        stat_denom=new_denom,
        aux=new_aux,
        poses=new_poses,
    )
    if mcmc_noise is not None:
        # MCMC position noise EVERY step (mcmc.jl:109-124), inside the jitted
        # step so MCMC training rides the scan-chunked dispatch path. The key
        # derives deterministically from the step counter.
        from .strategy import _inject_noise
        from .optim import lr_exp_scheduler as _sched

        noise_lr, max_scale, seed = mcmc_noise
        key = jax.random.fold_in(jax.random.PRNGKey(seed), new_state.step)
        lr = _sched(
            new_state.step, p.lr_points_start, p.lr_points_end, p.lr_points_steps
        ) * camera_extent
        m2 = new_state.model
        pts = _inject_noise(
            m2.points, m2.opacities, m2.scales, m2.rotations, m2.alive, key, lr,
            noise_lr=noise_lr, max_kick=0.5 * max_scale * camera_extent,
        )
        new_state = new_state.replace(model=m2.replace(points=pts))

    # All step metrics ride ONE device->host transfer (the reference's
    # single per-step loss D2H, training.jl:756); individual entries remain
    # for tests/tools that want device values.
    if batch:
        l1_m, ssim_m = jnp.mean(parts["l1"]), jnp.mean(parts["ssim"])
        n_inst = jnp.max(aux["n_instances"])
        p_inst = jnp.max(aux["p_instances"])
        overflow = jnp.any(aux["overflow"])
        terms_m = {k: jnp.mean(jnp.asarray(terms[k], jnp.float32)) for k in LOSS_TERMS}
    else:
        l1_m, ssim_m = parts["l1"], parts["ssim"]
        n_inst = aux["n_instances"]
        p_inst = aux["p_instances"]
        overflow = aux["overflow"]
        terms_m = terms
    packed = jnp.stack(
        [
            loss,
            l1_m,
            ssim_m,
            n_inst.astype(jnp.float32),
            overflow.astype(jnp.float32),
        ]
        + [jnp.asarray(terms_m[k], jnp.float32) for k in LOSS_TERMS]
        # Col 13: chunk-aligned instance demand — the host fits the static
        # budget to this (grow-to-fit on overflow, shrink on sustained
        # under-utilization) instead of blind doubling.
        + [p_inst.astype(jnp.float32)]
    )
    metrics = {
        "loss": loss,
        "l1": l1_m,
        "ssim": ssim_m,
        "n_instances": n_inst,
        "p_instances": p_inst,
        "overflow": overflow,
        "terms": terms_m,
        "packed": packed,
    }
    return new_state, metrics


train_step = partial(
    jax.jit,
    static_argnames=(
        "config", "opt_params", "camera_extent", "reg_weights", "features", "sky",
        "mcmc_noise",
    ),
)(_step_core)


@partial(
    jax.jit,
    static_argnames=(
        "config", "opt_params", "camera_extent", "reg_weights", "features", "sky",
        "mcmc_noise",
    ),
)
def train_chunk(
    state: TrainState,
    cameras: Camera,  # K-stacked pytree (static resolution shared)
    targets,  # (K, H, W, 3), or the FULL (V, H, W, 3) stack with target_ids
    backgrounds,  # (K, 3)
    sh_degrees,  # (K,) int32
    view_idxs,  # (K,) int32
    extras,  # K-stacked per-view dict
    target_ids=None,  # (K,) int32 rows of `targets` (resident-stack mode)
    **kw,
):
    """K training steps in ONE dispatch via lax.scan — amortizes the
    host->device dispatch/sync overhead that dominates remote-TPU training
    (the reference pays a full host round-trip per step, training.jl:756).
    Returns (state, packed metrics (K, 14)).

    Resident-stack mode (`target_ids` given): `targets` is the whole
    dataset's (V, H, W, 3) device array, passed once per dispatch and
    indexed per scanned step — re-stacking K full-resolution images on the
    host every chunk costs ~5 ms/step at 640x416."""

    def body(state, xs):
        if target_ids is None:
            cam, tgt, bg, shd, vi, ex = xs
        else:
            cam, tid, bg, shd, vi, ex = xs
            tgt = targets[tid]
        state, metrics = _step_core(state, cam, tgt, bg, shd, vi, ex, **kw)
        return state, metrics["packed"]

    seq = targets if target_ids is None else target_ids
    return jax.lax.scan(
        body, state, (cameras, seq, backgrounds, sh_degrees, view_idxs, extras)
    )


@partial(jax.jit, static_argnames=("config", "quantize", "sky"))
def eval_view(
    model: GaussianModel,
    camera: Camera,
    target,
    sh_degree,
    *,
    config,
    quantize=True,
    sky=None,
    sky_dc=None,
):
    """Per-view SSIM/MSE/PSNR (reference validate, training.jl:487-532),
    sky composited when present. Also reports the render's instance-budget
    overflow flag: a truncated render silently deflates the metrics, so
    callers must be able to see it."""
    img, aux = render(*model.render_args(), camera=camera, config=config, sh_degree=sh_degree)
    image = img[..., :3]
    if sky is not None:
        from ..models.sky_dome import composite_sky

        image = composite_sky(image, img[..., 4], sky.render(camera, sky_dc, config=None))
    if quantize:
        image = quantize8(image)
    return {
        "ssim": ssim(image, target),
        "mse": mse_fn(image, target),
        "psnr": psnr(image, target),
        "overflow": aux["overflow"],
        "p_instances": aux["p_instances"],
    }


class Trainer:
    """Host-side loop: view shuffling, SH ramp, strategy cadence, subsystem
    setup, metrics. Mirrors the reference Trainer (training.jl:185-394)."""

    def __init__(
        self,
        model: GaussianModel,
        dataset,
        *,
        opt_params: OptimizationParams | None = None,
        mode: str | None = None,
        max_instances: int = 1 << 20,
        strategy=None,
        sh_ramp_every: int = 1000,
        metrics_every: int | None = None,
        cache_images_on_device: bool = True,
        autosave_every: int = 0,
        autosave_path: str | None = None,
        seed: int = 0,
        antialiased: bool = False,
    ):
        self.dataset = dataset
        self.opt_params = opt_params or OptimizationParams()
        p = self.opt_params
        self.strategy = strategy
        self.sh_ramp_every = sh_ramp_every
        self.max_instances = max_instances
        self.antialiased = antialiased
        self.rng = np.random.default_rng(seed)
        self._epoch: list = []
        self._configs: dict = {}
        self.camera_extent = float(dataset.camera_extent)
        self.sh_degree = 0
        self.impl = "pallas" if jax.default_backend() == "tpu" else "scan"
        self.history: list = []
        from .logging import LossTracker

        self.losses = LossTracker()
        # Host<->device sync policy: blocking on freshly dispatched work is
        # expensive on remote TPUs, so metrics (incl. the overflow flag) are
        # fetched every `metrics_every` steps instead of every step. The last
        # fetched values are reported in between.
        if metrics_every is None:
            metrics_every = 10 if jax.default_backend() == "tpu" else 1
        self.metrics_every = max(1, metrics_every)
        self.chunk_steps = 20 if jax.default_backend() == "tpu" else 4
        self._last_metrics = None
        # Overflow-rollback machinery: dispatched-but-unverified steps are kept
        # as (step, inputs, packed device array) together with the pre-dispatch
        # state snapshot, so a truncated render (instance-budget overflow) can
        # be discarded and re-run after regrowth instead of silently biasing
        # the parameters (the reference never truncates — it host-syncs the
        # exact n_rendered and grows first, rasterizer.jl:333-343).
        self._replay: list = []
        self._replay_state = None
        self._image_cache: dict = {} if cache_images_on_device else None
        self.autosave_every = autosave_every
        self.autosave_path = autosave_path
        self._autosave_failed = False
        self.train_time = 0.0  # wall seconds inside train()/train_step()
        self.train_steps_timed = 0

        # --- optional subsystems (training.jl:295-394) ---
        self.anchors = None
        self.depth_qsteps = None
        if p.use_depth_loss and getattr(dataset, "depths", None) and any(
            d is not None for d in dataset.depths
        ):
            from ..models.depth_supervision import (
                anchors_fingerprint,
                fit_depth_anchors,
                load_anchor_cache,
                save_anchor_cache,
            )

            priors = [dataset.depths[i] for i in range(len(dataset.cameras))]
            # Fingerprinted sidecar cache next to the dataset: a second
            # startup on the same data skips the RANSAC anchor fits
            # (reference depth_supervision.jl:360-404, training.jl:307-329).
            root = getattr(dataset, "root", None)
            cache_path = None
            if root:
                import os as _os

                cache_path = _os.path.join(
                    root, f"depth_anchors_{p.depth_loss_mode}.json"
                )
            fp = anchors_fingerprint(
                dataset.points, list(dataset.names), p.depth_loss_mode
            )
            self.anchors = (
                load_anchor_cache(cache_path, fp) if cache_path else None
            )
            if self.anchors is None:
                self.anchors = fit_depth_anchors(
                    dataset.points, dataset.cameras, priors, mode=p.depth_loss_mode
                )
                if cache_path:
                    try:
                        save_anchor_cache(cache_path, self.anchors, fp)
                    except OSError as e:
                        print(f"[trainer] anchor cache write failed: {e}", flush=True)
            qs = getattr(dataset, "depth_qsteps", None)
            self.depth_qsteps = (
                list(qs) if qs else [1.0 / 255.0] * len(dataset.cameras)
            )

        self.sky = None
        if p.use_sky_dome:
            from ..models.sky_dome import SkyDome, estimate_up_vec

            up = estimate_up_vec(dataset.cameras)
            centroid = np.mean(
                [np.asarray(c.camera_center) for c in dataset.cameras], axis=0
            )
            self.sky = SkyDome(
                dataset.cameras[0],
                n_points=p.sky_dome_points,
                shape=p.sky_dome_shape,
                radius=p.sky_dome_radius_factor * self.camera_extent,
                center=centroid,
                up=up,
                impl=self.impl,
                max_instances=max_instances,
            )

        self.has_sky_masks = p.use_sky_loss and bool(
            getattr(dataset, "sky_masks", None)
        ) and any(m is not None for m in dataset.sky_masks)

        aux = {}
        if p.use_bilateral_grid:
            from ..models.bilateral_grid import make_bilateral_grids

            aux["bilateral_grids"] = make_bilateral_grids(
                len(dataset.train_ids), p.bilateral_grid_size
            )
        if self.sky is not None:
            aux["sky_dc"] = self.sky.init_features_dc

        feats = []
        if p.use_bilateral_grid:
            feats.append("bilateral")
        if self.anchors is not None:
            feats.append("depth")
        if self.sky is not None:
            feats.append("sky_dome")
        if self.has_sky_masks:
            feats.append("sky_loss")
        if p.use_normal_loss:
            feats.append("normal")
        poses = None
        if p.use_pose_opt:
            feats.append("pose")
            poses = {
                "R": jnp.asarray(
                    np.stack([np.asarray(dataset.cameras[v].R) for v in dataset.train_ids])
                ),
                "t": jnp.asarray(
                    np.stack([np.asarray(dataset.cameras[v].t) for v in dataset.train_ids])
                ),
            }
        self.features = tuple(feats)

        if mode is None:
            if "normal" in feats:
                mode = "rgbdn"
            elif any(f in feats for f in ("depth", "sky_dome", "sky_loss")):
                mode = "rgbd"
            else:
                mode = "rgb"
        self.mode = mode

        self.state = TrainState.create(model, aux, poses)

    # -- configs ------------------------------------------------------------

    def config_for(self, camera: Camera, mode: str | None = None) -> RasterizerConfig:
        key = (camera.width, camera.height, mode or self.mode)
        if key not in self._configs:
            self._configs[key] = RasterizerConfig(
                width=camera.width,
                height=camera.height,
                mode=mode or self.mode,
                max_instances=self.max_instances,
                impl=self.impl,
                antialiased=self.antialiased,
            )
        return self._configs[key]

    def _next_view(self):
        if not self._epoch:
            self._epoch = list(range(len(self.dataset.train_ids)))
            self.rng.shuffle(self._epoch)
        ti = self._epoch.pop()
        vid = self.dataset.train_ids[ti]
        return self.dataset.cameras[vid], self.dataset.images[vid], ti, vid

    _extras_cache: dict | None = None

    def _extras_for(self, camera: Camera, vid: int):
        """Per-view auxiliary arrays; absent features arrive as zeros with
        zero weight (one trace for all views). Memoized per view — the
        arrays are pure functions of (anchor, depth prior, camera), all
        fixed after setup, and depth_target is device work."""
        if self._extras_cache is None:
            self._extras_cache = {}
        if vid in self._extras_cache:
            return self._extras_cache[vid]
        H, W = camera.height, camera.width
        ex = {}
        if "depth" in self.features:
            anchor = self.anchors[vid] if self.anchors else None
            if anchor is not None and self.dataset.depths[vid] is not None:
                from ..models.depth_supervision import depth_target

                qstep = self.depth_qsteps[vid] if self.depth_qsteps else 0.0
                t, hb, valid, far = depth_target(
                    anchor, jnp.asarray(self.dataset.depths[vid]), qstep
                )
                ex.update(
                    depth_target=t,
                    depth_half_band=hb,
                    depth_valid=valid.astype(jnp.float32),
                    depth_far_extrap=far.astype(jnp.float32),
                    depth_floor=jnp.float32(anchor.floor),
                    depth_weight=jnp.float32(1.0),
                )
            else:
                ex.update(
                    depth_target=jnp.zeros((H, W)),
                    depth_half_band=jnp.zeros((H, W)),
                    depth_valid=jnp.zeros((H, W)),
                    depth_far_extrap=jnp.zeros((H, W)),
                    depth_floor=jnp.float32(1.0),
                    depth_weight=jnp.float32(0.0),
                )
        if "sky_loss" in self.features:
            m = self.dataset.sky_masks[vid] if self.dataset.sky_masks else None
            ex["sky_mask"] = (
                jnp.asarray(m) if m is not None else jnp.zeros((H, W), jnp.float32)
            )
        if "normal" in self.features:
            from ..models.geometry_regularization import pixel_rays

            rx, ry = pixel_rays(camera)
            ex["rays_x"] = rx
            ex["rays_y"] = ry
        self._extras_cache[vid] = ex
        return ex

    @property
    def step(self) -> int:
        return int(self.state.step)

    def optimized_cameras(self) -> list:
        """Train-view cameras with the optimized poses absorbed (dataset
        cameras when pose optimization is off)."""
        cams = [self.dataset.cameras[v] for v in self.dataset.train_ids]
        if not self.state.poses:
            return cams
        R = np.asarray(self.state.poses["R"])
        t = np.asarray(self.state.poses["t"])
        return [c.with_pose(R[i], t[i]) for i, c in enumerate(cams)]

    def _step_inputs(self):
        """Pick the next view and assemble one step's dispatch inputs
        (host-side; advances the epoch shuffle and SH ramp)."""
        step = len(self._replay) + (
            int(self._replay[0][0]) if self._replay else self.step
        )
        if step > 0 and step % self.sh_ramp_every == 0:
            self.sh_degree = min(self.sh_degree + 1, self.state.model.max_sh_degree)
        camera, image, ti, vid = self._next_view()
        if self._image_cache is not None:
            if vid not in self._image_cache:
                self._image_cache[vid] = jnp.asarray(image)
            image = self._image_cache[vid]
        if self.opt_params.random_background:
            background = jnp.asarray(self.rng.random(3), jnp.float32)
        else:
            background = jnp.zeros(3, jnp.float32)
        reg = (
            self.strategy.regularization_loss_weights()
            if self.strategy is not None
            else (0.0, 0.0)
        )
        return {
            "step": step,
            "camera": camera,
            "image": image if isinstance(image, jnp.ndarray) else jnp.asarray(image),
            "ti": ti,
            "vid": vid,
            "background": background,
            "sh_degree": self.sh_degree,
            "reg": reg,
            "extras": self._extras_for(camera, vid),
        }

    def _dispatch_step(self, inp):
        """Dispatch one jitted step from an inputs dict; returns packed
        metrics (device array). Also runs the strategy hook."""
        from .strategy import MCMCStrategy

        # MCMC position noise runs INSIDE the jitted step, keyed by
        # (seed, step) — same derivation as the scan-chunked path, so
        # stepwise == chunked bitwise and rollback replays are
        # deterministic (a host-side key split would re-draw on replay).
        is_mcmc = isinstance(self.strategy, MCMCStrategy)
        mcmc_noise = None
        if is_mcmc:
            st = self.strategy
            mcmc_noise = (st.noise_lr, st.max_scale, st.seed)
        self.state, metrics = train_step(
            self.state,
            inp["camera"],
            inp["image"],
            inp["background"],
            inp["sh_degree"],
            jnp.int32(inp["ti"]),
            inp["extras"],
            config=self.config_for(inp["camera"]),
            opt_params=self.opt_params,
            camera_extent=self.camera_extent,
            reg_weights=inp["reg"],
            features=self.features,
            sky=self.sky,
            mcmc_noise=mcmc_noise,
        )
        if self.strategy is not None:
            self.state = self.strategy.post_train_step(
                self.state, self, inp["step"] + 1, noise_in_step=is_mcmc
            )
        return metrics["packed"]

    def train_step(self):
        """One step: SH ramp, view pick, jitted update, strategy hook."""
        if self._replay_state is None:
            self._replay_state = self.state
        inp = self._step_inputs()
        packed = self._dispatch_step(inp)
        self._replay.append((inp["step"], inp, packed))
        if (inp["step"] + 1) % self.metrics_every == 0 or self._last_metrics is None:
            self._drain_metrics()
        return self._last_metrics

    def _unpack_row(self, row):
        return {
            "loss": float(row[0]),
            "l1": float(row[1]),
            "ssim": float(row[2]),
            "n_instances": int(row[3]),
            "overflow": row[4] > 0.5,
            "terms": dict(zip(LOSS_TERMS, (float(x) for x in row[5:]))),
            "p_instances": int(row[13]) if len(row) > 13 else int(row[3]),
        }

    @staticmethod
    def _fit_budget(demand: int) -> int:
        """Snap demand + 12.5% headroom UP to a ~1.09x geometric grid of
        budgets (8 steps per octave, 1024-aligned). The exact chunk-aligned
        demand is known (packed metric col 13), so the budget can be fitted
        rather than doubled; the geometric grid keeps the set of distinct
        compiled configs small as demand drifts during densification, and
        binning/gather/blend costs all scale with the budget, so headroom
        is priced in milliseconds."""
        target = demand * 9 // 8
        b = 1 << 16
        while b < target:
            b = -(-(b * 35) // (32 * 1024)) * 1024
        return b

    def _grow_budget(self, near_step: int, demand: int = 0):
        """Grow the instance budget to fit the observed chunk-aligned demand
        in ONE recompile — but at least 1.5x, so a stale demand reading
        still converges. Replaces the reference's grow-only binning buffers
        (rasterizer.jl:340-343)."""
        # Snap BOTH arms to the geometric grid: the old bare `*3//2` arm
        # produced budgets that depended on the exact growth history, so a
        # crash-resumed run compiled fresh programs at near-miss budgets
        # instead of hitting the persistent compile cache. (demand is exact
        # even under truncation — tiles.py's histogram sees full demand —
        # so grid-snapped fits are reproducible across resumes.)
        target = self._fit_budget(max(demand, self.max_instances * 4 // 3))
        self.max_instances = target
        self._configs.clear()
        self._low_util_drains = 0
        print(
            f"[trainer] instance budget overflow near step {near_step}; "
            f"growing max_instances to {self.max_instances}",
            flush=True,
        )

    _low_util_drains = 0
    MIN_INSTANCE_BUDGET = 1 << 16

    def _consider_shrink(self, demand: int):
        """Refit the budget downward when the chunk-aligned demand leaves
        >2x headroom for several consecutive metric fetches. Unlike the
        reference's grow-only buffers, binning costs here scale with the
        static budget, so oversizing is waste. The refit target keeps 25%
        headroom, so a shrink never immediately re-overflows."""
        if self.max_instances <= self.MIN_INSTANCE_BUDGET:
            return
        if demand * 2 <= self.max_instances:
            self._low_util_drains += 1
        else:
            self._low_util_drains = 0
        if self._low_util_drains >= 5:
            self.max_instances = max(
                self.MIN_INSTANCE_BUDGET, self._fit_budget(demand)
            )
            self._configs.clear()
            self._low_util_drains = 0
            print(
                f"[trainer] instance budget under-utilized; shrinking "
                f"max_instances to {self.max_instances}",
                flush=True,
            )

    def _drain_metrics(self):
        """Fetch every pending step's packed metrics (ONE host sync per
        batch). If any pending render overflowed the instance budget, the
        affected steps' updates are DISCARDED: roll back to the pre-dispatch
        state, grow the budget, and replay the same step inputs untruncated."""
        if not self._replay:
            return self._last_metrics
        while True:
            rows = [np.asarray(p) for (_, _, p) in self._replay]
            if not any(r[4] > 0.5 for r in rows):
                break
            self._grow_budget(
                self._replay[0][0], demand=max(int(r[13]) for r in rows)
            )
            self.state = self._replay_state
            old = self._replay
            self._replay = []
            for (s, inp, _) in old:
                self._replay.append((s, inp, self._dispatch_step(inp)))
        m = None
        for (s, inp, _), row in zip(self._replay, rows):
            m = self._unpack_row(row)
            terms = dict(m["terms"])
            terms["total"] = m["loss"]
            self.losses.record(s + 1, terms)
            if not np.isfinite(m["loss"]):
                msg = (
                    f"Loss is not finite ({m['loss']}) at step {s + 1} — "
                    "aborting before the parameters are corrupted further."
                )
                from ..utils.debug import debug_enabled

                if debug_enabled():
                    msg += ("\n(set GST_DEBUG=0 to skip forensics)\n"
                            + self._forensics_stepwise(s, inp))
                raise FloatingPointError(msg)
        self._replay = []
        self._replay_state = None
        self._last_metrics = m
        self._consider_shrink(max(int(r[13]) for r in rows))
        return m

    # -- chunked (scan) training ------------------------------------------

    def _can_chunk(self) -> bool:
        """lax.scan chunking applies when no per-step host intervention is
        required: per-step work (ADC stats, MCMC noise) runs inside the
        jitted step; refine/reset run at chunk boundaries."""
        from .strategy import DefaultStrategy, MCMCStrategy

        if self.strategy is not None and not isinstance(
            self.strategy, (DefaultStrategy, MCMCStrategy)
        ):
            return False
        res = {(c.width, c.height) for c in self.dataset.cameras}
        return len(res) == 1

    def _next_boundary(self, step: int) -> int:
        """Next step index where the host must intervene."""
        from .strategy import DefaultStrategy

        from .strategy import MCMCStrategy

        bounds = []
        if isinstance(self.strategy, DefaultStrategy):
            st = self.strategy
            if step <= st.densify_until_iter:
                bounds.append(st.densification_interval)
            bounds.append(st.opacity_reset_interval)
        elif isinstance(self.strategy, MCMCStrategy):
            st = self.strategy
            if step < st.stop_refine:
                bounds.append(st.refine_every)
        nxt = step + self.chunk_steps
        for b in bounds:
            nxt = min(nxt, (step // b + 1) * b)
        return nxt

    def _build_chunk_inputs(self, k: int, step: int):
        """Assemble k steps' worth of batched dispatch inputs (host-side;
        advances the epoch shuffle and SH ramp). `step` is the host-tracked
        step counter — reading self.step here would sync on the in-flight
        chunk and stall the pipeline."""
        cams, targets, tis, extras = [], [], [], []
        sh_degrees, vids = [], []
        for j in range(k):
            if (step + j) > 0 and (step + j) % self.sh_ramp_every == 0:
                self.sh_degree = min(self.sh_degree + 1, self.state.model.max_sh_degree)
            camera, image, ti, vid = self._next_view()
            vids.append(vid)
            if self._targets_row(vid) is None:
                if self._image_cache is not None:
                    if vid not in self._image_cache:
                        self._image_cache[vid] = jnp.asarray(image)
                    image = self._image_cache[vid]
                targets.append(
                    image if isinstance(image, jnp.ndarray) else jnp.asarray(image)
                )
            cams.append(camera)
            tis.append(ti)
            extras.append(self._extras_for(camera, vid))
            sh_degrees.append(self.sh_degree)

        from ..parallel.data_parallel import batch_cameras

        if self.opt_params.random_background:
            bgs = jnp.asarray(self.rng.random((k, 3)), jnp.float32)
        else:
            bgs = jnp.zeros((k, 3), jnp.float32)
        ex_b = (
            jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *extras)
            if extras[0]
            else {}
        )
        reg = (
            self.strategy.regularization_loss_weights()
            if self.strategy is not None
            else (0.0, 0.0)
        )
        from .strategy import MCMCStrategy

        mcmc_noise = None
        if isinstance(self.strategy, MCMCStrategy):
            st = self.strategy
            mcmc_noise = (st.noise_lr, st.max_scale, st.seed)
        if targets:  # per-chunk stacking fallback (no resident stack)
            targets_b, target_ids = jnp.stack(targets), None
        else:  # resident-stack mode: index rows of the one device array
            targets_b = self._images_stack
            target_ids = jnp.asarray(
                [self._targets_row(v) for v in vids], jnp.int32
            )
        return {
            "step": step,
            "camera0": cams[0],
            "cam_b": batch_cameras(cams),
            "targets_b": targets_b,
            "target_ids": target_ids,
            "bgs": bgs,
            "sh_degrees": jnp.asarray(sh_degrees, jnp.int32),
            "tis": jnp.asarray(tis, jnp.int32),
            "ex_b": ex_b,
            "reg": reg,
            "mcmc_noise": mcmc_noise,
        }

    # Resident target stack: ALL train images as one (V, H, W, 3) device
    # array built once — re-stacking K full-resolution targets on the host
    # every chunk costs ~5 ms/step (98 ms/chunk at 640x416, measured).
    _images_stack = None
    _images_rows = None

    def _targets_row(self, vid) -> int | None:
        if self._images_rows is None:
            if self._image_cache is None:
                self._images_rows = {}  # caching disabled -> fallback path
            else:
                res = {
                    (self.dataset.cameras[v].width, self.dataset.cameras[v].height)
                    for v in self.dataset.train_ids
                }
                if len(res) != 1:
                    self._images_rows = {}
                else:
                    self._images_rows = {
                        v: i for i, v in enumerate(self.dataset.train_ids)
                    }
                    self._images_stack = jnp.stack(
                        [
                            jnp.asarray(self.dataset.images[v])
                            for v in self.dataset.train_ids
                        ]
                    )
        return self._images_rows.get(vid)

    def _dispatch_chunk(self, inp):
        """Dispatch one scan-chunk from a chunk-inputs dict; returns the
        packed per-step metrics (device array, (K, 14))."""
        self.state, packs = train_chunk(
            self.state,
            inp["cam_b"],
            inp["targets_b"],
            inp["bgs"],
            inp["sh_degrees"],
            inp["tis"],
            inp["ex_b"],
            target_ids=inp["target_ids"],
            config=self.config_for(inp["camera0"]),
            opt_params=self.opt_params,
            camera_extent=self.camera_extent,
            reg_weights=inp["reg"],
            features=self.features,
            sky=self.sky,
            mcmc_noise=inp["mcmc_noise"],
        )
        return packs

    def _record_chunk(self, at_step: int, packed, *, snapshot=None, inputs=None):
        """Record an untruncated chunk's per-step metrics; abort on the
        FIRST non-finite loss (every row is checked, not only the last).
        `snapshot`/`inputs` (the pre-chunk state and the chunk's dispatch
        inputs) let the forensics replay the EXACT failing step."""
        m = None
        for j, row in enumerate(packed):
            m = self._unpack_row(row)
            terms = dict(m["terms"])
            terms["total"] = m["loss"]
            self.losses.record(at_step + j + 1, terms)
            if not np.isfinite(m["loss"]):
                msg = (
                    f"Loss is not finite ({m['loss']}) at step {at_step + j + 1} — "
                    "aborting before the parameters are corrupted further."
                )
                from ..utils.debug import debug_enabled

                if debug_enabled():
                    msg += ("\n(set GST_DEBUG=0 to skip forensics)\n"
                            + self._forensics_chunk(snapshot, inputs, j))
                raise FloatingPointError(msg)
        self._last_metrics = m
        self._consider_shrink(int(np.max(packed[:, 13])))
        return m

    def train(self, n_steps: int, log_every: int = 0):
        import time as _time

        t0 = _time.perf_counter()
        try:
            return self._train(n_steps, log_every)
        finally:
            self.train_time += _time.perf_counter() - t0
            self.train_steps_timed += n_steps

    def profile(self, n_steps: int, trace_dir: str):
        """Train `n_steps` under the JAX/XLA profiler. Writes a TensorBoard/
        Perfetto trace (device timelines, HLO op breakdown, host<->device
        transfers) to `trace_dir` — the deep-dive companion to the
        wall-clock stage timings in benchmark/stages.py."""
        import jax.profiler as _p

        _p.start_trace(trace_dir)
        try:
            with _p.TraceAnnotation("gsplat_train"):
                out = self.train(n_steps)
            # The pipelined chunk loop returns with work in flight; fetch a
            # leaf so the trace covers the full device timeline.
            np.asarray(self.state.model.points.ravel()[0])
            return out
        finally:
            _p.stop_trace()

    def _needs_host_barrier(self, nxt: int) -> bool:
        """True when the chunk ending at `nxt` must be retired (metrics
        fetched, strategy applied) BEFORE the next chunk may be dispatched —
        i.e. when post_train_step at `nxt` is not the identity, or an
        autosave lands there. Everywhere else the next chunk can be
        dispatched speculatively and overlap the pending fetch."""
        from .strategy import DefaultStrategy, MCMCStrategy

        if self.autosave_every and nxt % self.autosave_every == 0:
            return True
        st = self.strategy
        if isinstance(st, DefaultStrategy):
            return nxt <= st.densify_until_iter and (
                nxt % st.densification_interval == 0
                or nxt % st.opacity_reset_interval == 0
            )
        if isinstance(st, MCMCStrategy):
            return (
                st.start_refine < nxt < st.stop_refine
                and nxt % st.refine_every == 0
            )
        return False

    def _retire_chunk(self, chunk, successors, log_every: int):
        """Fetch a dispatched chunk's metrics and finalize it. On overflow,
        discard the chunk AND every in-flight successor (their dispatch
        state descended from the truncated result), grow the budget, and
        replay all of them in order from the pre-chunk snapshot."""
        packs = chunk["packs"]
        while True:
            packed = np.asarray(packs)
            if packed.ndim == 1:
                packed = packed[None]
            if not (packed[:, 4] > 0.5).any():
                break
            # A truncated render anywhere in the chunk biased its Adam
            # updates: discard the whole chunk, grow, and re-run the same
            # views from the pre-chunk state.
            self._grow_budget(chunk["step"], demand=int(np.max(packed[:, 13])))
            self.state = chunk["snapshot"]
            packs = chunk["packs"] = self._dispatch_chunk(chunk["inputs"])
            for s in successors:
                s["snapshot"] = self.state
                s["packs"] = self._dispatch_chunk(s["inputs"])
        m = self._record_chunk(
            chunk["step"], packed,
            snapshot=chunk["snapshot"], inputs=chunk["inputs"],
        )
        if self.strategy is not None:
            from .strategy import MCMCStrategy

            # Between host barriers post_train_step is the identity, so
            # applying it to a state that already includes a speculatively
            # dispatched successor chunk is sound; at barriers `successors`
            # is empty and self.state is exactly this chunk's result.
            self.state = self.strategy.post_train_step(
                self.state, self, chunk["nxt"],
                noise_in_step=isinstance(self.strategy, MCMCStrategy),
            )
        if log_every and chunk["nxt"] % log_every == 0:
            self._log_line(m, step=chunk["nxt"])
        if self.autosave_every and chunk["nxt"] % self.autosave_every == 0:
            self._maybe_autosave()
        return m

    def _train(self, n_steps: int, log_every: int = 0):
        if not self._can_chunk():
            return self._train_stepwise(n_steps, log_every)
        hstep = self.step  # ONE device sync at entry; host-tracked after
        end = hstep + n_steps
        pending = None
        while hstep < end or pending is not None:
            if pending is not None and (
                hstep >= end or self._needs_host_barrier(pending["nxt"])
            ):
                self._retire_chunk(pending, [], log_every)
                pending = None
                continue
            # Dispatch the next chunk first — the device chews on it while
            # the host fetches/retires the pending one (pipelined; keeps the
            # remote TPU busy through the per-chunk host round-trip).
            nxt = min(self._next_boundary(hstep), end)
            if log_every:
                nxt = min(nxt, (hstep // log_every + 1) * log_every)
            cur = {
                "step": hstep,
                "nxt": nxt,
                "snapshot": self.state,  # pre-chunk state (pytrees immutable)
                "inputs": self._build_chunk_inputs(nxt - hstep, hstep),
            }
            cur["packs"] = self._dispatch_chunk(cur["inputs"])
            if pending is not None:
                self._retire_chunk(pending, [cur], log_every)
            pending = cur
            hstep = nxt
        return self.state

    def _train_stepwise(self, n_steps: int, log_every: int = 0):
        for i in range(n_steps):
            m = self.train_step()
            if log_every and (self.step % log_every == 0 or i == n_steps - 1):
                m = self._drain_metrics() or m
                self._log_line(m)
            self._maybe_autosave()
        self._drain_metrics()
        return self.state

    def _forensics_stepwise(self, s: int, inp: dict) -> str:
        """Deterministic forensics for the stepwise path: rebuild the exact
        pre-failing-step state by re-dispatching the recorded prefix from the
        pre-batch snapshot, then replay the failing step's own view."""
        try:
            if self._replay_state is not None:
                self.state = self._replay_state
                for (s2, inp2, _) in self._replay:
                    if s2 >= s:
                        break
                    self._dispatch_step(inp2)
        except Exception:
            pass  # fall through with whatever state we have
        return self._forensics(
            camera=inp["camera"], image=inp["image"], sh_degree=inp["sh_degree"]
        )

    def _forensics_chunk(self, snapshot, inputs, j: int) -> str:
        """Deterministic forensics for the chunked path: re-run the first j
        steps of the failing chunk from the pre-chunk snapshot (sub-chunk
        recompile is fine — this is an abort path), then replay step j's
        view from the chunk's own batched inputs."""
        if snapshot is None or inputs is None:
            return self._forensics()
        try:
            self.state = snapshot
            if j > 0:
                self._dispatch_chunk(self._slice_chunk_inputs(inputs, j))
            camera = jax.tree_util.tree_map(lambda x: x[j], inputs["cam_b"])
            if inputs["target_ids"] is not None:
                image = inputs["targets_b"][int(inputs["target_ids"][j])]
            else:
                image = inputs["targets_b"][j]
            return self._forensics(
                camera=camera, image=image, sh_degree=int(inputs["sh_degrees"][j])
            )
        except Exception as e:
            return f"(forensics replay failed: {e})"

    @staticmethod
    def _slice_chunk_inputs(inp: dict, j: int) -> dict:
        """A chunk-inputs dict restricted to its first j steps."""
        out = dict(inp)
        out["cam_b"] = jax.tree_util.tree_map(lambda x: x[:j], inp["cam_b"])
        for k in ("bgs", "sh_degrees", "tis"):
            out[k] = inp[k][:j]
        if inp["ex_b"]:
            out["ex_b"] = jax.tree_util.tree_map(lambda x: x[:j], inp["ex_b"])
        if inp["target_ids"] is not None:
            out["target_ids"] = inp["target_ids"][:j]
        else:
            out["targets_b"] = inp["targets_b"][:j]
        return out

    def _forensics(self, camera=None, image=None, sh_degree=None, state=None) -> str:
        """Re-run a step's gradients eagerly and report the offending rows
        (reference nonfinite_gradient_report, training.jl:534-573).

        Callers pass the EXACT failing step's (camera, image, sh_degree) and
        the reconstructed pre-failing-step state so the report is
        deterministic — without them it falls back to the next epoch view,
        which may not reproduce the non-finite value at all."""
        from ..utils.debug import nonfinite_gradient_report

        try:
            if camera is None:
                camera, image, _ti, _vid = self._next_view()
            if sh_degree is None:
                sh_degree = self.sh_degree
            model = (state or self.state).model
            cfg = self.config_for(camera)
            params = model.params()

            def loss_fn(params):
                m = model.replace_params(params)
                img, _ = render(
                    *m.render_args(), camera=camera, config=cfg,
                    sh_degree=sh_degree,
                )
                return photometric_loss(img[..., :3], jnp.asarray(image))[0]

            grads = jax.grad(loss_fn)(params)
            return nonfinite_gradient_report(grads, model)
        except Exception as e:  # forensics must never mask the original error
            return f"(forensics failed: {e})"

    @classmethod
    def from_checkpoint(cls, path: str, dataset, *, capacity: int | None = None, **kw):
        """Resume a Trainer from a checkpoint: exact model/Adam/step state,
        with the schedule-derived host state (SH ramp position) restored —
        a fresh Trainer would restart sh_degree at 0 and re-ramp."""
        from ..io.checkpoint import load_checkpoint

        state, _cam, _meta = load_checkpoint(path, capacity=capacity)
        trainer = cls(state.model, dataset, **kw)
        trainer.state = state
        step = int(state.step)
        trainer.sh_degree = min(
            step // trainer.sh_ramp_every, state.model.max_sh_degree
        )
        return trainer

    def _maybe_autosave(self):
        """Periodic checkpoint with step-suffixed filename; self-disables on
        failure (reference gui/worker.jl:323-357)."""
        if (
            not self.autosave_every
            or self._autosave_failed
            or self.autosave_path is None
            or self.step == 0
            or self.step % self.autosave_every != 0
        ):
            return
        import os

        from ..io.checkpoint import save_checkpoint

        base, ext = os.path.splitext(self.autosave_path)
        path = f"{base}-{self.step:06d}{ext or '.safetensors'}"
        try:
            save_checkpoint(path, self.state)
            print(f"[trainer] autosave -> {path}", flush=True)
        except Exception as e:
            self._autosave_failed = True
            print(f"[trainer] autosave failed ({e}); autosave disabled", flush=True)

    @property
    def ms_per_step(self) -> float:
        return 1000.0 * self.train_time / max(self.train_steps_timed, 1)

    def _log_line(self, m, step: int | None = None):
        # `step` is the host-tracked step of the retired chunk; reading
        # self.step mid-pipeline would sync on (and report) the in-flight
        # successor chunk's state instead.
        if step is None:
            step = self.step
        loss = float(m["loss"])
        self.history.append((step, loss))
        print(
            f"step {step}: loss={loss:.5f} l1={float(m['l1']):.5f} "
            f"ssim={float(m['ssim']):.4f} "
            f"alive={int(self.state.model.n_alive)}",
            flush=True,
        )

    def validate(self, quantize: bool = True) -> dict:
        """Mean SSIM/MSE/PSNR over test views, per-view-then-mean
        (the reference reduction, training.jl:487-532)."""
        if not self.dataset.test_ids:
            return {}
        acc = {"ssim": 0.0, "mse": 0.0, "psnr": 0.0}
        overflow = False
        p_inst = 0
        sky_dc = self.state.aux.get("sky_dc") if self.sky is not None else None
        import dataclasses

        grown_budget = None  # eval-local budget growth; train budget untouched
        for vid in self.dataset.test_ids:
            cam = self.dataset.cameras[vid]
            cfg = self.config_for(cam)
            if grown_budget is not None and grown_budget > cfg.max_instances:
                cfg = dataclasses.replace(cfg, max_instances=grown_budget)
            for _retry in range(4):
                out = eval_view(
                    self.state.model,
                    cam,
                    jnp.asarray(self.dataset.images[vid]),
                    self.sh_degree,
                    config=cfg,
                    quantize=quantize,
                    sky=self.sky,
                    sky_dc=sky_dc,
                )
                if not bool(out["overflow"]):
                    break
                # A truncated render silently deflates the metrics — retry
                # this view with an eval-only grown budget (kept for the
                # remaining views; one recompile per distinct budget).
                # Same grid-snapped spelling as _grow_budget: a bare *3//2
                # arm would produce history-dependent budgets that miss the
                # persistent compile cache on resume.
                demand = int(out["p_instances"])
                target = self._fit_budget(max(demand, cfg.max_instances * 4 // 3))
                print(
                    f"[trainer] validate: instance budget overflow (demand "
                    f"{demand} > {cfg.max_instances}); retrying the view at "
                    f"{target}",
                    flush=True,
                )
                cfg = dataclasses.replace(cfg, max_instances=target)
                grown_budget = target
            for k in acc:
                acc[k] += float(out[k])
            overflow = overflow or bool(out["overflow"])
            p_inst = max(p_inst, int(out["p_instances"]))
        n = len(self.dataset.test_ids)
        res = {k: v / n for k, v in acc.items()}
        res["overflow"] = overflow
        res["p_instances"] = p_inst
        if overflow:
            print(
                f"[trainer] validate: instance budget overflow persisted "
                f"(demand {p_inst}); metrics include TRUNCATED renders.",
                flush=True,
            )
        return res
