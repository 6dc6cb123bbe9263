"""Density-control strategies: ADC (original 3DGS) and MCMC.

TPU-native redesign of the reference strategies
(reference: src/strategy.jl, src/densification.jl, src/mcmc.jl). The
reference reallocates every parameter & Adam-moment array on each refine;
here the model is a static-capacity pytree with an alive mask, so:

  - clone/split/relocate = gather rows -> scatter into free (dead) slots;
  - prune = clear alive bits (rows stop rendering via the opacity mask);
  - Adam surgery = zeroing moment rows in place (optim.zero_moment_rows);
  - capacity growth = host-side re-pad to the next bucket (one re-jit per
    bucket, at the 100-step refine cadence only).

Index bookkeeping (which slots are dead, multinomial sampling) runs host-side
at refine cadence — the same host round-trip the reference makes
(mcmc.jl:135-146 pulls opacities to the host every refine).

Hyperparameters are copied from the reference verbatim (strategy.jl:42-49,
mcmc.jl:60-72).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussians import DEAD_OPACITY, GaussianModel, inverse_sigmoid, reset_opacity
from ..ops.projection import quat_to_rotmat
from .optim import lr_exp_scheduler, zero_moment_rows

CAPACITY_BUCKET = 4096


def _bucket(n: int) -> int:
    return max(-(-n // CAPACITY_BUCKET) * CAPACITY_BUCKET, CAPACITY_BUCKET)


def grow_state(state, new_capacity: int):
    """Re-pad a TrainState to a larger capacity (host-side)."""
    pad = new_capacity - state.model.capacity
    if pad <= 0:
        return state

    def padrow(x, fill=0.0):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    from .optim import MODEL_PARAM_NAMES

    def pad_moments(d):
        return {k: (padrow(v) if k in MODEL_PARAM_NAMES else v) for k, v in d.items()}

    opt = {
        "mu": pad_moments(state.opt["mu"]),
        "nu": pad_moments(state.opt["nu"]),
        "step": state.opt["step"],
    }
    return state.replace(
        model=state.model.with_capacity(new_capacity),
        opt=opt,
        max_radii=padrow(state.max_radii),
        grad_accum=padrow(state.grad_accum),
        stat_denom=padrow(state.stat_denom),
    )


def _scatter_params(params: dict, src_idx, dst_idx, overrides: dict | None = None) -> dict:
    """params[dst] = params[src] with optional per-key overrides."""
    out = {}
    for k, v in params.items():
        newv = overrides[k] if overrides and k in overrides else v[src_idx]
        out[k] = v.at[dst_idx].set(newv)
    return out


# ---------------------------------------------------------------------------
# ADC — original 3DGS adaptive density control (strategy.jl / densification.jl)
# ---------------------------------------------------------------------------


@dataclass
class DefaultStrategy:
    dense_percent: float = 0.01
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densification_interval: int = 100
    densify_grad_threshold: float = 2e-4
    opacity_reset_interval: int = 3_000
    min_opacity: float = 0.005
    # Post-reset size-prune screen threshold in PIXELS (densification.jl:
    # 19-24 hardcodes 20; 0 disables the whole size prune — both screen and
    # world-scale arms, matching max_screen_size=0 semantics there).
    # DOCUMENTED DEVIATION KNOB: screen radii scale with render resolution,
    # so the fixed 20 px rule prunes ever-larger fractions of a healthy
    # model as resolution grows (85% per pass on the 1248x832 atrium_hd,
    # RESULTS.md); scenes whose content is representable by large splats
    # may need a higher threshold or 0. The default stays reference-exact.
    max_screen_size: int = 20
    seed: int = 0
    _rng: np.random.Generator = field(default=None, repr=False)

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)

    def regularization_loss_weights(self):
        return (0.0, 0.0)

    def post_train_step(self, state, trainer, step: int, noise_in_step: bool = False):
        if step > self.densify_until_iter:
            return state
        # Stats already accumulated inside train_step (trainer.py).
        if step >= self.densify_from_iter and step % self.densification_interval == 0:
            max_screen_size = (
                self.max_screen_size if step > self.opacity_reset_interval else 0
            )
            state = self.densify_and_prune(
                state,
                extent=trainer.camera_extent,
                max_screen_size=max_screen_size,
            )
        if step % self.opacity_reset_interval == 0:
            # reset_opacity! + NU.reset!(optimizers.opacities) — only the
            # opacity moments are cleared (strategy.jl:100-103).
            opt = dict(state.opt)
            opt["mu"] = dict(opt["mu"]) | {"opacities": jnp.zeros_like(opt["mu"]["opacities"])}
            opt["nu"] = dict(opt["nu"]) | {"opacities": jnp.zeros_like(opt["nu"]["opacities"])}
            state = state.replace(model=reset_opacity(state.model), opt=opt)
        return state

    def densify_and_prune(self, state, *, extent: float, max_screen_size: int):
        """Clone + split + prune (densification.jl:1-27)."""
        model = state.model
        alive = np.asarray(model.alive)
        denom = np.asarray(state.stat_denom)
        grads = np.asarray(state.grad_accum) / np.maximum(denom, 1.0)
        grads = np.where(denom > 0, grads, 0.0)
        scales_max = np.exp(np.asarray(model.scales)).max(axis=1)
        opac = 1.0 / (1.0 + np.exp(-np.asarray(model.opacities)))

        gamma = self.dense_percent * extent
        clone_mask = alive & (grads > self.densify_grad_threshold) & (scales_max < gamma)
        split_mask = alive & (grads >= self.densify_grad_threshold) & (scales_max > gamma)

        prune_mask = alive & (opac <= self.min_opacity)
        if max_screen_size > 0:
            prune_mask |= alive & (
                (np.asarray(state.max_radii) >= max_screen_size)
                | (scales_max >= 0.1 * extent)
            )
        # Split originals are replaced by their two children.
        kill = prune_mask | split_mask

        clone_src = np.flatnonzero(clone_mask)
        split_src = np.flatnonzero(split_mask)
        n_new = len(clone_src) + 2 * len(split_src)

        alive_after = alive & ~kill
        free = np.flatnonzero(~alive_after)
        if n_new > len(free):
            need = int(alive_after.sum()) + n_new
            state = grow_state(state, _bucket(max(need, int(1.3 * model.capacity))))
            model = state.model
            kill = _pad_mask(kill, model.capacity)
            alive_after = np.asarray(model.alive) & ~kill
            free = np.flatnonzero(~alive_after)

        src = np.concatenate([clone_src, split_src, split_src]).astype(np.int32)
        dst = free[:n_new].astype(np.int32)

        new_alive = jnp.asarray(alive_after)
        if n_new > 0:
            new_alive = new_alive.at[jnp.asarray(dst)].set(True)
            src_j = jnp.asarray(src)
            dst_j = jnp.asarray(dst)
            params = model.params()
            # Split children: scale /1.6 (log(sigma/(0.8*2))) + rotated N(0, sigma)
            # position jitter (densification.jl:64-136). Clones copy verbatim.
            n_split2 = 2 * len(split_src)
            sigma = jnp.exp(params["scales"][src_j])  # (n_new, s)
            is_split = jnp.asarray(
                np.concatenate([np.zeros(len(clone_src)), np.ones(n_split2)]) > 0
            )
            noise = jnp.asarray(
                self._rng.normal(size=(max(n_new, 1), 3)).astype(np.float32)
            )[:n_new]
            sig3 = jnp.broadcast_to(sigma, (n_new, 3)) if sigma.shape[1] == 1 else sigma
            R = jax.vmap(quat_to_rotmat)(params["rotations"][src_j])
            jitter = jnp.einsum("nij,nj->ni", R, sig3 * noise)
            new_points = params["points"][src_j] + jnp.where(
                is_split[:, None], jitter, 0.0
            )
            new_scales = jnp.where(
                is_split[:, None],
                jnp.log(jnp.maximum(sigma / 1.6, 1e-12)),
                params["scales"][src_j],
            )
            params = _scatter_params(
                params, src_j, dst_j, {"points": new_points, "scales": new_scales}
            )
            model = model.replace_params(params)

        model = model.replace(alive=new_alive)
        # Dead rows: force-dead opacity so pruned slots stop rendering even
        # if later optimizer math touches them (masked_opacities also guards).
        model = model.replace(
            opacities=jnp.where(new_alive, model.opacities, DEAD_OPACITY)
        )

        # Zero moments of every re-written or killed row; fresh rows start clean
        # (append semantics, densification.jl:261-287).
        touched = np.zeros(model.capacity, bool)
        touched[dst] = True
        touched[np.flatnonzero(kill)] = True
        opt = zero_moment_rows(state.opt, jnp.asarray(touched))

        state = state.replace(model=model, opt=opt)
        # Stats reset after every refine (densification.jl:202-214).
        return state.reset_stats()


def _pad_mask(mask: np.ndarray, capacity: int) -> np.ndarray:
    out = np.zeros(capacity, bool)
    out[: len(mask)] = mask
    return out


# ---------------------------------------------------------------------------
# MCMC — "3D Gaussian Splatting as MCMC" (mcmc.jl)
# ---------------------------------------------------------------------------


def mcmc_binom_coefficients(n_max: int = 51) -> np.ndarray:
    """binoms[n, k] = C(n-1, k)*(-1)^k/sqrt(k+1) (mcmc.jl:79-90)."""
    binoms = np.zeros((n_max, n_max), np.float32)
    for n in range(n_max):
        b = 1.0
        for k in range(n + 1):
            sign = 1.0 if k % 2 == 0 else -1.0
            binoms[n, k] = b * sign / np.sqrt(k + 1.0)
            if k < n:
                b *= (n - k) / (k + 1.0)
    return binoms


def relocation_params(binoms, o, ratio, min_opacity=0.005):
    """Eq. 9: new opacity of each of `ratio` copies + scale multiplier
    (mcmc.jl:266-280). Vectorized over samples; o (n,), ratio (n,) int."""
    o = np.clip(o, 1e-6, 1.0 - 1e-6)
    ratio = np.clip(ratio, 1, binoms.shape[0] - 1)
    new_o = np.clip(1.0 - (1.0 - o) ** (1.0 / ratio), max(1e-6, min_opacity), 1.0 - 1e-6)

    # denom = sum_{i=0..ratio-1} sum_{k=0..i} binoms[i, k] * new_o^(k+1)
    #       = sum_k new_o^(k+1) * W[ratio-1, k], W[r, k] = sum_{i<=r} binoms[i, k]
    # (binoms[i, k] = 0 for k > i, so the cumsum over i self-masks).
    n_max = binoms.shape[0]
    W = np.cumsum(binoms, axis=0)
    Wk = W[ratio - 1]  # (n, n_max)
    ks = np.arange(n_max)
    powers = new_o[:, None] ** (ks[None, :] + 1)
    mask = ks[None, :] < ratio[:, None]
    denom = np.sum(np.where(mask, Wk * powers, 0.0), axis=1)
    denom = np.copysign(np.maximum(np.abs(denom), 1e-8), denom)
    coeff = np.clip(o / denom, -1e6, 1e6)
    return new_o.astype(np.float32), coeff.astype(np.float32)


@partial(jax.jit, static_argnames=("noise_lr", "max_kick"))
def _inject_noise(points, opacities, scales, rotations, alive, key, lr, *, noise_lr, max_kick):
    """Position noise ∝ Σ·ξ gated by a steep opacity sigmoid
    (mcmc.jl:306-325); per-kick norm cap."""
    n = points.shape[0]
    xi = jax.random.normal(key, (n, 3), jnp.float32)
    R = jax.vmap(quat_to_rotmat)(rotations)
    s2 = jnp.minimum(jnp.exp(2.0 * scales), 1e8)
    s2 = jnp.broadcast_to(s2, (n, 3)) if s2.shape[1] == 1 else s2
    sig_xi = jnp.einsum("nij,nj->ni", R, s2 * jnp.einsum("nji,nj->ni", R, xi))
    op = jax.nn.sigmoid(opacities)
    factor = (lr * noise_lr) / (1.0 + jnp.exp(jnp.minimum(100.0 * op - 0.5, 80.0)))
    delta = factor[:, None] * sig_xi
    l = jnp.linalg.norm(delta, axis=1, keepdims=True)
    delta = jnp.where(l > max_kick, delta * (max_kick / jnp.maximum(l, 1e-20)), delta)
    return jnp.where(alive[:, None], points + delta, points)


@dataclass
class MCMCStrategy:
    max_cap: int = 2_000_000
    min_opacity: float = 0.005
    max_scale: float = 0.1  # relative to scene extent
    start_refine: int = 500
    stop_refine: int = 25_000
    refine_every: int = 100
    grow_factor: float = 1.05
    noise_lr: float = 5e5
    opacity_reg: float = 0.01
    scale_reg: float = 0.01
    n_max: int = 51
    seed: int = 0
    _rng: np.random.Generator = field(default=None, repr=False)
    _binoms: np.ndarray = field(default=None, repr=False)
    _key: jax.Array = field(default=None, repr=False)

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)
        self._binoms = mcmc_binom_coefficients(self.n_max)
        self._key = jax.random.PRNGKey(self.seed)

    def regularization_loss_weights(self):
        """0.01*mean(sigmoid(op)) + 0.01*mean(exp(scales)) (mcmc.jl:104-107)."""
        return (self.opacity_reg, self.scale_reg)

    def post_train_step(self, state, trainer, step: int, noise_in_step: bool = False):
        extent = trainer.camera_extent
        if (
            self.start_refine < step < self.stop_refine
            and step % self.refine_every == 0
        ):
            state = self.relocate(state, extent)
            state = self.add(state)
        if noise_in_step:
            # The jitted train step already injected this step's noise
            # (trainer.py scan-chunked path).
            return state
        # Noise every step, scaled by the current (decayed) points LR x extent.
        p = trainer.opt_params
        lr = float(
            lr_exp_scheduler(step, p.lr_points_start, p.lr_points_end, p.lr_points_steps)
        ) * extent
        self._key, sub = jax.random.split(self._key)
        m = state.model
        new_points = _inject_noise(
            m.points, m.opacities, m.scales, m.rotations, m.alive, sub, lr,
            noise_lr=self.noise_lr,
            max_kick=0.5 * self.max_scale * extent,
        )
        return state.replace(model=m.replace(points=new_points))

    def _dead_alive(self, model, extent):
        alive = np.asarray(model.alive)
        o = 1.0 / (1.0 + np.exp(-np.asarray(model.opacities)))
        s_max = np.asarray(model.scales).max(axis=1)
        is_dead = alive & ((o <= self.min_opacity) | (s_max > np.log(self.max_scale * extent)))
        return alive, o, is_dead

    def _split_sampled(self, state, o, src, counts):
        """Eq. 9 opacity/scale correction scattered onto `src` rows
        (mcmc.jl:232-260). Returns updated state."""
        model = state.model
        ratio = counts[src] + 1
        new_o, coeff = relocation_params(self._binoms, o[src], ratio, self.min_opacity)
        src_j = jnp.asarray(src.astype(np.int32))
        raw_o = jnp.asarray(np.log(new_o / (1.0 - new_o)))
        s_old = jnp.exp(model.scales[src_j])
        new_s = jnp.log(jnp.maximum(jnp.abs(jnp.asarray(coeff)[:, None] * s_old), 1e-10))
        model = model.replace(
            opacities=model.opacities.at[src_j].set(raw_o),
            scales=model.scales.at[src_j].set(new_s),
        )
        return state.replace(model=model)

    def relocate(self, state, extent: float):
        """Move dead Gaussians onto alive ones sampled ∝ opacity
        (mcmc.jl:132-178)."""
        model = state.model
        alive, o, is_dead = self._dead_alive(model, extent)
        dead = np.flatnonzero(is_dead)
        alive_ids = np.flatnonzero(alive & ~is_dead)
        if len(dead) == 0 or len(alive_ids) == 0:
            return state

        w = o[alive_ids]
        if w.sum() <= 0:
            return state
        sampled = alive_ids[
            self._rng.choice(len(alive_ids), size=len(dead), p=w / w.sum())
        ]
        counts = np.bincount(sampled, minlength=model.capacity)

        state = self._split_sampled(state, o, sampled, counts)
        model = state.model
        src_j = jnp.asarray(sampled.astype(np.int32))
        dst_j = jnp.asarray(dead.astype(np.int32))
        params = _scatter_params(model.params(), src_j, dst_j)
        model = model.replace_params(params)
        state = state.replace(model=model)

        touched = np.zeros(model.capacity, bool)
        touched[sampled] = True
        touched[dead] = True
        return state.replace(opt=zero_moment_rows(state.opt, jnp.asarray(touched)))

    def add(self, state):
        """Grow by grow_factor up to max_cap: sample ∝ opacity, Eq.9-split,
        copy into free slots (mcmc.jl:184-217)."""
        model = state.model
        alive = np.asarray(model.alive)
        n = int(alive.sum())
        n_new = min(self.max_cap, int(self.grow_factor * n)) - n
        if n_new <= 0:
            return state

        free = np.flatnonzero(~alive)
        if n_new > len(free):
            state = grow_state(
                state, _bucket(max(n + n_new, int(1.3 * model.capacity)))
            )
            model = state.model
            alive = np.asarray(model.alive)
            free = np.flatnonzero(~alive)

        o = 1.0 / (1.0 + np.exp(-np.asarray(model.opacities)))
        w = np.where(alive, o, 0.0)
        if w.sum() <= 0:
            return state
        sampled = self._rng.choice(model.capacity, size=n_new, p=w / w.sum())
        counts = np.bincount(sampled, minlength=model.capacity)

        state = self._split_sampled(state, o, sampled, counts)
        model = state.model
        src_j = jnp.asarray(sampled.astype(np.int32))
        dst_j = jnp.asarray(free[:n_new].astype(np.int32))
        params = _scatter_params(model.params(), src_j, dst_j)
        model = model.replace_params(params).replace(
            alive=model.alive.at[dst_j].set(True)
        )
        state = state.replace(model=model)

        touched = np.zeros(model.capacity, bool)
        touched[sampled] = True
        touched[np.asarray(free[:n_new])] = True
        return state.replace(opt=zero_moment_rows(state.opt, jnp.asarray(touched)))


def create_strategy(name: str, **kw):
    """:default | :mcmc (reference strategy.jl:17)."""
    if name == "default":
        return DefaultStrategy(**kw)
    if name == "mcmc":
        return MCMCStrategy(**kw)
    raise ValueError(f"unknown strategy {name!r} (expected 'default' or 'mcmc')")
