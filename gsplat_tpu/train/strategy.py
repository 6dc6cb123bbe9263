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

Index bookkeeping (which slots are dead, free-slot assignment, multinomial
sampling) runs ON DEVICE inside one jitted refine pass — free slots come
from a sort, request ranks from cumsums, and the host fetches only two
scalars (grow signal + new-row count) per refine. The reference instead
pulls opacities to the host every refine (mcmc.jl:135-146), and a host
round-trip at 1M capacity costs ~37 s through a remote-TPU tunnel
(~375 ms/step amortized — the single biggest line in a 30k protocol run,
PERFORMANCE.md round 3). Only capacity GROWTH stays host-side: it changes
array shapes, so the host re-pads and replays the refine.

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


def _free_slots(alive_after):
    """(C,) slot indices with the dead slots first, in ascending index order
    (one sort — the in-jit replacement for np.flatnonzero(~alive))."""
    c = alive_after.shape[0]
    _, ids = jax.lax.sort(
        (alive_after.astype(jnp.int32), jnp.arange(c, dtype=jnp.int32)),
        num_keys=1, is_stable=True,
    )
    return ids


def _gather_remap(params: dict, src_map) -> dict:
    """params[i] <- params[src_map[i]] for every key (one row gather each).
    src_map[i] == i for untouched slots."""
    return {k: jnp.take(v, src_map, axis=0) for k, v in params.items()}


# ---------------------------------------------------------------------------
# ADC — original 3DGS adaptive density control (strategy.jl / densification.jl)
# ---------------------------------------------------------------------------


@jax.jit
def _adc_refine_core(
    state, key, extent, dense_percent, grad_threshold, min_opacity,
    max_screen_size,
):
    """One densify+prune pass, fully on device (densification.jl:1-27).

    Free-slot assignment without host index lists: free slots come from one
    sort (dead-first), each clone/split request takes the free slot at its
    cumsum rank, and the three request roles (clone copy / split child A /
    child B) scatter their SOURCE index + role id into a (C,) remap, which
    ONE row gather per parameter then applies. Requests whose rank exceeds
    the free count are dropped (the host checks `need` and grows + replays).

    Returns (new_state, info) with info = [n_new, n_alive_after + n_new].
    """
    model = state.model
    c = model.capacity
    alive = model.alive
    denom = state.stat_denom
    grads = jnp.where(denom > 0, state.grad_accum / jnp.maximum(denom, 1.0), 0.0)
    scales_max = jnp.exp(model.scales).max(axis=1)
    opac = jax.nn.sigmoid(model.opacities)

    gamma = dense_percent * extent
    clone = alive & (grads > grad_threshold) & (scales_max < gamma)
    split = alive & (grads >= grad_threshold) & (scales_max > gamma)
    prune = alive & (opac <= min_opacity)
    size_prune = (
        (state.max_radii.astype(jnp.float32) >= max_screen_size)
        | (scales_max >= 0.1 * extent)
    )
    prune = prune | (alive & size_prune & (max_screen_size > 0))
    kill = prune | split  # split originals are replaced by their children
    alive_after = alive & ~kill

    n_clone = jnp.sum(clone.astype(jnp.int32))
    n_split = jnp.sum(split.astype(jnp.int32))
    n_new = n_clone + 2 * n_split
    n_alive_after = jnp.sum(alive_after.astype(jnp.int32))
    n_free = c - n_alive_after

    free_ids = _free_slots(alive_after)
    ar = jnp.arange(c, dtype=jnp.int32)
    rank_c = jnp.cumsum(clone.astype(jnp.int32)) - 1
    rank_s = jnp.cumsum(split.astype(jnp.int32)) - 1

    src_map = ar
    role = jnp.zeros((c,), jnp.int32)

    def assign(src_map, role, mask, rank, r):
        ok = mask & (rank < n_free)
        dst = jnp.take(free_ids, jnp.clip(rank, 0, c - 1))
        # Dropped requests get DISTINCT out-of-bounds indices so the
        # unique_indices promise holds for them too (tiles.py pattern).
        dst = jnp.where(ok, dst, c + ar)
        src_map = src_map.at[dst].set(ar, mode="drop", unique_indices=True)
        role = role.at[dst].set(r, mode="drop", unique_indices=True)
        return src_map, role

    src_map, role = assign(src_map, role, clone, rank_c, 1)
    src_map, role = assign(src_map, role, split, n_clone + rank_s, 2)
    src_map, role = assign(src_map, role, split, n_clone + n_split + rank_s, 3)
    is_new = role > 0
    is_child = role >= 2

    params = _gather_remap(model.params(), src_map)
    # Split children: scale /1.6 (log(sigma/(0.8*2))) + rotated N(0, sigma)
    # position jitter, independent per child (densification.jl:64-136).
    # Clones copy verbatim.
    noise = jax.random.normal(key, (c, 3), jnp.float32)
    sigma = jnp.exp(params["scales"])
    sig3 = jnp.broadcast_to(sigma, (c, 3)) if sigma.shape[1] == 1 else sigma
    R = jax.vmap(quat_to_rotmat)(params["rotations"])
    jitter = jnp.einsum("nij,nj->ni", R, sig3 * noise)
    params = dict(
        params,
        points=params["points"] + jnp.where(is_child[:, None], jitter, 0.0),
        scales=jnp.where(
            is_child[:, None],
            jnp.log(jnp.maximum(sigma / 1.6, 1e-12)),
            params["scales"],
        ),
    )

    new_alive = alive_after | is_new
    model = model.replace_params(params).replace(alive=new_alive)
    # Dead rows: force-dead opacity so pruned slots stop rendering even
    # if later optimizer math touches them (masked_opacities also guards).
    model = model.replace(
        opacities=jnp.where(new_alive, model.opacities, DEAD_OPACITY)
    )

    # Zero moments of every re-written or killed row; fresh rows start clean
    # (append semantics, densification.jl:261-287). Stats reset after every
    # refine (densification.jl:202-214).
    opt = zero_moment_rows(state.opt, is_new | kill)
    new_state = state.replace(
        model=model,
        opt=opt,
        max_radii=jnp.zeros((c,), state.max_radii.dtype),
        grad_accum=jnp.zeros((c,), jnp.float32),
        stat_denom=jnp.zeros((c,), jnp.float32),
    )
    return new_state, jnp.stack([n_new, n_alive_after + n_new])


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
        """Clone + split + prune (densification.jl:1-27) — ONE jitted device
        pass (`_adc_refine_core`) plus a 2-scalar fetch. If the new rows
        don't fit the free slots, the truncated result is discarded, the
        capacity grows host-side, and the pass replays (same masks — the
        core is a pure function of the pre-refine state)."""
        key = jax.random.PRNGKey(int(self._rng.integers(1 << 31)))
        for _ in range(2):
            new_state, info = _adc_refine_core(
                state, key,
                jnp.float32(extent),
                jnp.float32(self.dense_percent),
                jnp.float32(self.densify_grad_threshold),
                jnp.float32(self.min_opacity),
                jnp.float32(max_screen_size),
            )
            _n_new, need = (int(x) for x in np.asarray(info))
            if need <= state.model.capacity:
                return new_state
            state = grow_state(
                state, _bucket(max(need, int(1.3 * state.model.capacity)))
            )
        return new_state


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


def _relocation_params_jnp(W, o, ratio, min_opacity):
    """Eq. 9 on device, vectorized over all capacity rows. `W` is the
    cumsum-over-i of the binomial table (see `relocation_params`, the host
    oracle both are tested against). ratio (C,) int32 >= 1."""
    n_max = W.shape[0]
    o = jnp.clip(o, 1e-6, 1.0 - 1e-6)
    ratio = jnp.clip(ratio, 1, n_max - 1)
    new_o = jnp.clip(
        1.0 - (1.0 - o) ** (1.0 / ratio.astype(jnp.float32)),
        jnp.maximum(1e-6, min_opacity), 1.0 - 1e-6,
    )
    Wk = jnp.take(W, ratio - 1, axis=0)  # (C, n_max)
    ks = jnp.arange(n_max, dtype=jnp.int32)
    powers = new_o[:, None] ** (ks[None, :] + 1).astype(jnp.float32)
    mask = ks[None, :] < ratio[:, None]
    denom = jnp.sum(jnp.where(mask, Wk * powers, 0.0), axis=1)
    denom = jnp.copysign(jnp.maximum(jnp.abs(denom), 1e-8), denom)
    coeff = jnp.clip(o / denom, -1e6, 1e6)
    return new_o, coeff


def _sample_counts(weights, n_draws, key):
    """`n_draws` (traced) multinomial draws ∝ weights WITH replacement, on
    device: inverse-CDF via searchsorted. Returns (draws (C,) i32 — entries
    past n_draws are garbage —, counts (C,) i32 over the first n_draws).
    Counts come from sort + run-length + a unique scatter-set: the TPU has
    no fast duplicate-index scatter-add (PERFORMANCE.md)."""
    c = weights.shape[0]
    cw = jnp.cumsum(weights)
    total = cw[-1]
    u = jax.random.uniform(key, (c,), jnp.float32) * total
    draws = jnp.clip(
        jnp.searchsorted(cw, u, side="right", method="sort").astype(jnp.int32),
        0, c - 1,
    )
    ar = jnp.arange(c, dtype=jnp.int32)
    s = jnp.sort(jnp.where(ar < n_draws, draws, c))
    is_start = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    start_of_run = jax.lax.cummax(jnp.where(is_start, ar, 0))
    runlen = ar - start_of_run + 1
    is_end = jnp.concatenate([s[1:] != s[:-1], jnp.ones((1,), bool)])
    tgt = jnp.where(is_end & (s < c), s, c + ar)  # distinct OOB for dropped
    counts = jnp.zeros((c,), jnp.int32).at[tgt].set(
        runlen, mode="drop", unique_indices=True
    )
    return draws, counts, total


def _gate_state(do, new_state, state):
    """new_state where `do` (traced bool), else the unchanged state."""
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(do, a, b), new_state, state
    )


@jax.jit
def _mcmc_relocate_core(state, key, W, extent, min_opacity, max_scale):
    """Move dead Gaussians onto alive ones sampled ∝ opacity, fully on
    device (mcmc.jl:132-178): Eq. 9 corrections land on the sampled rows
    (ratio = 1 + times-sampled), then dead rows copy their sampled source
    via one row-gather remap. No host fetch at all."""
    model = state.model
    c = model.capacity
    alive = model.alive
    o = jax.nn.sigmoid(model.opacities)
    s_max = jnp.max(model.scales, axis=1)
    is_dead = alive & (
        (o <= min_opacity) | (s_max > jnp.log(max_scale * extent))
    )
    n_dead = jnp.sum(is_dead.astype(jnp.int32))
    w = jnp.where(alive & ~is_dead, o, 0.0)
    draws, counts, total = _sample_counts(w, n_dead, key)
    do = (n_dead > 0) & (total > 0)

    sampled = counts > 0
    new_o, coeff = _relocation_params_jnp(W, o, counts + 1, min_opacity)
    raw_o = jnp.log(new_o / (1.0 - new_o))
    s_old = jnp.exp(model.scales)
    new_s = jnp.log(jnp.maximum(jnp.abs(coeff[:, None] * s_old), 1e-10))
    params = dict(
        model.params(),
        opacities=jnp.where(sampled, raw_o, model.opacities),
        scales=jnp.where(sampled[:, None], new_s, model.scales),
    )

    ar = jnp.arange(c, dtype=jnp.int32)
    dead_rank = jnp.cumsum(is_dead.astype(jnp.int32)) - 1
    src_for_dead = jnp.take(draws, jnp.clip(dead_rank, 0, c - 1))
    src_map = jnp.where(is_dead, src_for_dead, ar)
    params = _gather_remap(params, src_map)

    new_state = state.replace(
        model=model.replace_params(params),
        opt=zero_moment_rows(state.opt, is_dead | sampled),
    )
    return _gate_state(do, new_state, state)


@jax.jit
def _mcmc_add_core(state, key, W, grow_factor, max_cap, min_opacity):
    """Grow by grow_factor up to max_cap on device (mcmc.jl:184-217):
    sample ∝ opacity, Eq. 9-correct the sampled rows, copy them into free
    slots. Returns (state', info=[need_grow, n_alive, n_new]) — the host
    grows capacity and replays when need_grow."""
    model = state.model
    c = model.capacity
    alive = model.alive
    n = jnp.sum(alive.astype(jnp.int32))
    n_new = jnp.minimum(max_cap, (grow_factor * n.astype(jnp.float32))
                        .astype(jnp.int32)) - n
    n_free = c - n
    need_grow = n_new > n_free

    o = jax.nn.sigmoid(model.opacities)
    w = jnp.where(alive, o, 0.0)
    n_draws = jnp.clip(n_new, 0, n_free)
    draws, counts, total = _sample_counts(w, n_draws, key)
    do = (n_new > 0) & (total > 0)

    sampled = counts > 0
    new_o, coeff = _relocation_params_jnp(W, o, counts + 1, min_opacity)
    raw_o = jnp.log(new_o / (1.0 - new_o))
    s_old = jnp.exp(model.scales)
    new_s = jnp.log(jnp.maximum(jnp.abs(coeff[:, None] * s_old), 1e-10))
    params = dict(
        model.params(),
        opacities=jnp.where(sampled, raw_o, model.opacities),
        scales=jnp.where(sampled[:, None], new_s, model.scales),
    )

    ar = jnp.arange(c, dtype=jnp.int32)
    free_ids = _free_slots(alive)
    ok = ar < n_draws  # j-th draw -> j-th free slot
    dst = jnp.where(ok, free_ids, c + ar)
    src_map = ar.at[dst].set(draws, mode="drop", unique_indices=True)
    new_alive = alive.at[dst].set(True, mode="drop", unique_indices=True)
    is_new = jnp.zeros((c,), bool).at[dst].set(
        True, mode="drop", unique_indices=True
    )
    params = _gather_remap(params, src_map)

    new_state = state.replace(
        model=model.replace_params(params).replace(alive=new_alive),
        opt=zero_moment_rows(state.opt, is_new | sampled),
    )
    return (
        _gate_state(do, new_state, state),
        jnp.stack([need_grow.astype(jnp.int32), n, n_new]),
    )


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

    @property
    def _W(self):
        """Device copy of cumsum-over-i of the Eq. 9 binomial table."""
        if getattr(self, "_W_cache", None) is None:
            self._W_cache = jnp.asarray(
                np.cumsum(self._binoms, axis=0).astype(np.float32)
            )
        return self._W_cache

    def relocate(self, state, extent: float):
        """Move dead Gaussians onto alive ones sampled ∝ opacity
        (mcmc.jl:132-178) — one jitted device pass, zero host fetches."""
        key = jax.random.PRNGKey(int(self._rng.integers(1 << 31)))
        return _mcmc_relocate_core(
            state, key, self._W,
            jnp.float32(extent), jnp.float32(self.min_opacity),
            jnp.float32(self.max_scale),
        )

    def add(self, state):
        """Grow by grow_factor up to max_cap: sample ∝ opacity, Eq.9-split,
        copy into free slots (mcmc.jl:184-217) — one jitted device pass plus
        a 3-scalar fetch; grows capacity host-side and replays if the new
        rows don't fit."""
        key = jax.random.PRNGKey(int(self._rng.integers(1 << 31)))
        for _ in range(2):
            new_state, info = _mcmc_add_core(
                state, key, self._W,
                jnp.float32(self.grow_factor), jnp.int32(self.max_cap),
                jnp.float32(self.min_opacity),
            )
            need_grow, n, n_new = (int(x) for x in np.asarray(info))
            if not need_grow:
                return new_state
            state = grow_state(
                state, _bucket(max(n + n_new, int(1.3 * state.model.capacity)))
            )
        return new_state


def create_strategy(name: str, **kw):
    """:default | :mcmc (reference strategy.jl:17)."""
    if name == "default":
        return DefaultStrategy(**kw)
    if name == "mcmc":
        return MCMCStrategy(**kw)
    raise ValueError(f"unknown strategy {name!r} (expected 'default' or 'mcmc')")
