"""Checkpointing: safetensors container with the reference's name schema.

The reference stores a single safetensors file with flat dotted names and a
format tag in `__metadata__` (reference: src/checkpoint.jl:15-70; model
state gaussians.jl:91-116; Adam state training.jl:397-414; camera
camera.jl:50-85). This module reproduces that schema —
`gaussians.*`, `optimizers.<name>.{mu,nu}`, `camera.*`, `step` — so a
checkpoint documents the same information; exact resume (Adam moments +
step) round-trips.

Dead-padding note: the static-capacity pytree is saved *compacted to alive
rows* so checkpoints are interoperable and capacity-independent; load pads
back up to any requested capacity.
"""
from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

FORMAT_TAG = "gsplat_tpu-checkpoint-1"
REFERENCE_FORMAT_TAG = "GaussianSplatting.jl-checkpoint-1"
PARAM_NAMES = ("points", "features_dc", "features_rest", "scales", "rotations", "opacities")


def _np(x):
    return np.asarray(x)


def save_checkpoint(path: str, state, camera=None, metadata: dict | None = None) -> None:
    """Save a TrainState (+ optional viewer camera) to safetensors."""
    import os

    from safetensors.numpy import save_file

    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)

    model = state.model
    alive = _np(model.alive)
    tensors = {}
    for k, v in model.params().items():
        tensors[f"gaussians.{k}"] = _np(v)[alive]
    for moment in ("mu", "nu"):
        for k in PARAM_NAMES:
            tensors[f"optimizers.{k}.{moment}"] = _np(state.opt[moment][k])[alive]
    tensors["optimizers.step"] = _np(state.opt["step"]).reshape(1)
    tensors["step"] = _np(state.step).reshape(1)
    tensors["stats.max_radii"] = _np(state.max_radii)[alive]
    tensors["stats.grad_accum"] = _np(state.grad_accum)[alive]
    tensors["stats.denom"] = _np(state.stat_denom)[alive]
    # Optional subsystem groups, detected by key presence on load
    # (reference: bilateral.*, sky.* groups, checkpoint.jl schema).
    for k, v in (state.aux or {}).items():
        tensors[f"aux.{k}"] = _np(v)
        tensors[f"optimizers.aux.{k}.mu"] = _np(state.opt["mu"][k])
        tensors[f"optimizers.aux.{k}.nu"] = _np(state.opt["nu"][k])
    for k, v in (getattr(state, "poses", None) or {}).items():
        tensors[f"poses.{k}"] = _np(v)
    if camera is not None:
        tensors["camera.R"] = _np(camera.R)
        tensors["camera.t"] = _np(camera.t)
        tensors["camera.focal"] = _np(camera.focal)
        tensors["camera.principal"] = _np(camera.principal)
        tensors["camera.resolution"] = np.array([camera.width, camera.height], np.int64)

    meta = {
        "format": FORMAT_TAG,
        "sh_degree": str(model.sh_degree),
        "isotropic": str(int(model.isotropic)),
    }
    if metadata:
        meta.update({k: str(v) for k, v in metadata.items()})
    save_file(tensors, path, metadata=meta)


def _convert_reference_checkpoint(tensors: dict, meta: dict):
    """Translate a `GaussianSplatting.jl-checkpoint-1` safetensors table
    into this module's schema (reference: checkpoint.jl:15-70, model state
    gaussians.jl:91-116, Adam state training.jl:397-414, document
    training.jl:419-469).

    Julia arrays are column-major and serialized in C order with reversed
    dims, so e.g. `points :: (3, N)` arrives as an (N, 3) tensor — already
    this package's convention; a feature-major variant is transposed
    defensively. Scalars ride `__metadata__` as strings. The reference has
    no densification-stats tensors (it tracks them outside the checkpoint),
    so those restart at zero; `sky`/`bilateral` groups are skipped with a
    warning (their geometry is dataset-derived on this side)."""
    n = None
    out = {}
    for k in PARAM_NAMES:
        t = np.ascontiguousarray(tensors[f"gaussians.{k}"], np.float32)
        if n is None:
            # points: (N, 3) expected; tolerate the (3, N) spelling.
            if t.ndim == 2 and t.shape[0] == 3 and t.shape[1] != 3:
                t = t.T
            n = t.shape[0]
        out[f"gaussians.{k}"] = _ref_param(k, t, n)
    for name in PARAM_NAMES:
        for ours, theirs in (("mu", "mu"), ("nu", "nu")):
            key = f"optimizers.{name}.{theirs}.1"
            t = np.ascontiguousarray(tensors[key], np.float32)
            out[f"optimizers.{name}.{ours}"] = _ref_param(name, t, n)
    step = int(float(meta.get("step", "0")))
    opt_step = int(float(meta.get("optimizers.points.current_step", step)))
    out["step"] = np.array([step], np.int64)
    out["optimizers.step"] = np.array([opt_step], np.int64)
    zeros = np.zeros((n,), np.float32)
    out["stats.max_radii"] = zeros
    out["stats.grad_accum"] = zeros
    out["stats.denom"] = zeros
    skipped = sorted({k.split(".")[0] for k in tensors
                      if k.split(".")[0] in ("sky", "bilateral")})
    if skipped:
        print(f"[checkpoint] reference groups skipped on import: {skipped} "
              "(geometry is dataset-derived; re-enable the features to "
              "rebuild them)", flush=True)
    new_meta = {
        "format": FORMAT_TAG,
        "sh_degree": meta.get("gaussians.sh_degree", "3"),
        "isotropic": str(int(out["gaussians.scales"].shape[1] == 1)),
        "imported_from": REFERENCE_FORMAT_TAG,
    }
    return out, new_meta


def _ref_param(name: str, t: np.ndarray, n: int) -> np.ndarray:
    """Normalize one reference tensor to this package's array convention."""
    # Feature-major 2D spellings -> gaussian-major.
    if t.ndim == 2 and t.shape[0] != n and t.shape[1] == n:
        t = np.ascontiguousarray(t.T)
    # features_dc/rest: (3, K, N) -> (N, K, 3).
    if t.ndim == 3 and t.shape[0] == 3 and t.shape[2] == n:
        t = np.ascontiguousarray(np.moveaxis(t, (0, 1, 2), (2, 1, 0)))
    if name == "opacities":
        t = t.reshape(n)  # (N, 1) -> (N,)
    assert t.shape[0] == n, (name, t.shape)
    return t


def load_checkpoint(path: str, *, capacity: int | None = None):
    """-> (TrainState, Camera | None, metadata dict)."""
    from safetensors import safe_open

    from ..camera import Camera
    from ..models.gaussians import DEAD_OPACITY, DEAD_SCALE, GaussianModel
    from ..train.trainer import TrainState

    tensors = {}
    with safe_open(path, framework="numpy") as f:
        meta = dict(f.metadata() or {})
        for k in f.keys():
            tensors[k] = f.get_tensor(k)
    if meta.get("format") == REFERENCE_FORMAT_TAG:
        # A checkpoint written by the Julia reference: translate its schema
        # in place, then fall through to the ordinary loader.
        tensors, meta = _convert_reference_checkpoint(tensors, meta)
    if meta.get("format") != FORMAT_TAG:
        raise ValueError(
            f"not a {FORMAT_TAG} or {REFERENCE_FORMAT_TAG} file "
            f"(format={meta.get('format')!r})")

    n = tensors["gaussians.points"].shape[0]
    cap = capacity or n
    assert cap >= n

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, x.dtype)
        out[:n] = x
        return jnp.asarray(out)

    fills = {"scales": DEAD_SCALE, "opacities": DEAD_OPACITY}
    params = {k: pad(tensors[f"gaussians.{k}"], fills.get(k, 0.0)) for k in PARAM_NAMES}
    rot = np.array(params["rotations"])
    rot[n:, 0] = 1.0
    params["rotations"] = jnp.asarray(rot)

    model = GaussianModel(
        points=params["points"],
        features_dc=params["features_dc"],
        features_rest=params["features_rest"],
        scales=params["scales"],
        rotations=params["rotations"],
        opacities=params["opacities"],
        alive=jnp.asarray(np.arange(cap) < n),
        sh_degree=int(meta.get("sh_degree", "3")),
    )
    aux = {
        k[len("aux."):]: jnp.asarray(v)
        for k, v in tensors.items()
        if k.startswith("aux.")
    }
    opt = {
        "mu": {k: pad(tensors[f"optimizers.{k}.mu"]) for k in PARAM_NAMES}
        | {k: jnp.asarray(tensors[f"optimizers.aux.{k}.mu"]) for k in aux},
        "nu": {k: pad(tensors[f"optimizers.{k}.nu"]) for k in PARAM_NAMES}
        | {k: jnp.asarray(tensors[f"optimizers.aux.{k}.nu"]) for k in aux},
        "step": jnp.asarray(tensors["optimizers.step"][0], jnp.int32),
    }
    state = TrainState(
        model=model,
        opt=opt,
        step=jnp.asarray(tensors["step"][0], jnp.int32),
        max_radii=pad(tensors["stats.max_radii"]),
        grad_accum=pad(tensors["stats.grad_accum"]),
        stat_denom=pad(tensors["stats.denom"]),
        aux=aux,
        poses={
            k[len("poses."):]: jnp.asarray(v)
            for k, v in tensors.items()
            if k.startswith("poses.")
        },
    )

    camera = None
    if "camera.R" in tensors:
        w, h = (int(v) for v in tensors["camera.resolution"])
        camera = Camera.create(
            R=tensors["camera.R"],
            t=tensors["camera.t"],
            focal=tensors["camera.focal"],
            principal=tensors["camera.principal"],
            width=w,
            height=h,
        )
    return state, camera, meta
