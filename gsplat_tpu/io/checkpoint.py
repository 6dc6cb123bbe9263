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
    if meta.get("format") != FORMAT_TAG:
        raise ValueError(f"not a {FORMAT_TAG} file (format={meta.get('format')!r})")

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
