"""OptimizationParams <-> TOML round-trip.

Mirrors the reference's params I/O semantics (src/params_io.jl:13-82):
omitted fields take defaults; unknown keys, wrong types and invalid enum
values are strict errors; `with_params` copy-with-changes.
"""
from __future__ import annotations

import dataclasses

from .optim import OptimizationParams

_ENUMS = {
    "depth_loss_mode": ("ssi", "ssi_disparity", "ssi_depth"),
    "sky_dome_shape": ("hemisphere", "sphere"),
}


def save_opt_params(path: str, params: OptimizationParams) -> None:
    lines = ["# gsplat_tpu optimization parameters\n"]
    for f in dataclasses.fields(params):
        v = getattr(params, f.name)
        if isinstance(v, bool):
            s = "true" if v else "false"
        elif isinstance(v, str):
            s = f'"{v}"'
        elif isinstance(v, tuple):
            s = "[" + ", ".join(str(x) for x in v) + "]"
        else:
            s = repr(v)
        lines.append(f"{f.name} = {s}\n")
    with open(path, "w") as fh:
        fh.writelines(lines)


def load_opt_params(path: str) -> OptimizationParams:
    import tomllib

    with open(path, "rb") as fh:
        data = tomllib.load(fh)
    return with_params(OptimizationParams(), **data)


def with_params(base: OptimizationParams, **changes) -> OptimizationParams:
    """Copy-with-changes, strict about unknown keys / types / enums
    (params_io.jl:3-6, 40-74)."""
    fields = {f.name: f for f in dataclasses.fields(base)}
    clean = {}
    for k, v in changes.items():
        if k not in fields:
            raise KeyError(f"Unknown optimization parameter: {k!r}")
        cur = getattr(base, k)
        if isinstance(cur, bool):
            if not isinstance(v, bool):
                raise TypeError(f"{k}: expected bool, got {type(v).__name__}")
        elif isinstance(cur, int) and not isinstance(cur, bool):
            if isinstance(v, bool) or not isinstance(v, int):
                raise TypeError(f"{k}: expected int, got {type(v).__name__}")
        elif isinstance(cur, float):
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                raise TypeError(f"{k}: expected float, got {type(v).__name__}")
            v = float(v)
        elif isinstance(cur, str):
            if not isinstance(v, str):
                raise TypeError(f"{k}: expected str, got {type(v).__name__}")
            if k in _ENUMS and v not in _ENUMS[k]:
                raise ValueError(f"{k}: {v!r} not in {_ENUMS[k]}")
        elif isinstance(cur, tuple):
            if not isinstance(v, (list, tuple)) or len(v) != len(cur):
                raise TypeError(f"{k}: expected {len(cur)}-tuple")
            v = tuple(int(x) for x in v)
        clean[k] = v
    return dataclasses.replace(base, **clean)
