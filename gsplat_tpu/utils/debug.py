"""Debug utilities: non-finite loss/gradient forensics, memory accounting.

The reference gates NaN checks behind `GSP_DEBUG=1` (GaussianSplatting.jl:107-118)
and produces a per-Gaussian forensic report when a gradient goes non-finite
(training.jl:534-573). Here the cheap always-on guard is the finite-loss
check in the Trainer (the loss already rides the packed metrics transfer);
`GST_DEBUG=1` additionally re-runs the failing step eagerly and reports the
offending parameter rows.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def debug_enabled() -> bool:
    return os.environ.get("GST_DEBUG", "0") not in ("", "0", "false")


def nonfinite_gradient_report(grads: dict, model, max_rows: int = 8) -> str:
    """Which parameters / Gaussian rows carry non-finite gradients
    (reference training.jl:534-573)."""
    lines = ["non-finite gradient forensics:"]
    for name, g in grads.items():
        g = np.asarray(g)
        bad = ~np.isfinite(g)
        if not bad.any():
            continue
        rows = np.unique(np.nonzero(bad)[0])[:max_rows] if g.ndim else []
        lines.append(
            f"  {name}: {int(bad.sum())}/{g.size} non-finite entries, "
            f"rows {list(map(int, rows))}"
        )
        for r in rows[:3]:
            try:
                alive = bool(np.asarray(model.alive)[r])
                op = float(np.asarray(model.opacities)[r])
                sc = np.asarray(model.scales)[r]
                lines.append(
                    f"    row {int(r)}: alive={alive} opacity_raw={op:.3f} "
                    f"scales_raw={np.array2string(sc, precision=3)}"
                )
            except Exception:
                pass
    if len(lines) == 1:
        lines.append("  (no non-finite gradient found on re-check; "
                     "the non-finite value arose in the loss itself)")
    return "\n".join(lines)


def memory_usage(state) -> dict:
    """Bytes per component of a TrainState (reference `memory_usage`,
    utils.jl:96-105)."""

    def nbytes(tree):
        return sum(
            x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, "dtype")
        )

    out = {
        "model": nbytes(state.model.params()) + state.model.alive.size,
        "optimizer": nbytes(state.opt),
        "stats": nbytes((state.max_radii, state.grad_accum, state.stat_denom)),
        "aux": nbytes(state.aux),
    }
    out["total"] = sum(out.values())
    return out


def device_memory_stats() -> dict:
    """Live device memory statistics where the backend exposes them."""
    try:
        d = jax.devices()[0]
        return dict(d.memory_stats() or {})
    except Exception:
        return {}
