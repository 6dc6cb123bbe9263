"""Pallas instance-table row gather (opt-in, GSPLAT_GATHER_PALLAS=1).

The rasterizer's per-instance gather `jnp.take(pack, ids, axis=0)`
(ops/rasterize.py:_gather_instance_table) costs ~2-2.6 ms at the bench
config (~380k rows out of a (100k, 16) table) against ~0.1 ms of HBM
bandwidth: XLA's TPU gather lowering is per-row serialized. This kernel
holds the whole per-Gaussian pack resident in VMEM and streams the sorted
slot ids, gathering one 1024-id block per grid step with a vectorized
in-kernel `jnp.take` (Mosaic dynamic gather — benchmark/micro9.py probes
the lowering + speed on real hardware before this becomes a default).

Semantics match the XLA path exactly, including pad handling (ids < 0 →
zero rows) and the backward: a custom_vjp whose transpose is the same
single scatter-add segment-sum onto Gaussian rows that `take`'s autodiff
transpose emits — the atomics-free gradient accumulation that replaces the
reference's @atomic loops (reference: src/rasterization/render.jl:242-282).

Applicability is gated by `fits()`: the pack must fit the VMEM budget
(~12 MB → up to ~190k Gaussians at F_PAD=16) and shapes must block evenly;
callers fall back to the XLA take otherwise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 1024

# VMEM ceiling for the resident pack (bytes). v5e has 16 MB of VMEM less
# the id/output blocks and double-buffering; 12 MB leaves headroom.
_VMEM_PACK_LIMIT = 12 * 1024 * 1024


_lowers_cache: bool | None = None


def _lowers() -> bool:
    """One-time probe: does Mosaic lower the in-kernel vectorized take?

    Measured on real hardware (benchmark/micro9.py, 2026-08): current Mosaic
    rejects jnp.take with indices whose shape differs from the operand's
    ("Shape mismatch in input, indices and output") on both row and lane
    axes, and has no scatter-add lowering either — so the VMEM-resident
    gather cannot be built yet. This probe keeps the opt-in flag harmless:
    callers silently fall back to the XLA take until a jaxlib that lowers
    dynamic gather arrives (interpret mode, used by the CPU suite, always
    passes).
    """
    global _lowers_cache
    if _lowers_cache is None:
        try:
            # Production-shaped probe: the rasterizer gathers (N, 16) rows,
            # so probe with a representative (1024, 16) pack — a tiny-shape
            # probe could pass while the real call's shapes still get
            # rejected by a future Mosaic. The probe must run EAGERLY: the
            # first call often arrives while tracing (bench autotune, jitted
            # callers), where arrays are tracers and the probe would fail
            # for the wrong reason and cache a wrong False forever.
            with jax.ensure_compile_time_eval():
                pack = jnp.zeros((1024, 16), jnp.float32)
                ids = jnp.zeros((_BLK,), jnp.int32)
                jax.block_until_ready(_fwd_impl(pack, ids, _probe=True))
            _lowers_cache = True
        except Exception as e:
            # Warn ONCE with the actual error so a genuine kernel regression
            # (vs the known Mosaic take rejection) is distinguishable; the
            # opt-in path then silently falls back to the XLA take.
            import warnings

            warnings.warn(
                "gather_pallas disabled for this process: in-kernel gather "
                f"failed to lower ({type(e).__name__}: {e})",
                stacklevel=2,
            )
            _lowers_cache = False
    return _lowers_cache


def fits(n_rows: int, n_cols: int, i_pad: int) -> bool:
    """Can gather_rows handle a (n_rows, n_cols) pack with i_pad slot ids?"""
    return (
        n_rows * n_cols * 4 <= _VMEM_PACK_LIMIT
        and n_rows % 8 == 0
        and i_pad % _BLK == 0
        and _lowers()
    )


def _kernel(ids_ref, pack_ref, o_ref):
    ids = ids_ref[:]
    n = pack_ref.shape[0]
    safe = jnp.clip(ids, 0, n - 1)
    rows = jnp.take(pack_ref[:], safe, axis=0)  # (BLK, F)
    o_ref[:] = rows * (ids >= 0).astype(rows.dtype)[:, None]


def _fwd_impl(pack, ids, _probe: bool = False):
    (i_pad,) = ids.shape
    n, f = pack.shape
    assert _probe or fits(n, f, i_pad), (n, f, i_pad)
    return pl.pallas_call(
        _kernel,
        grid=(i_pad // _BLK,),
        in_specs=[
            pl.BlockSpec((_BLK,), lambda b: (b,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, f), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLK, f), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((i_pad, f), pack.dtype),
        interpret=jax.default_backend() != "tpu",
    )(ids, pack)


@jax.custom_vjp
def gather_rows(pack, ids):
    """rows = pack[ids], with ids < 0 → zero rows. pack (N, F), ids (I,)."""
    return _fwd_impl(pack, ids)


def _vjp_fwd(pack, ids):
    return _fwd_impl(pack, ids), (ids, pack.shape)


def _vjp_bwd(res, ct):
    ids, (n, f) = res
    safe = jnp.clip(ids, 0, n - 1)
    ct = jnp.where((ids >= 0)[:, None], ct, 0.0)
    d_pack = jnp.zeros((n, f), ct.dtype).at[safe].add(ct)
    return d_pack, None


gather_rows.defvjp(_vjp_fwd, _vjp_bwd)
