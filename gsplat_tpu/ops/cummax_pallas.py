"""Streaming Pallas cummax over a 1-D i32 array.

XLA lowers `lax.cummax` on a 380k-element array as ~19 shifted-max passes
(~1.3 ms on v5e) for what is a bandwidth-trivial scan (~3 MB). This kernel
streams (8, 128) blocks once, does the in-block scan with 10 masked
roll-max steps (7 lane + 3 sublane), and carries the running max across
the sequential grid in a VMEM (1, 1) scratch — no scalar extraction.

Used by ops/tiles.py's marker->owner expansion (the slot-fill cummax);
`lax.cummax` remains the oracle (differential-tested) and the non-TPU path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 1024  # (8, 128) i32
_MIN = -(1 << 31)  # python literal: jnp constants would be captured consts


def _shift_max(v, k, axis):
    """v = max(v, v shifted DOWN the scan order by k along axis), with the
    wrapped-around lanes masked to -inf."""
    rolled = pltpu.roll(v, k, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
    return jnp.maximum(v, jnp.where(idx >= k, rolled, _MIN))


def _kernel(x_ref, o_ref, carry_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0, 0] = jnp.int32(_MIN)

    v = x_ref[:]  # (8, 128), scan order = row-major
    for k in (1, 2, 4, 8, 16, 32, 64):  # in-row (lane) inclusive scan
        v = _shift_max(v, k, 1)
    # Cross-row prefix: inclusive scan of the row maxima down the sublanes,
    # shifted to exclusive.
    row_tail = jnp.broadcast_to(v[:, 127:128], (8, 128))
    for k in (1, 2, 4):
        row_tail = _shift_max(row_tail, k, 0)
    row_prefix = pltpu.roll(row_tail, 1, 0)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    v = jnp.maximum(v, jnp.where(row_idx >= 1, row_prefix, _MIN))
    v = jnp.maximum(v, carry_ref[0, 0])
    carry_ref[0, 0] = jnp.max(v)
    o_ref[:] = v


def cummax_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cummax of a 1-D i32 array whose length divides 1024.
    Matches `jax.lax.cummax` exactly (differential-tested)."""
    (n,) = x.shape
    assert n % _BLOCK == 0, n
    out = pl.pallas_call(
        _kernel,
        grid=(n // _BLOCK,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=jax.default_backend() != "tpu",
    )(x.reshape(n // 128, 128))
    return out.reshape(n)
