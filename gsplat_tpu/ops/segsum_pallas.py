"""Streaming Pallas segmented row-sum over a gaussian-major cotangent array.

This is the per-Gaussian gradient reduction that replaces the reference
backward's global @atomic accumulation (reference:
src/rasterization/render.jl:242-282). The TPU has no scatter-add worth
using at scale: EVERY XLA scatter/segment_sum spelling serializes per
update row and costs ~82 ms/step at a 1.12M-instance budget — half the
train step's device time (benchmark/profile_quality_step.py). The
sort-free part of that work is bandwidth-trivial (~72 MB), so it belongs
in one streaming pass:

  - The caller sorts the per-instance cotangent rows by gaussian id (one
    key+index `lax.sort` + row-gather), making each gaussian's rows a
    CONTIGUOUS run at the binning's gaussian-major offsets
    (ops/tiles.py `gm_offsets`).
  - This kernel streams (2048, F) blocks once. Per 256-row sub-block it
    builds the same-segment mask M[r,c] = (seg[r] == seg[c]) and computes
    all in-block segment sums as ONE (256,256)@(256,F) MXU matmul; a
    (1, F) VMEM carry + SMEM segment-id scalar continue runs across
    sub-blocks and grid steps (the grid is sequential on TPU).
  - Only each run's LAST row is guaranteed to hold the full segment sum
    (interior rows hold block-local sums without later-block terms); the
    caller gathers rows at `gm_offsets + counts - 1`.

Numerics: in-block sums are single f32 dots (HIGHEST precision); cross-block
carries add once per block a run spans. Error is bounded by the run length
(a gaussian's tile count), like the scatter-add it replaces — and the
reduction order is DETERMINISTIC, which the reference's atomics are not.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_B = 256  # rows per same-segment-mask unit
_SB = 8  # sub-blocks per grid step (amortizes the fixed grid-step cost)
BLOCK = _B * _SB  # rows per grid step


def _kernel(v_ref, segr_ref, segc_ref, o_ref, carry_vec, carry_seg):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_seg[0, 0] = jnp.int32(-2)  # matches no segment id
        carry_vec[:] = jnp.zeros_like(carry_vec)

    for sb in range(_SB):
        vb = v_ref[sb * _B : (sb + 1) * _B, :]  # (B, F)
        seg_row = segr_ref[sb : sb + 1, :]  # (1, B)
        seg_col = segc_ref[sb * _B : (sb + 1) * _B, :]  # (B, 1)
        m = (seg_col == seg_row).astype(jnp.float32)  # (B, B)
        s = jax.lax.dot_general(
            m, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (B, F) in-block segment sums
        cmask = (seg_col == carry_seg[0, 0]).astype(jnp.float32)  # (B, 1)
        s = s + cmask * carry_vec[:]
        o_ref[sb * _B : (sb + 1) * _B, :] = s
        carry_vec[:] = s[_B - 1 : _B, :]
        carry_seg[0, 0] = seg_col[_B - 1, 0]


def segsum_scan(v: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
    """Segmented row sums of `v` (I, F) f32 with segment ids `seg` (I,) i32.

    PRECONDITION: `seg` is sorted ascending (equal ids contiguous) and
    I % 2048 == 0. Returns (I, F) where each segment's LAST row holds the
    full segment sum; other rows are partial (block-local) values.
    """
    I, F = v.shape
    assert I % BLOCK == 0, I
    v = v.astype(jnp.float32)
    seg = seg.astype(jnp.int32)
    out = pl.pallas_call(
        _kernel,
        grid=(I // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SB, _B), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((I, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, F), jnp.float32),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=jax.default_backend() != "tpu",
    )(v, seg.reshape(I // _B, _B), seg.reshape(I, 1))
    return out
