"""Tile blend as Pallas TPU kernels (the flagship hot op).

TPU-native re-design of the reference's forward/backward compositing kernels
(`render!`/`∇render!`, reference: src/rasterization/render.jl:1-286). The
reference maps one CUDA workgroup per 16x16 tile with 256 threads staging
256 Gaussians at a time through shared memory, and accumulates backward
cotangents with global atomics. Here:

  - grid = (n_tiles,); each grid step owns one tile's 256 pixels.
  - The tile's depth-sorted instances arrive in CHUNK=128-wide slabs,
    double-buffered HBM->VMEM with async DMA (the chunk-aligned slabs are
    produced by ops/tiles.py). tile_start/tile_count ride scalar prefetch.
  - The sequential transmittance recurrence T <- T*(1-alpha) becomes a
    *log-space cumulative sum along the instance axis*, computed as a
    (256,128)@(128,128) triangular matmul — MXU work instead of a serial
    per-instance loop. Color accumulation is likewise a matmul.
  - Early termination (T < 1e-4, render.jl:97-100) exits the chunk loop
    when every pixel of the tile is done.
  - The backward pass replays chunks back-to-front per tile, reconstructing
    per-instance transmittance from the saved T_final by division in log
    space (exactly the reference's strategy, render.jl:190-238) and writes
    per-instance cotangent slabs to *disjoint* regions of the padded
    instance table — no atomics. The per-Gaussian reduction then happens in
    the caller through the instance-gather's autodiff transpose (one XLA
    segment-sum), replacing the reference's @atomic accumulation.

Math matches ops/blend_scan.py (the executable spec, tested allclose); both
honor the true zero gradient of the 0.99 alpha clamp (the reference leaks
gradient through it, render.jl:234 — divergence documented in blend_scan).

In-kernel layout: alpha/weight matrices are (P=256 pixels, K=128 instances)
— pixels on sublanes, instances on lanes — so instance-table rows broadcast
as (1, K) and per-pixel carries live as (P, 1).
"""
from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import ALPHA_MAX, ALPHA_MIN, CHUNK, TILE, TILE_PIXELS, TRANSMITTANCE_EPS
from .blend_scan import (
    F_PAD,
    ROW_CONIC_A,
    ROW_CONIC_B,
    ROW_CONIC_C,
    ROW_FEAT,
    ROW_OPACITY,
    ROW_X,
    ROW_Y,
)

P = TILE_PIXELS  # 256 pixels per tile
OUT_ROWS = 16  # packed per-tile rows: fwd [color(C) | T | n_contrib | pad]
LOG_T_EPS = math.log(TRANSMITTANCE_EPS)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pixel_coords(tile_idx, gx):
    """(P, 1) f32 pixel-center coords of tile `tile_idx`'s pixels (x fastest)."""
    tx = tile_idx % gx
    ty = tile_idx // gx
    k = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tx * TILE + k % TILE).astype(jnp.float32)
    py = (ty * TILE + k // TILE).astype(jnp.float32)
    return px, py


def _chunk_alpha(slab, px, py, extra_mask=None):
    """alpha (P,K) of one slab against the tile's pixels.

    Applies the sigma>=0 skip, 0.99 cap, 1/255 floor (render.jl:90-95).
    Padding instances have opacity 0 -> alpha 0. `extra_mask` (any shape
    broadcastable to (P,K)) folds additional lane masks (the in-count test)
    into the ONE select — the blend kernels are VPU-issue-bound, so every
    merged pass counts (benchmark/micro5.py). Returns
    (alpha, opG, keep, dx, dy); `keep` includes extra_mask, and alpha > 0
    exactly where keep (opG >= ALPHA_MIN > 0 on the kept lanes)."""
    dx = slab[ROW_X : ROW_X + 1, :] - px  # (P, K)
    dy = slab[ROW_Y : ROW_Y + 1, :] - py
    a = slab[ROW_CONIC_A : ROW_CONIC_A + 1, :]
    b = slab[ROW_CONIC_B : ROW_CONIC_B + 1, :]
    c = slab[ROW_CONIC_C : ROW_CONIC_C + 1, :]
    op = slab[ROW_OPACITY : ROW_OPACITY + 1, :]
    sigma = b * dx * dy + 0.5 * (a * dx * dx + c * dy * dy)
    G = jnp.exp(-sigma)
    opG = op * G
    keep = (sigma >= 0.0) & (opG >= ALPHA_MIN)
    if extra_mask is not None:
        keep = keep & extra_mask
    alpha = jnp.where(keep, jnp.minimum(ALPHA_MAX, opG), 0.0)
    return alpha, opG, keep, dx, dy


# --- monomial-basis sigma (opt-in, GSPLAT_BLEND_SIGMA_MM=1) ------------------
#
# sigma = 0.5*a*dx^2 + b*dx*dy + 0.5*c*dy^2 is bilinear in the pixel
# monomials [u^2, uv, v^2, u, v, 1] and a per-instance coefficient 6-vector,
# so a whole (P, K) chunk of sigmas is ONE (P,6)@(6,K) MXU matmul instead of
# ~10 VPU passes over (P, K) — the blend kernels are VPU-issue-bound
# (PERFORMANCE.md, benchmark/micro5.py). Coordinates are TILE-LOCAL
# (u = px-ox, xl = x_i-ox) so every term stays O((3*sigma/tile)^2) and the
# f32 cancellation error is bounded relative to the direct form.
#
# Near sigma == 0 (splat center) the reassociated sum can round to a tiny
# negative; the PSD-rejection test becomes sigma >= -SIGMA_MM_TOL with
# sigma clamped to >= 0, preserving the reference's intent (rejecting
# non-PSD conics, render.jl:90) without dropping center pixels.

SIGMA_MM_TOL = 1e-3


def _pixel_monomials(tile_idx, gx):
    """(P, 6) tile-local pixel monomials [u^2, uv, v^2, u, v, 1] and the
    tile origin (ox, oy) as f32 scalars."""
    tx = tile_idx % gx
    ty = tile_idx // gx
    ox = (tx * TILE).astype(jnp.float32)
    oy = (ty * TILE).astype(jnp.float32)
    k = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    u = (k % TILE).astype(jnp.float32)  # px - ox
    v = (k // TILE).astype(jnp.float32)  # py - oy
    one = jnp.ones((P, 1), jnp.float32)
    pmono = jnp.concatenate([u * u, u * v, v * v, u, v, one], axis=1)  # (P, 6)
    return pmono, ox, oy


def _chunk_coef(slab, ox, oy):
    """Per-instance sigma coefficients (6, K) in tile-local coordinates,
    plus (a, b, c, xl, yl) rows for the backward recombination."""
    a = slab[ROW_CONIC_A : ROW_CONIC_A + 1, :]
    b = slab[ROW_CONIC_B : ROW_CONIC_B + 1, :]
    c = slab[ROW_CONIC_C : ROW_CONIC_C + 1, :]
    xl = slab[ROW_X : ROW_X + 1, :] - ox  # (1, K)
    yl = slab[ROW_Y : ROW_Y + 1, :] - oy
    coef = jnp.concatenate(
        [
            0.5 * a,
            b,
            0.5 * c,
            -(a * xl + b * yl),
            -(b * xl + c * yl),
            0.5 * a * xl * xl + b * xl * yl + 0.5 * c * yl * yl,
        ],
        axis=0,
    )  # (6, K)
    return coef, a, b, c, xl, yl


def _chunk_alpha_mm(slab, pmono, coef, extra_mask=None):
    """Matmul-basis alpha: same contract as _chunk_alpha (without dx/dy).
    Also returns sigma (the backward masks d alpha/d sigma where the
    sigma>=0 clamp is active)."""
    sigma = jax.lax.dot_general(
        pmono, coef, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )  # (P, K)
    op = slab[ROW_OPACITY : ROW_OPACITY + 1, :]
    G = jnp.exp(-jnp.maximum(sigma, 0.0))
    opG = op * G
    keep = (sigma >= -SIGMA_MM_TOL) & (opG >= ALPHA_MIN)
    if extra_mask is not None:
        keep = keep & extra_mask
    alpha = jnp.where(keep, jnp.minimum(ALPHA_MAX, opG), 0.0)
    return alpha, opG, keep, sigma


def _tri(k, cmp, dtype=jnp.float32):
    r = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return cmp(r, c).astype(dtype)


def _mm(x, m):
    """x (P,K) @ m (K,K) -> (P,K) on the MXU."""
    return jax.lax.dot_general(x, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Table repack (I_pad, F_PAD) <-> (F_PAD, I_pad)
#
# The public table is (I_pad, F_PAD) — the shape the one-row-gather produces —
# but its 16-wide minor dim is lane-padded to 128 physically, so the blend
# kernels consume the transposed (F_PAD, I_pad) orientation, whose layout is
# compact. The transpose runs as its own VMEM-blocked Pallas kernel because
# XLA folds a plain `jnp.transpose` into the custom call's operand *layout*
# (ANY/HBM operands accept arbitrary layouts), which breaks the DMA slabs.
# ---------------------------------------------------------------------------

_REPACK_BLOCK = 8 * CHUNK  # I_pad is rounded to this in ops/tiles.py


def _repack_to_kernel(inst):
    """(I_pad, F_PAD) -> (F_PAD, I_pad), materialized compact."""
    i_pad = inst.shape[0]

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    return pl.pallas_call(
        kernel,
        grid=(i_pad // _REPACK_BLOCK,),
        in_specs=[
            pl.BlockSpec((_REPACK_BLOCK, F_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (F_PAD, _REPACK_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((F_PAD, i_pad), jnp.float32),
        interpret=_interpret(),
    )(inst)


def _repack_from_kernel(instT):
    """(F_PAD, I_pad) -> (I_pad, F_PAD)."""
    i_pad = instT.shape[1]

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    return pl.pallas_call(
        kernel,
        grid=(i_pad // _REPACK_BLOCK,),
        in_specs=[
            pl.BlockSpec((F_PAD, _REPACK_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (_REPACK_BLOCK, F_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((i_pad, F_PAD), jnp.float32),
        interpret=_interpret(),
    )(instT)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    tile_ids_ref,  # (T,) i32 scalar prefetch: GLOBAL tile index per grid step
    tile_start_ref,  # (T,) i32 scalar prefetch
    tile_count_ref,  # (T,) i32 scalar prefetch
    inst_ref,  # (F_PAD, I_pad) f32 in HBM/ANY (kernel-side transposed table)
    out_ref,  # (1, OUT_ROWS, P) f32 per-tile packed output
    slab_ref,  # VMEM (2, F_PAD, CHUNK) double buffer
    dma_sem,  # DMA sems (2,)
    *,
    gx: int,
    n_feat: int,
    i_pad: int,
    sigma_mm: bool = False,
    sub_align: bool = False,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    # Sub-chunk alignment (forward-only render tables, align < CHUNK): the
    # tile's instances start at lane `base` of the enclosing CHUNK-aligned
    # slab window; DMA offsets stay CHUNK-aligned and the rank masks shift
    # by `base`. Leading lanes belong to the PREVIOUS tile — the in_count
    # lower bound excludes them (their alpha select zeroes everything).
    if sub_align:
        astart = (start // jnp.int32(CHUNK)) * jnp.int32(CHUNK)
        base = start - astart
    else:
        astart = start
        base = jnp.int32(0)
    nc = pl.cdiv(base + count, jnp.int32(CHUNK))
    max_off = i_pad - CHUNK

    if sigma_mm:
        pmono, ox, oy = _pixel_monomials(tile_ids_ref[t], gx)
    else:
        px, py = _pixel_coords(tile_ids_ref[t], gx)
    tri_incl = _tri(CHUNK, lambda r, c: r <= c)  # x @ tri = inclusive cumsum
    rank1 = 1 + jax.lax.broadcasted_iota(jnp.int32, (P, CHUNK), 1)  # (P,K) 1-based

    def get_dma(j, slot):
        off = jnp.clip(astart + j * CHUNK, 0, max_off)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(pl.multiple_of(off, CHUNK), CHUNK)],
            slab_ref.at[slot],
            dma_sem.at[slot],
        )

    get_dma(0, 0).start()

    def cond(carry):
        j, _color, _logT, done, _contrib = carry
        # `done` is a f32 0/1 mask: Mosaic cannot carry i1 vectors through
        # scf.while yields.
        return (j < nc) & (jnp.min(done) < 0.5)

    def body(carry):
        j, color, logT, done, contrib = carry
        slot = j % jnp.int32(2)
        get_dma(j + 1, 1 - slot).start()
        get_dma(j, slot).wait()
        slab = slab_ref[slot]  # (F_PAD, CHUNK)

        # Lane window of this tile's instances in chunk j: 1-based tile rank
        # = rank1 + j*CHUNK - base, valid in [1, count].
        in_count = rank1 <= base + count - j * CHUNK  # scalar sub, one cmp
        if sub_align:
            in_count &= rank1 > base - j * CHUNK
        if sigma_mm:
            coef = _chunk_coef(slab, ox, oy)[0]
            alpha, _opG, keep, _sig = _chunk_alpha_mm(
                slab, pmono, coef, extra_mask=in_count
            )
        else:
            alpha, _opG, keep, _dx, _dy = _chunk_alpha(
                slab, px, py, extra_mask=in_count
            )

        log1m = jnp.log1p(-alpha)  # 0 for dead lanes
        s_incl = _mm(log1m, tri_incl)  # (P,K) inclusive cumsum
        logT_incl = logT + s_incl  # (P,K)
        not_term = logT_incl >= LOG_T_EPS  # shared by include AND term
        include = keep & not_term & (done < 0.5)
        T_before = jnp.exp(logT + (s_incl - log1m))
        w = jnp.where(include, alpha * T_before, 0.0)  # (P,K)

        feat = slab[ROW_FEAT : ROW_FEAT + n_feat, :]  # (C,K)
        # (C,K) x (P,K) contracting K -> (C,P)
        c_add = jax.lax.dot_general(
            feat, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )
        color = color + c_add

        c_chunk = jnp.max(jnp.where(include, rank1, 0), axis=1, keepdims=True)
        contrib = jnp.maximum(
            contrib, jnp.where(c_chunk > 0, c_chunk + j * CHUNK - base, 0)
        )
        term = (keep & ~not_term).astype(jnp.float32)
        done = jnp.maximum(done, jnp.max(term, axis=1, keepdims=True))
        logT = logT + jnp.sum(jnp.where(include, log1m, 0.0), axis=1, keepdims=True)
        return j + 1, color, logT, done, contrib

    init = (
        jnp.int32(0),
        jnp.zeros((n_feat, P), jnp.float32),
        jnp.zeros((P, 1), jnp.float32),  # log T
        jnp.zeros((P, 1), jnp.float32),  # done mask (f32 0/1)
        jnp.zeros((P, 1), jnp.int32),
    )
    j_end, color, logT, done, contrib = jax.lax.while_loop(cond, body, init)
    # Exactly one DMA is still in flight (started for j_end); retire it.
    get_dma(j_end, j_end % jnp.int32(2)).wait()

    out_ref[0, 0:n_feat, :] = color
    out_ref[0, n_feat : n_feat + 1, :] = jnp.exp(logT).T
    out_ref[0, n_feat + 1 : n_feat + 2, :] = contrib.astype(jnp.float32).T
    out_ref[0, n_feat + 2 :, :] = jnp.zeros((OUT_ROWS - n_feat - 2, P), jnp.float32)


def _fwd_kernel_tb(
    tile_ids_ref,  # (T_pad,) i32 scalar prefetch
    tile_start_ref,
    tile_count_ref,
    inst_ref,  # (F_PAD, I_pad) ANY
    out_ref,  # (TB, OUT_ROWS, P)
    slab_ref,  # VMEM (2, TB, F_PAD, CHUNK)
    dma_sem,  # DMA sems (2, TB)
    *,
    gx: int,
    n_feat: int,
    i_pad: int,
    tb: int,
    sigma_mm: bool = False,
    sub_align: bool = False,
):
    """Forward blend with TB tiles per grid step: amortizes the ~0.7 us
    per-grid-step fixed cost (benchmark/micro5.py) over TB tiles. The chunk
    loop runs to the MAX chunk count of the batch; tiles that ran out mark
    themselves done so early exit still fires."""
    t = pl.program_id(0)
    max_off = i_pad - CHUNK
    starts = [tile_start_ref[t * tb + b] for b in range(tb)]
    counts = [tile_count_ref[t * tb + b] for b in range(tb)]
    if sub_align:  # see _fwd_kernel: lane-offset ranks in aligned slabs
        astarts = [(s // jnp.int32(CHUNK)) * jnp.int32(CHUNK) for s in starts]
        bases = [s - a for s, a in zip(starts, astarts)]
    else:
        astarts = starts
        bases = [jnp.int32(0)] * tb
    ncs = [pl.cdiv(bs + c, jnp.int32(CHUNK)) for bs, c in zip(bases, counts)]
    nc = functools.reduce(jnp.maximum, ncs)
    if sigma_mm:
        monos = [_pixel_monomials(tile_ids_ref[t * tb + b], gx) for b in range(tb)]
    else:
        coords = [_pixel_coords(tile_ids_ref[t * tb + b], gx) for b in range(tb)]
    tri_incl = _tri(CHUNK, lambda r, c: r <= c)
    rank1 = 1 + jax.lax.broadcasted_iota(jnp.int32, (P, CHUNK), 1)

    def get_dma(j, slot, b):
        off = jnp.clip(astarts[b] + j * CHUNK, 0, max_off)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(pl.multiple_of(off, CHUNK), CHUNK)],
            slab_ref.at[slot, b],
            dma_sem.at[slot, b],
        )

    for b in range(tb):
        get_dma(0, 0, b).start()

    def cond(carry):
        j, _color, _logT, done, _contrib = carry
        return (j < nc) & (jnp.min(done) < 0.5)

    def body(carry):
        j, color, logT, done, contrib = carry
        slot = j % jnp.int32(2)
        for b in range(tb):
            get_dma(j + 1, 1 - slot, b).start()
        for b in range(tb):
            get_dma(j, slot, b).wait()

        new_color, new_logT, new_done, new_contrib = [], [], [], []
        for b in range(tb):
            slab = slab_ref[slot, b]  # (F_PAD, CHUNK)
            in_count = rank1 <= bases[b] + counts[b] - j * CHUNK
            if sub_align:
                in_count &= rank1 > bases[b] - j * CHUNK
            if sigma_mm:
                pmono, ox, oy = monos[b]
                coef = _chunk_coef(slab, ox, oy)[0]
                alpha, _o, keep, _s = _chunk_alpha_mm(
                    slab, pmono, coef, extra_mask=in_count
                )
            else:
                px, py = coords[b]
                alpha, _o, keep, _dx, _dy = _chunk_alpha(
                    slab, px, py, extra_mask=in_count
                )

            log1m = jnp.log1p(-alpha)
            s_incl = _mm(log1m, tri_incl)
            logT_b = logT[b]
            logT_incl = logT_b + s_incl
            not_term = logT_incl >= LOG_T_EPS
            include = keep & not_term & (done[b] < 0.5)
            T_before = jnp.exp(logT_b + (s_incl - log1m))
            w = jnp.where(include, alpha * T_before, 0.0)

            feat = slab[ROW_FEAT : ROW_FEAT + n_feat, :]
            c_add = jax.lax.dot_general(
                feat, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            new_color.append(color[b] + c_add)
            c_chunk = jnp.max(jnp.where(include, rank1, 0), axis=1, keepdims=True)
            new_contrib.append(jnp.maximum(
                contrib[b], jnp.where(c_chunk > 0, c_chunk + j * CHUNK - bases[b], 0)
            ))
            term = (keep & ~not_term).astype(jnp.float32)
            # Out of chunks for this tile -> done (keeps early exit live).
            term = jnp.maximum(term, (j + 1 >= ncs[b]).astype(jnp.float32))
            new_done.append(jnp.maximum(done[b], jnp.max(term, axis=1, keepdims=True)))
            new_logT.append(
                logT_b + jnp.sum(jnp.where(include, log1m, 0.0), axis=1, keepdims=True)
            )
        return (
            j + 1,
            jnp.stack(new_color),
            jnp.stack(new_logT),
            jnp.stack(new_done),
            jnp.stack(new_contrib),
        )

    init = (
        jnp.int32(0),
        jnp.zeros((tb, n_feat, P), jnp.float32),
        jnp.zeros((tb, P, 1), jnp.float32),
        jnp.zeros((tb, P, 1), jnp.float32),
        jnp.zeros((tb, P, 1), jnp.int32),
    )
    j_end, color, logT, done, contrib = jax.lax.while_loop(cond, body, init)
    for b in range(tb):
        get_dma(j_end, j_end % jnp.int32(2), b).wait()

    for b in range(tb):
        out_ref[b, 0:n_feat, :] = color[b]
        out_ref[b, n_feat : n_feat + 1, :] = jnp.exp(logT[b]).T
        out_ref[b, n_feat + 1 : n_feat + 2, :] = contrib[b].astype(jnp.float32).T
        out_ref[b, n_feat + 2 :, :] = jnp.zeros((OUT_ROWS - n_feat - 2, P), jnp.float32)


def _blend_fwd_impl(
    inst, tile_start, tile_count, *, grid_wh, n_feat, tile_ids=None,
    tiles_per_step=1, sigma_mm=False, sub_align=False, algo="cm",
):
    gx, gy = grid_wh
    n_tiles = tile_start.shape[0]
    if tile_ids is None:
        tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    i_pad = inst.shape[0]
    inst = _repack_to_kernel(inst)  # (F_PAD, I_pad), compact

    tb = max(1, tiles_per_step)
    padt = (-n_tiles) % tb
    if padt:
        tile_start = jnp.pad(tile_start, (0, padt))
        tile_count = jnp.pad(tile_count, (0, padt))  # dummy tiles: count 0
        tile_ids = jnp.concatenate(
            [tile_ids, jnp.zeros((padt,), jnp.int32)]
        )
    t_pad = n_tiles + padt

    unsort = None
    if tb > 1:
        # Each TB grid step runs max(count over its tiles) chunk iterations;
        # batching tiles of SIMILAR count minimizes the padding waste
        # (sum of per-group maxima -> sum of means as groups homogenize).
        # Descending count order also front-loads the heavy tiles.
        order = jnp.argsort(-tile_count)
        tile_start = jnp.take(tile_start, order)
        tile_count = jnp.take(tile_count, order)
        tile_ids = jnp.take(tile_ids, order)
        unsort = jnp.argsort(order)

    if algo == "pm":
        import os

        grp = int(os.environ.get("GSPLAT_BLEND_PM_GROUP", "8"))
        assert grp in (8, 16, 32), grp  # must divide the 32-slot sub-align
        kernel = functools.partial(
            _fwd_kernel_pm, gx=gx, n_feat=n_feat, i_pad=i_pad, tb=tb, grp=grp,
        )
        out_spec = pl.BlockSpec(
            (tb, OUT_ROWS, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        )
        scratch = [
            pltpu.VMEM((2, tb, F_PAD, CHUNK), jnp.float32),
            pltpu.VMEM((CHUNK, F_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA((2, tb)),
        ]
    elif tb == 1:
        kernel = functools.partial(
            _fwd_kernel, gx=gx, n_feat=n_feat, i_pad=i_pad, sigma_mm=sigma_mm,
            sub_align=sub_align,
        )
        out_spec = pl.BlockSpec(
            (1, OUT_ROWS, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        )
        scratch = [
            pltpu.VMEM((2, F_PAD, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel = functools.partial(
            _fwd_kernel_tb, gx=gx, n_feat=n_feat, i_pad=i_pad, tb=tb,
            sigma_mm=sigma_mm, sub_align=sub_align,
        )
        out_spec = pl.BlockSpec(
            (tb, OUT_ROWS, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        )
        scratch = [
            pltpu.VMEM((2, tb, F_PAD, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, tb)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // tb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    packed = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, OUT_ROWS, P), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(tile_ids, tile_start, tile_count, inst)

    if unsort is not None:
        packed = jnp.take(packed, unsort, axis=0)
    packed = packed[:n_tiles]
    color = packed[:, :n_feat, :].transpose(0, 2, 1)  # (T, P, C)
    T_final = packed[:, n_feat, :]  # (T, P)
    n_contrib = packed[:, n_feat + 1, :].astype(jnp.int32)
    return color, T_final, n_contrib


# ---------------------------------------------------------------------------
# Pixel-major forward ("pm"): sparse-tile kernel
#
# The chunk-major kernels put instances on LANES: every tile visit pays
# (P=256, K=128) vector passes even when the tile holds a handful of real
# instances — at a 1080p grid the mean tile has ~30 instances, so ~77% of
# every vector op is masked-lane waste (benchmark/micro15.py: the blend is
# 12.4 of 20.2 ms). This kernel flips the layout: the tile's 256 PIXELS ride
# the lanes (dense by construction) and instances advance in 8-wide SUBLANE
# groups, so a 30-instance tile runs 4 group iterations of (8, 256) ops
# instead of one (256, 128) pass — the vector work scales with ceil(count/8)
# instead of ceil(count/128)*128.
#
# With only 8 instances per step, transmittance needs no log-space matmul:
# the within-group exclusive cumulative product of (1 - alpha) is three
# rolled multiplies (Hillis-Steele over sublanes), and the only
# transcendental left is exp(-sigma). T is carried linearly per tile
# (f32 holds 1e-4..1 fine; termination quenches it long before denormals).
#
# Forward-only: the backward needs the chunk-major disjoint-slab writes.
# Selected automatically for sub-chunk (render) tables — see blend_pallas().
# ---------------------------------------------------------------------------


def _fwd_kernel_pm(
    tile_ids_ref,  # (T_pad,) i32 scalar prefetch
    tile_start_ref,
    tile_count_ref,
    inst_ref,  # (F_PAD, I_pad) ANY
    out_ref,  # (TB, OUT_ROWS, P)
    slab_ref,  # VMEM (2, TB, F_PAD, CHUNK)
    st_ref,  # VMEM (CHUNK, F_PAD) transposed slab (reused across b)
    dma_sem,  # (2, TB)
    *,
    gx: int,
    n_feat: int,
    i_pad: int,
    tb: int,
    grp: int = 8,
):
    t = pl.program_id(0)
    max_off = i_pad - CHUNK
    starts = [tile_start_ref[t * tb + b] for b in range(tb)]
    counts = [tile_count_ref[t * tb + b] for b in range(tb)]
    astarts = [(s // jnp.int32(CHUNK)) * jnp.int32(CHUNK) for s in starts]
    bases = [s - a for s, a in zip(starts, astarts)]
    ncs = [pl.cdiv(bs + c, jnp.int32(CHUNK)) for bs, c in zip(bases, counts)]
    nc = functools.reduce(jnp.maximum, ncs)

    # (1, P) pixel-center coords: pixels on LANES.
    def pix(b):
        tid = tile_ids_ref[t * tb + b]
        tx = tid % gx
        ty = tid // gx
        k = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        px = (tx * TILE + k % TILE).astype(jnp.float32)
        py = (ty * TILE + k // TILE).astype(jnp.float32)
        return px, py

    coords = [pix(b) for b in range(tb)]
    # `grp` instances per group iteration: wider groups trade a few masked
    # sublanes for proportionally fewer fori/cond iterations — the measured
    # loss of the 8-wide pm vs chunk-major was per-group loop overhead, not
    # vector work (PERFORMANCE.md r4 final). Must divide the 32-slot
    # sub-chunk alignment or CHUNK.
    srow = jax.lax.broadcasted_iota(jnp.int32, (grp, 1), 0)  # sublane index

    def get_dma(j, slot, b):
        off = jnp.clip(astarts[b] + j * CHUNK, 0, max_off)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(pl.multiple_of(off, CHUNK), CHUNK)],
            slab_ref.at[slot, b],
            dma_sem.at[slot, b],
        )

    for b in range(tb):
        get_dma(0, 0, b).start()

    def cond(carry):
        j, _color, _T, done, _contrib = carry
        return (j < nc) & (jnp.min(done) < 0.5)

    def body(carry):
        j, color, T, done, contrib = carry
        slot = j % jnp.int32(2)
        for b in range(tb):
            get_dma(j + 1, 1 - slot, b).start()

        new_color, new_T, new_done, new_contrib = [], [], [], []
        for b in range(tb):
            get_dma(j, slot, b).wait()
            # Transpose once per visit: instances onto sublanes.
            st_ref[:] = slab_ref[slot, b][:].T  # (CHUNK, F_PAD)
            px, py = coords[b]
            base, count = bases[b], counts[b]
            # Group window of this tile's rows within chunk j.
            lo = jnp.maximum(base - j * CHUNK, 0)
            hi = jnp.minimum(base + count - j * CHUNK, CHUNK)
            g0 = lo // grp
            g1 = pl.cdiv(jnp.maximum(hi, lo), jnp.int32(grp))

            def group(g, acc):
                color_b, T_b, done_b, contrib_b = acc

                def live(acc):
                    color_b, T_b, done_b, contrib_b = acc
                    blk = st_ref[pl.ds(pl.multiple_of(g * grp, grp), grp), :]  # (grp, F_PAD)
                    x = blk[:, ROW_X : ROW_X + 1]  # (8, 1)
                    y = blk[:, ROW_Y : ROW_Y + 1]
                    a = blk[:, ROW_CONIC_A : ROW_CONIC_A + 1]
                    bb = blk[:, ROW_CONIC_B : ROW_CONIC_B + 1]
                    c = blk[:, ROW_CONIC_C : ROW_CONIC_C + 1]
                    op = blk[:, ROW_OPACITY : ROW_OPACITY + 1]
                    dx = x - px  # (grp, P)
                    dy = y - py
                    sigma = bb * dx * dy + 0.5 * (a * dx * dx + c * dy * dy)
                    opG = op * jnp.exp(-sigma)
                    # 1-based rank within the tile (sub-chunk alignment: the
                    # tile starts `base` lanes into its first slab).
                    rank1 = j * CHUNK + g * grp + srow - base + 1  # (grp, 1)
                    keep = (
                        (sigma >= 0.0)
                        & (opG >= ALPHA_MIN)
                        & (rank1 >= 1)
                        & (rank1 <= count)
                    )
                    alpha = jnp.where(keep, jnp.minimum(ALPHA_MAX, opG), 0.0)
                    one_m = 1.0 - alpha  # 1 on dead rows
                    # Inclusive cumprod along sublanes: log2(grp) rolled
                    # multiplies (Hillis-Steele).
                    cp = one_m
                    sh = 1
                    while sh < grp:
                        cp = cp * jnp.where(
                            srow >= sh, pltpu.roll(cp, shift=sh, axis=0), 1.0
                        )
                        sh *= 2
                    T_incl = T_b * cp  # (grp, P): T after instance i
                    T_before = T_incl / one_m
                    not_term = T_incl >= TRANSMITTANCE_EPS
                    include = keep & not_term & (done_b < 0.5)
                    w = jnp.where(include, alpha * T_before, 0.0)
                    feat = blk[:, ROW_FEAT : ROW_FEAT + n_feat]  # (grp, C)
                    color_b = color_b + jax.lax.dot_general(
                        feat, w, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # (C, P)
                    c_g = jnp.max(jnp.where(include, rank1, 0), axis=0, keepdims=True)
                    contrib_b = jnp.maximum(contrib_b, c_g)
                    term = (keep & ~not_term).astype(jnp.float32)
                    done_b = jnp.maximum(
                        done_b, jnp.max(term, axis=0, keepdims=True)
                    )
                    # Product over the group of the included (1-alpha)
                    # factors. Mosaic has no reduce_prod lowering; a cyclic
                    # roll butterfly leaves the total product in every
                    # sublane after log2(grp) multiplies.
                    tp = jnp.where(include, one_m, 1.0)
                    sh = 1
                    while sh < grp:
                        tp = tp * pltpu.roll(tp, shift=sh, axis=0)
                        sh *= 2
                    T_b = T_b * tp[0:1, :]
                    return color_b, T_b, done_b, contrib_b

                # Skip the group entirely once every pixel terminated.
                return jax.lax.cond(
                    jnp.min(done_b) < 0.5, live, lambda acc: acc,
                    (color_b, T_b, done_b, contrib_b),
                )

            cb, Tb, db, nb = jax.lax.fori_loop(
                g0, g1, group, (color[b], T[b], done[b], contrib[b])
            )
            # Out of chunks -> done (keeps the while-level early exit live).
            db = jnp.maximum(db, (j + 1 >= ncs[b]).astype(jnp.float32))
            new_color.append(cb)
            new_T.append(Tb)
            new_done.append(db)
            new_contrib.append(nb)
        return (
            j + 1,
            jnp.stack(new_color),
            jnp.stack(new_T),
            jnp.stack(new_done),
            jnp.stack(new_contrib),
        )

    init = (
        jnp.int32(0),
        jnp.zeros((tb, n_feat, P), jnp.float32),
        jnp.ones((tb, 1, P), jnp.float32),  # linear T
        jnp.zeros((tb, 1, P), jnp.float32),
        jnp.zeros((tb, 1, P), jnp.int32),
    )
    j_end, color, T, done, contrib = jax.lax.while_loop(cond, body, init)
    for b in range(tb):
        get_dma(j_end, j_end % jnp.int32(2), b).wait()

    for b in range(tb):
        out_ref[b, 0:n_feat, :] = color[b]
        out_ref[b, n_feat : n_feat + 1, :] = T[b]
        out_ref[b, n_feat + 1 : n_feat + 2, :] = contrib[b].astype(jnp.float32)
        out_ref[b, n_feat + 2 :, :] = jnp.zeros((OUT_ROWS - n_feat - 2, P), jnp.float32)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_kernel(
    tile_ids_ref,
    tile_start_ref,
    tile_count_ref,
    tile_count_eff_ref,  # min(count, max_p n_contrib): replay stops where
    #                      contributions stopped (forward early termination)
    inst_ref,  # (F_PAD, I_pad) ANY (kernel-side transposed table)
    gpack_ref,  # (1, OUT_ROWS, P): rows [g_color(C) | g_T | T_final | n_contrib]
    dinst_ref,  # (F_PAD, I_pad) ANY output
    slab_ref,  # VMEM (2, F_PAD, CHUNK)
    vslab_ref,  # VMEM (2, F_PAD, CHUNK) outgoing cotangent slabs
    in_sem,
    out_sem,
    *,
    gx: int,
    n_feat: int,
    i_pad: int,
    sigma_mm: bool = False,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    # Instances ranked past every pixel's n_contrib have zero cotangents
    # (include is rank<=n_contrib per pixel) and zero effect on T, so the
    # back-to-front replay starts at the last chunk that contributed; the
    # skipped slots are zeroed by the caller's `owned` mask (render.jl's
    # backward walks from the per-tile range end instead, render.jl:132).
    nc = pl.cdiv(tile_count_eff_ref[t], jnp.int32(CHUNK))
    max_off = i_pad - CHUNK

    if sigma_mm:
        pix = _pixel_monomials(tile_ids_ref[t], gx)
    else:
        pix = _pixel_coords(tile_ids_ref[t], gx) + _pixel_monomials(
            tile_ids_ref[t], gx
        )
    sfx_incl = _tri(CHUNK, lambda r, c: r >= c)  # x @ . = inclusive suffix sum
    sfx_excl = _tri(CHUNK, lambda r, c: r > c)  # x @ . = exclusive suffix sum
    lane1 = 1 + jax.lax.broadcasted_iota(jnp.int32, (P, CHUNK), 1)

    g_color = gpack_ref[0, 0:n_feat, :]  # (C, P)
    g_T = gpack_ref[0, n_feat : n_feat + 1, :].T  # (P, 1)
    T_final = gpack_ref[0, n_feat + 1 : n_feat + 2, :].T  # (P, 1)
    n_contrib = gpack_ref[0, n_feat + 2 : n_feat + 3, :].T.astype(jnp.int32)  # (P, 1)

    def in_dma(j, slot):
        off = jnp.clip(start + j * CHUNK, 0, max_off)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(pl.multiple_of(off, CHUNK), CHUNK)],
            slab_ref.at[slot],
            in_sem.at[slot],
        )

    def out_dma(j, slot):
        off = jnp.clip(start + j * CHUNK, 0, max_off)
        return pltpu.make_async_copy(
            vslab_ref.at[slot],
            dinst_ref.at[:, pl.ds(pl.multiple_of(off, CHUNK), CHUNK)],
            out_sem.at[slot],
        )

    # Chunks processed back-to-front: iteration i handles chunk j = nc-1-i.
    @pl.when(nc >= 1)
    def _():
        in_dma(nc - 1, 0).start()

    gT_term = g_T * T_final  # (P,1)

    def body(i, carry):
        logT_after, s_carry = carry  # (P,1), (P,1)
        j = nc - 1 - i
        slot = i % jnp.int32(2)

        @pl.when(i + 1 < nc)
        def _():
            in_dma(j - 1, 1 - slot).start()

        in_dma(j, slot).wait()
        slab = slab_ref[slot]  # (F_PAD, CHUNK)

        vfull, logT_after, s_carry = _bwd_chunk_math(
            slab, pix, g_color, gT_term, n_contrib, count, j, lane1,
            sfx_incl, sfx_excl, logT_after, s_carry,
            sigma_mm=sigma_mm, n_feat=n_feat,
        )

        # The same vslab slot was DMA'd out two iterations ago; reclaim it.
        @pl.when(i >= 2)
        def _():
            out_dma(j + 2, slot).wait()

        vslab_ref[slot] = vfull
        out_dma(j, slot).start()
        return logT_after, s_carry

    logT_final = jnp.log(jnp.maximum(T_final, 1e-30))
    jax.lax.fori_loop(0, nc, body, (logT_final, jnp.zeros((P, 1), jnp.float32)))
    # Retire the last (up to two) outgoing DMAs.
    @pl.when(nc >= 2)
    def _():
        out_dma(1, (nc - 2) % jnp.int32(2)).wait()

    @pl.when(nc >= 1)
    def _():
        out_dma(0, (nc - 1) % jnp.int32(2)).wait()


def _bwd_chunk_math(
    slab, pix, g_color, gT_term, n_contrib, count, j, lane1,
    sfx_incl, sfx_excl, logT_after, s_carry, *, sigma_mm: bool, n_feat: int,
):
    """One chunk of the back-to-front replay: reconstruct per-instance
    transmittance from the running logT, compute every cotangent row, and
    advance the (logT_after, s_carry) recurrence. `pix` is the precomputed
    (pmono, ox, oy) monomials in sigma_mm mode, else
    (px, py, pmono, ox, oy) — the direct mode also carries the tile-local
    monomials because its five conic/mean pixel reductions are recombined
    from ONE (6,P)@(P,K) matmul (the sigma_mm recombination) instead of
    ~16 VPU passes of (P,K) multiply+reduce.
    Returns (vfull (F_PAD, CHUNK), new_logT_after, new_s_carry)."""
    # Replay bound per lane: within count AND within some pixel's n_contrib
    # (lane1 is chunk-local; the bases are scalar / (P,1) subs).
    in_mask = (lane1 <= count - j * CHUNK) & (lane1 <= n_contrib - j * CHUNK)
    if sigma_mm:
        pmono, ox, oy = pix
        coef, ca, cb, cc, xl, yl = _chunk_coef(slab, ox, oy)
        alpha, opG, keep, sigma = _chunk_alpha_mm(
            slab, pmono, coef, extra_mask=in_mask
        )
    else:
        px, py, pmono, ox, oy = pix
        alpha, opG, keep, _dx, _dy = _chunk_alpha(
            slab, px, py, extra_mask=in_mask
        )

    log1m = jnp.log1p(-alpha)
    ss = _mm(log1m, sfx_incl)  # (P,K) inclusive suffix sum
    # T just before instance i = T_after_chunk / prod_{j>=i}(1-a_j)
    T_before = jnp.exp(logT_after - ss)
    w = alpha * T_before  # (P,K), zero where excluded (alpha 0 there)

    feat = slab[ROW_FEAT : ROW_FEAT + n_feat, :]  # (C,K)
    # gf[p,k] = sum_c g_color[c,p] * feat[c,k]
    gf = jax.lax.dot_general(
        g_color, feat, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )  # (P,K)
    wgf = w * gf
    # suffix sum of later contributions: within-chunk exclusive + carry
    s_i = _mm(wgf, sfx_excl) + s_carry  # (P,K)

    one_m = 1.0 - alpha
    # alpha = min(0.99, op*G): zero grad on the clamped branch
    # (matches blend_scan; diverges from render.jl:234 — see module doc).
    v_opG = jnp.where(
        keep & (opG < ALPHA_MAX),
        T_before * gf - (s_i + gT_term) / one_m,
        0.0,
    )
    op = slab[ROW_OPACITY : ROW_OPACITY + 1, :]
    safe_op = jnp.where(op > 0.0, op, 1.0)
    G = opG / safe_op
    v_op = jnp.sum(v_opG * G, axis=0, keepdims=True)  # (1,K)
    v_sigma = -v_opG * opG  # (P,K): d alpha/d sigma = -op*G

    if sigma_mm:
        # The clamp G = exp(-max(sigma, 0)) has zero slope on the
        # clamped (sigma <= 0) branch.
        v_sigma = jnp.where(sigma > 0.0, v_sigma, 0.0)
    else:
        ca = slab[ROW_CONIC_A : ROW_CONIC_A + 1, :]
        cb = slab[ROW_CONIC_B : ROW_CONIC_B + 1, :]
        cc = slab[ROW_CONIC_C : ROW_CONIC_C + 1, :]
        xl = slab[ROW_X : ROW_X + 1, :] - ox  # (1, K) tile-local
        yl = slab[ROW_Y : ROW_Y + 1, :] - oy
    # All five pixel reductions from ONE (6,P)@(P,K) matmul:
    # vm rows = sums of v_sigma * [u^2, uv, v^2, u, v, 1] (tile-local).
    vm = jax.lax.dot_general(
        pmono, v_sigma, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (6, K)
    vm0, vm1, vm2 = vm[0:1, :], vm[1:2, :], vm[2:3, :]
    vm3, vm4, vm5 = vm[3:4, :], vm[4:5, :], vm[5:6, :]
    # dx = xl - u, dy = yl - v (tile-local): expand each sum.
    v_a = 0.5 * (xl * xl * vm5 - 2.0 * xl * vm3 + vm0)
    v_b = xl * yl * vm5 - xl * vm4 - yl * vm3 + vm1
    v_c = 0.5 * (yl * yl * vm5 - 2.0 * yl * vm4 + vm2)
    sx = xl * vm5 - vm3  # sum v_sigma * dx
    sy = yl * vm5 - vm4  # sum v_sigma * dy
    v_x = ca * sx + cb * sy
    v_y = cb * sx + cc * sy
    # v_feat[c,k] = sum_p g_color[c,p] * w[p,k]
    v_feat = jax.lax.dot_general(
        g_color, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )  # (C,K)

    vfull = jnp.concatenate(
        [
            v_x, v_y, v_a, v_b, v_c, v_op, v_feat,
            jnp.zeros((F_PAD - ROW_FEAT - n_feat, CHUNK), jnp.float32),
        ],
        axis=0,
    )  # (F_PAD, CHUNK)
    new_logT_after = logT_after - jnp.sum(log1m, axis=1, keepdims=True)
    new_s_carry = s_carry + jnp.sum(wgf, axis=1, keepdims=True)
    return vfull, new_logT_after, new_s_carry


def _bwd_kernel_tb(
    tile_ids_ref,
    tile_start_ref,
    tile_count_ref,
    tile_count_eff_ref,
    inst_ref,  # (F_PAD, I_pad) ANY
    gpack_ref,  # (TB, OUT_ROWS, P)
    dinst_ref,  # (F_PAD, I_pad) ANY output
    slab_ref,  # VMEM (2, TB, F_PAD, CHUNK)
    vslab_ref,  # VMEM (2, TB, F_PAD, CHUNK)
    in_sem,  # (2, TB)
    out_sem,  # (2, TB)
    *,
    gx: int,
    n_feat: int,
    i_pad: int,
    tb: int,
    sigma_mm: bool = False,
):
    """Backward blend with TB tiles per grid step (amortizes the per-tile
    fixed grid-step cost like _fwd_kernel_tb). All TB tiles walk their own
    back-to-front chunk sequence in lockstep iterations; a tile whose
    (shorter) sequence is exhausted masks its compute and — critically —
    its OUTGOING DMA (a clamped write would land on chunk 0's region after
    the correct value and clobber it)."""
    t = pl.program_id(0)
    starts = [tile_start_ref[t * tb + b] for b in range(tb)]
    counts = [tile_count_ref[t * tb + b] for b in range(tb)]
    ncs = [
        pl.cdiv(tile_count_eff_ref[t * tb + b], jnp.int32(CHUNK)) for b in range(tb)
    ]
    nc = functools.reduce(jnp.maximum, ncs)
    max_off = i_pad - CHUNK

    if sigma_mm:
        pixs = [_pixel_monomials(tile_ids_ref[t * tb + b], gx) for b in range(tb)]
    else:
        pixs = [
            _pixel_coords(tile_ids_ref[t * tb + b], gx)
            + _pixel_monomials(tile_ids_ref[t * tb + b], gx)
            for b in range(tb)
        ]
    sfx_incl = _tri(CHUNK, lambda r, c: r >= c)
    sfx_excl = _tri(CHUNK, lambda r, c: r > c)
    lane1 = 1 + jax.lax.broadcasted_iota(jnp.int32, (P, CHUNK), 1)

    g_colors = [gpack_ref[b, 0:n_feat, :] for b in range(tb)]
    g_Ts = [gpack_ref[b, n_feat : n_feat + 1, :].T for b in range(tb)]
    T_finals = [gpack_ref[b, n_feat + 1 : n_feat + 2, :].T for b in range(tb)]
    n_contribs = [
        gpack_ref[b, n_feat + 2 : n_feat + 3, :].T.astype(jnp.int32)
        for b in range(tb)
    ]
    gT_terms = [g_Ts[b] * T_finals[b] for b in range(tb)]

    def in_dma(b, j, slot):
        off = jnp.clip(starts[b] + j * CHUNK, 0, max_off)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(pl.multiple_of(off, CHUNK), CHUNK)],
            slab_ref.at[slot, b],
            in_sem.at[slot, b],
        )

    def out_dma(b, j, slot):
        off = jnp.clip(starts[b] + j * CHUNK, 0, max_off)
        return pltpu.make_async_copy(
            vslab_ref.at[slot, b],
            dinst_ref.at[:, pl.ds(pl.multiple_of(off, CHUNK), CHUNK)],
            out_sem.at[slot, b],
        )

    for b in range(tb):
        @pl.when(ncs[b] >= 1)
        def _(b=b):
            in_dma(b, ncs[b] - 1, 0).start()

    def body(i, carry):
        logTs, s_carries = carry  # each (TB, P, 1)
        slot = i % jnp.int32(2)
        new_logTs, new_s = [], []
        for b in range(tb):
            j = ncs[b] - 1 - i  # this tile's chunk; < 0 once exhausted

            @pl.when(i + 1 < ncs[b])
            def _(b=b, j=j):
                in_dma(b, j - 1, 1 - slot).start()

            @pl.when(j >= 0)
            def _(b=b, j=j):
                in_dma(b, j, slot).wait()

            slab = slab_ref[slot, b]
            vfull, lT, sc = _bwd_chunk_math(
                slab, pixs[b], g_colors[b], gT_terms[b], n_contribs[b],
                counts[b], j, lane1, sfx_incl, sfx_excl,
                logTs[b], s_carries[b], sigma_mm=sigma_mm, n_feat=n_feat,
            )
            active = j >= 0
            new_logTs.append(jnp.where(active, lT, logTs[b]))
            new_s.append(jnp.where(active, sc, s_carries[b]))

            # Reclaim this slot's previous write (chunk j+2) before
            # overwriting vslab[slot, b]. Only needed when this tile is
            # about to write (j >= 0); then i >= 2 implies chunk j+2 was
            # started two iterations ago (0 <= j+2 <= ncs[b]-1 follows).
            # Chunks 0 and 1 are never reclaimed here — the retirement
            # loop below waits for exactly those two.
            @pl.when((i >= 2) & (j >= 0))
            def _(b=b, j=j):
                out_dma(b, j + 2, slot).wait()

            @pl.when(active)
            def _(b=b, j=j, vfull=vfull):
                vslab_ref[slot, b] = vfull
                out_dma(b, j, slot).start()

        return jnp.stack(new_logTs), jnp.stack(new_s)

    logT0 = jnp.stack([jnp.log(jnp.maximum(T_finals[b], 1e-30)) for b in range(tb)])
    s0 = jnp.zeros((tb, P, 1), jnp.float32)
    jax.lax.fori_loop(0, nc, body, (logT0, s0))
    # Retire each tile's last (up to two) outgoing DMAs.
    for b in range(tb):
        @pl.when(ncs[b] >= 2)
        def _(b=b):
            out_dma(b, 1, (ncs[b] - 2) % jnp.int32(2)).wait()

        @pl.when(ncs[b] >= 1)
        def _(b=b):
            out_dma(b, 0, (ncs[b] - 1) % jnp.int32(2)).wait()


def _blend_bwd_impl(
    inst, tile_start, tile_count, tile_count_eff, gpack, *, grid_wh, n_feat,
    tile_ids=None, sigma_mm=False, tiles_per_step=1,
):
    gx, gy = grid_wh
    n_tiles = tile_start.shape[0]
    if tile_ids is None:
        tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    i_pad = inst.shape[0]
    inst = _repack_to_kernel(inst)  # (F_PAD, I_pad), compact

    tb = max(1, tiles_per_step)
    padt = (-n_tiles) % tb
    if padt:  # dummy tiles: eff count 0 -> no DMAs, no writes
        tile_start = jnp.pad(tile_start, (0, padt))
        tile_count = jnp.pad(tile_count, (0, padt))
        tile_count_eff = jnp.pad(tile_count_eff, (0, padt))
        tile_ids = jnp.concatenate([tile_ids, jnp.zeros((padt,), jnp.int32)])
        gpack = jnp.pad(gpack, ((0, padt), (0, 0), (0, 0)))
    t_pad = n_tiles + padt

    if tb > 1:
        # Same padding-waste argument as the forward: group tiles of
        # similar replay length (no output to unsort — dinst writes land
        # at each tile's own slab range regardless of processing order).
        order = jnp.argsort(-tile_count_eff)
        tile_start = jnp.take(tile_start, order)
        tile_count = jnp.take(tile_count, order)
        tile_count_eff = jnp.take(tile_count_eff, order)
        tile_ids = jnp.take(tile_ids, order)
        gpack = jnp.take(gpack, order, axis=0)

    if tb == 1:
        kernel = functools.partial(
            _bwd_kernel, gx=gx, n_feat=n_feat, i_pad=i_pad, sigma_mm=sigma_mm
        )
        gpack_spec = pl.BlockSpec(
            (1, OUT_ROWS, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        )
        scratch = [
            pltpu.VMEM((2, F_PAD, CHUNK), jnp.float32),
            pltpu.VMEM((2, F_PAD, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel = functools.partial(
            _bwd_kernel_tb, gx=gx, n_feat=n_feat, i_pad=i_pad, tb=tb,
            sigma_mm=sigma_mm,
        )
        gpack_spec = pl.BlockSpec(
            (tb, OUT_ROWS, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        )
        scratch = [
            pltpu.VMEM((2, tb, F_PAD, CHUNK), jnp.float32),
            pltpu.VMEM((2, tb, F_PAD, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, tb)),
            pltpu.SemaphoreType.DMA((2, tb)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(t_pad // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            gpack_spec,
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F_PAD, i_pad), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True
        ),
        interpret=_interpret(),
    )(tile_ids, tile_start, tile_count, tile_count_eff, inst, gpack)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _blend(
    inst, tile_start, tile_count, tile_ids, grid_wh, n_feat, chunk,
    tiles_per_step, sigma_mm, algo,
):
    return _blend_fwd_impl(
        inst, tile_start, tile_count, grid_wh=grid_wh, n_feat=n_feat,
        tile_ids=tile_ids, tiles_per_step=tiles_per_step, sigma_mm=sigma_mm,
        sub_align=chunk < CHUNK, algo=algo,
    )


def _vjp_fwd(
    inst, tile_start, tile_count, tile_ids, grid_wh, n_feat, chunk,
    tiles_per_step, sigma_mm, algo,
):
    color, T_final, n_contrib = _blend_fwd_impl(
        inst, tile_start, tile_count, grid_wh=grid_wh, n_feat=n_feat,
        tile_ids=tile_ids, tiles_per_step=tiles_per_step, sigma_mm=sigma_mm,
        sub_align=chunk < CHUNK, algo=algo,
    )
    return (color, T_final, n_contrib), (
        inst, tile_start, tile_count, tile_ids, T_final, n_contrib
    )


def _vjp_bwd(grid_wh, n_feat, chunk, tiles_per_step, sigma_mm, algo, res, g):
    # `algo` only selects the forward spelling; the residuals (table, layout,
    # T_final, n_contrib) are identical, and the backward is always the
    # chunk-major replay (the pm layout has no disjoint-slab write scheme).
    if chunk != CHUNK:
        raise NotImplementedError(
            "The Pallas backward blend requires CHUNK-aligned tables: its "
            "atomics-free cotangent writes are whole disjoint slabs per "
            "tile. Sub-chunk alignment (RasterizerConfig chunk < 128) is a "
            "forward-only render optimization — train with chunk=128."
        )
    inst, tile_start, tile_count, tile_ids, T_final, n_contrib = res
    g_color, g_T, _g_contrib = g
    n_tiles = T_final.shape[0]
    pad = OUT_ROWS - n_feat - 3
    gpack = jnp.concatenate(
        [
            g_color.transpose(0, 2, 1),  # (T, C, P)
            g_T[:, None, :],
            T_final[:, None, :],
            n_contrib.astype(jnp.float32)[:, None, :],
            jnp.zeros((n_tiles, pad, P), jnp.float32),
        ],
        axis=1,
    )
    # Replay only up to the last contributing chunk of each tile: ranks past
    # max_p n_contrib have zero cotangents (forward early termination), so
    # the kernel skips them and the `owned` mask below zeroes their slots.
    tile_count_eff = jnp.minimum(tile_count, jnp.max(n_contrib, axis=1))
    dinst = _repack_from_kernel(
        _blend_bwd_impl(
            inst, tile_start, tile_count, tile_count_eff, gpack,
            grid_wh=grid_wh, n_feat=n_feat, tile_ids=tile_ids,
            sigma_mm=sigma_mm, tiles_per_step=tiles_per_step,
        )
    )
    # Slots outside every processed tile's written range are never touched by
    # the kernel (their forward contribution is exactly zero): mask the
    # uninitialized garbage. Membership is a start/end difference array —
    # correct both for the single-device prefix layout and for tile-sharded
    # calls whose tiles sit at scattered global offsets.
    i_pad = inst.shape[0]
    pcount = -(-tile_count_eff // CHUNK) * CHUNK
    delta = (
        jnp.zeros((i_pad + 1,), jnp.int32)
        .at[jnp.clip(tile_start, 0, i_pad)].add(jnp.where(pcount > 0, 1, 0))
        .at[jnp.clip(tile_start + pcount, 0, i_pad)].add(jnp.where(pcount > 0, -1, 0))
    )
    owned = jnp.cumsum(delta)[:i_pad] > 0
    dinst = jnp.where(owned[:, None], dinst, 0.0)
    return dinst, None, None, None


_blend.defvjp(_vjp_fwd, _vjp_bwd)


_blend_jit = jax.jit(_blend, static_argnums=(4, 5, 6, 7, 8, 9))

# Forward tiles-per-grid-step batching: amortizes the per-grid-step fixed
# cost (micro5: ~0.7 us/tile). Default 1 until validated on real hardware;
# override per-call or via GSPLAT_BLEND_TB.
DEFAULT_TILES_PER_STEP = 1
DEFAULT_TILES_PER_STEP_PM = 8  # pm visits are ~3x lighter; amortize harder

_pm_lowers_cache = None


def _pm_lowers() -> bool:
    """One-time eager probe: does Mosaic lower the pm kernel's ingredients
    (pltpu.roll over sublanes, reduce-multiply, dynamic-trip fori, the
    in-VMEM slab transpose, (8,C)x(8,P) dots)? Interpret mode always passes.
    Uses the AOT path (jit(...).lower(...).compile()) and executes the
    compiled artifact directly: on some platforms (axon) BOTH eager pallas
    dispatch AND a jit call made under ensure_compile_time_eval route the
    kernel body through JAX's eval trace and die on 'program_id' before
    Mosaic ever sees the kernel — the r4/r5 benches silently fell back to
    chunk-major because of exactly that. Lower/compile never consults the
    ambient trace, so the probe reports the REAL Mosaic verdict (this is
    how the r5 reduce_prod gap was finally caught). On failure the caller
    falls back to the chunk-major forward, which handles every alignment."""
    global _pm_lowers_cache
    if _pm_lowers_cache is None:
        if _interpret():
            _pm_lowers_cache = True
            return True
        try:
            import functools

            inst = np.zeros((_REPACK_BLOCK, F_PAD), np.float32)
            starts = np.array([0, 32], np.int32)  # sub-aligned tile 1
            counts = np.full((2,), 24, np.int32)
            compiled = jax.jit(functools.partial(
                _blend_fwd_impl, grid_wh=(2, 1), n_feat=3,
                tiles_per_step=2, algo="pm",
            )).lower(inst, starts, counts).compile()
            out = compiled(inst, starts, counts)
            jax.block_until_ready(out[0])
            _pm_lowers_cache = True
        except Exception as e:
            import warnings

            warnings.warn(
                "pixel-major blend disabled for this process: failed to "
                f"lower/run ({type(e).__name__}: {e}); falling back to the "
                "chunk-major forward",
                stacklevel=2,
            )
            _pm_lowers_cache = False
    return _pm_lowers_cache


def blend_pallas(
    inst, tile_start, tile_count, *, grid_wh, n_feat, chunk=CHUNK,
    tile_ids=None, tiles_per_step=None, sigma_mm=None, algo=None,
):
    """Composite all tiles; inst is (I_pad, F_PAD). Same contract as blend_scan:
    returns (color (T,P,C), T_final (T,P), n_contrib (T,P) int32).

    Jitted even when called eagerly: XLA must materialize the boundary
    transpose into the kernel's compact (F_PAD, I_pad) layout.
    """
    import os

    # chunk == CHUNK: the table's tile starts are CHUNK-aligned (trainable).
    # chunk < CHUNK (must divide it): forward-only sub-chunk alignment — the
    # table is `chunk`-aligned, shrinking I_pad ~(CHUNK/chunk)x at high tile
    # counts (1080p: 8160 tiles x 128 forced >= 1.04M slots for ~230k real
    # instances); the kernels DMA the enclosing CHUNK-aligned slabs and mask
    # lanes. The backward refuses (see _vjp_bwd).
    assert CHUNK % chunk == 0, "chunk must divide the CHUNK=128 slab width"
    if algo is None:
        # cm everywhere by default: the first TRUE on-hardware pm
        # measurement (late r5, after the reduce_prod fix) has pm ~4%
        # slower at the 1080p sub-chunk operating point (28.85 vs 27.72
        # ms/frame) and ~25% slower at train scale — the dynamic group
        # loop's per-group slices/cond overhead exceeds the masked-lane
        # savings. pm stays as the tuned variant (bench.py contests it
        # per chip).
        algo = os.environ.get(
            "GSPLAT_BLEND_ALGO", "cm"
        )
    assert algo in ("cm", "pm"), f"unknown blend algo {algo!r}"
    if algo == "pm" and not _pm_lowers():
        algo = "cm"  # warned once in the probe; cm handles any alignment
    if tiles_per_step is None:
        tiles_per_step = int(
            os.environ.get(
                "GSPLAT_BLEND_TB",
                DEFAULT_TILES_PER_STEP_PM if algo == "pm"
                else DEFAULT_TILES_PER_STEP,
            )
        )
    if sigma_mm is None:
        sigma_mm = os.environ.get("GSPLAT_BLEND_SIGMA_MM", "0") == "1"
    rem = (-inst.shape[0]) % _REPACK_BLOCK
    if rem:  # repack kernels need a multiple of the (1024, F) block
        inst = jnp.pad(inst, ((0, rem), (0, 0)))
    if tile_ids is None:
        tile_ids = jnp.arange(tile_start.shape[0], dtype=jnp.int32)
    return _blend_jit(
        inst, tile_start, tile_count, tile_ids, grid_wh, n_feat, chunk,
        tiles_per_step, bool(sigma_mm), algo,
    )
