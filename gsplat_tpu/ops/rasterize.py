"""Differentiable tile rasterizer: the orchestrating JAX function.

TPU-native equivalent of the reference's `rasterize`/`∇rasterize`/`rrule`
(reference: src/rasterization/rasterizer.jl:255-573) — but where the
reference hand-stitches seven kernels and a hand-derived backward, here the
*whole pipeline is one differentiable JAX function*:

    project (autodiff) → SH (autodiff) → instance binning (integer,
    stop-grad) → per-instance gather (autodiff: its transpose is the
    per-Gaussian segment-sum that replaces the reference's @atomic
    accumulation, render.jl:242-282) → blend (Pallas custom_vjp, or the
    pure-JAX scan fallback) → background composite & channel assembly
    (autodiff).

Static shapes throughout: Gaussian count N is whatever the caller pads to;
the instance budget is `RasterizerConfig.max_instances` with a traced
overflow flag (see ops/tiles.py).

Modes match the reference (rasterizer.jl:47-51): :rgb → 3 channels,
:rgbd → +depth+alpha, :rgbdn → +camera-space normal. The alpha map is
derived as 1 − T_final instead of compositing a constant-1 feature row
(rasterizer.jl:383); the gradient path through T_final's cotangent is
mathematically identical to the reference's channel-5 trick.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..camera import Camera
from ..constants import (
    ALPHA_MIN,
    CHUNK,
    FAR_PLANE,
    NEAR_PLANE,
    RADIUS_CLIP,
    TILE,
    blend_features,
    n_color_features,
)
from . import tiles
from .blend_scan import F_PAD, ROW_FEAT, blend_scan
from .projection import project
from .sh import sh_to_rgb


@dataclass(frozen=True)
class RasterizerConfig:
    width: int
    height: int
    mode: str = "rgbd"  # rgb | rgbd | rgbdn
    max_instances: int = 1 << 20
    chunk: int = CHUNK
    near_plane: float = NEAR_PLANE
    far_plane: float = FAR_PLANE
    impl: str = "pallas"  # pallas | scan
    # Mip-splatting-style antialiasing: multiply opacity by the EWA blur
    # compensation sqrt(det(Sigma)/det(Sigma+blur)), suppressing the alpha
    # of dilation-dominated (sub-pixel) splats. The reference computes the
    # factor but ships with it disconnected (rasterizer.jl:303 passes
    # `nothing`); off by default for parity.
    antialiased: bool = False

    def __post_init__(self):
        assert self.width % TILE == 0 and self.height % TILE == 0, (
            "Resolution must be a multiple of 16 (reference rasterizer.jl:66)."
        )
        n_color_features(self.mode)  # validate

    @property
    def grid_wh(self) -> tuple[int, int]:
        return tiles.tile_grid(self.width, self.height)

    @property
    def n_feat(self) -> int:
        return blend_features(self.mode)


def cull_radius(opacities, radius, conic=None):
    """Binning radius after the exact-identity opacity culls. Returns a
    scalar (N,) radius, or per-axis (N, 2) radii when `conic` is given
    (tiles.tile_rect accepts both).

    1. Opacity cull: alpha = op*G <= op, so a splat with op < ALPHA_MIN
       (incl. dead slots at DEAD_OPACITY) can never pass the blend's
       alpha >= 1/255 keep test — it contributes nothing and its gradients
       are already exactly zero. Dropping its instances keeps dead/pruned
       slots from hogging the instance budget and blend work.
    2. Opacity-aware ellipse bbox (same argument, per pixel): every pixel
       the blend keeps satisfies σ(d) = ½ dᵀ·conic·d ≤ L := ln(op/ALPHA_MIN),
       and that ellipse's axis-aligned bbox has half-widths
       √(2L·Σ_xx), √(2L·Σ_yy) with Σ = conic⁻¹ (Σ_xx = c/det, Σ_yy = a/det)
       — still separable, so the binning histogram matmul survives. The
       projection's radius is the reference's fixed 3σ_max square
       (projection.jl:110), which over-covers BOTH low-opacity splats
       (op < e^{4.5}/255 ≈ 0.35 ⇒ √(2L) < 3) and anisotropic ones (the
       square pays σ_max on both axes; trained scenes are full of
       elongated splats). Capping at the 3σ_max radius preserves the
       reference's truncation semantics exactly, so image AND gradients
       are identical up to f32 reduction-order noise
       (tests/test_rasterize.py); only the diagnostic n_contrib ranks
       (positions in the per-tile list) renumber. The +1 compensates
       tile_rect's gpu_cld spelling floor((m+r+15)/16), which undercovers
       a fractional-mean box by up to one pixel on the max side (it equals
       ceil((m+r)/16) only for integer m+r) — the 3σ rect hides that in
       slack, the tight rect must not. GSPLAT_TIGHT_RADIUS=0 restores the
       fixed 3σ squares.
    """
    import os

    op = jax.lax.stop_gradient(opacities)
    r = radius
    if os.environ.get("GSPLAT_TIGHT_RADIUS", "1") != "0":
        L2 = 2.0 * jnp.log(jnp.maximum(op, ALPHA_MIN) / ALPHA_MIN)  # 2L
        if conic is not None:
            conic = jax.lax.stop_gradient(conic)
            a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
            det = a * c - b * b
            safe = jnp.where(det > 0, det, 1.0)
            rx = jnp.sqrt(jnp.maximum(L2 * c / safe, 0.0))
            ry = jnp.sqrt(jnp.maximum(L2 * a / safe, 0.0))
            bbox = jnp.where(
                (det > 0)[:, None],
                jnp.ceil(jnp.stack([rx, ry], axis=-1)).astype(r.dtype) + 1,
                r[:, None],
            )
            r = jnp.minimum(r[:, None], bbox)
        else:
            need = jnp.sqrt(L2)
            r = jnp.minimum(
                r, jnp.ceil(r.astype(jnp.float32) / 3.0 * need).astype(r.dtype) + 1
            )
    mask = op >= ALPHA_MIN
    return jnp.where(mask[:, None] if r.ndim == 2 else mask, r, 0)


def _gather_instance_table(padded_ids, mean_2d, conic, opacities, feats,
                           offsets=None, counts=None, max_run=1 << 30):
    """Build the (I_pad, F_PAD) instance table from per-Gaussian arrays.

    ONE row-gather from a packed (N, F_PAD) per-Gaussian array — the
    TPU-friendly gather shape. It is differentiable: its transpose
    scatter-adds per-instance cotangents back onto Gaussians (one XLA
    segment-sum), which is what replaces the reference backward's @atomic
    accumulation (render.jl:242-282). Padding slots (id < 0) are zeroed
    whole-row: opacity 0 kills their forward contribution and the mask
    zeroes their cotangents.
    """
    N = mean_2d.shape[0]
    pad_cols = F_PAD - 6 - feats.shape[1]
    pack = jnp.concatenate(
        [mean_2d, conic, opacities[:, None], feats, jnp.zeros((N, pad_cols), mean_2d.dtype)],
        axis=1,
    )  # (N, F_PAD)
    return _gather_rows_xla(pack, padded_ids, offsets, counts, max_run)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _gather_rows_xla(pack, padded_ids, offsets, counts, max_run):
    """rows = pack[padded_ids] with padded_ids < 0 -> zero rows.

    Forward: (I/8, 8)-shaped ids lower to a ~1.4x faster XLA gather on TPU
    than flat (I,) ids (2.37 -> 1.70 ms at 380k rows, benchmark/micro13.py).

    Backward: a custom VJP. The autodiff transpose (scatter-add of the
    per-instance cotangents onto Gaussian rows) is serialized per update by
    the TPU scatter lowering — EVERY add/segment_sum spelling measures
    ~115 ms standalone (~82 ms fused) at a 1.12M-instance budget, HALF the
    train step's device time (benchmark/profile_quality_step.py). Above the
    measured crossover the default instead is:

      1. sort the cotangent rows by gaussian id (one single-key lax.sort,
         pads to the tail) — instances of each gaussian become contiguous,
      2. one streaming Pallas segmented-sum pass (ops/segsum_pallas.py:
         in-block same-segment-mask matmuls + a cross-block carry),
      3. gather each gaussian's run-end row at offsets + counts - 1
         (`offsets`/`counts` are the binning's gaussian-major layout,
         which the sorted-by-id order reproduces exactly).

    This replaces the reference backward's @atomic accumulation
    (render.jl:242-282) with a reduction that is scatter-free AND
    deterministic (the atomics are not). Mode select: GSPLAT_GATHER_BWD in
    {scatter, segscan, segsum}; defaults by table size (see the crossover
    notes at _SEGSUM_MIN_INSTANCES): scatter on tiny tables or off-TPU,
    the streaming Pallas "segsum" in the mid band (the measured winner at
    bench scale, both standalone and end-to-end), pure-XLA "segscan" at
    the >=1M quality scale (it took the step floor 334 -> 296 ms in r4).
    """
    return _gather_rows_fwd_impl(pack, padded_ids)


def _gather_rows_fwd_impl(pack, padded_ids):
    N = pack.shape[0]
    ids = jnp.clip(padded_ids, 0, N - 1)
    m = (padded_ids >= 0).astype(pack.dtype)
    I = ids.shape[0]
    if I % 8 == 0:
        rows = jnp.take(pack, ids.reshape(-1, 8), axis=0).reshape(I, F_PAD)
    else:
        rows = jnp.take(pack, ids, axis=0)
    return rows * m[:, None]


def _gather_rows_vjp_fwd(pack, padded_ids, offsets, counts, max_run):
    return (
        _gather_rows_fwd_impl(pack, padded_ids),
        (padded_ids, offsets, counts, pack.shape[0]),
    )


# The TPU scatter lowering degrades super-linearly with instance count
# (benchmark/micro14.py on v5e, real-binning ids): 6.6 ms at a 384k budget,
# 68 ms at 640k, 121 ms at 1.15M — while the sort+reduce spellings scale
# ~linearly (segsum 4.7 / 7.9 / 37 ms; segscan 3.3 / 6.1 / 32). The r3
# claim that the in-pipeline scatter only costs ~1.2 ms at bench scale was
# refuted by an op-level trace of the grad closure (benchmark/trace_bwd.py,
# late r5): the scatter fusion costs 5.27 ms/step at a 400k table, and the
# segsum spelling won the end-to-end autotune in three consecutive bench
# windows at the 524k autotune budget (r4 final 23.77 vs 24.70; r5 24.10
# vs 24.42; r5-final 23.86 vs 24.52 ms fwd+bwd grad), while at a 400k
# table the in-pipeline scatter still wins end-to-end (22.84 vs 23.63,
# same closure) — the scatter cliff sits between 400k and 524k on v5e.
# Defaults bracket it: scatter below _SEGSUM_MIN_INSTANCES, the streaming
# Pallas segsum in the mid band, segscan at the >=1M quality scale (where
# it took the step floor 334 -> 296 ms in r4). GSPLAT_GATHER_BWD
# overrides; bench.py autotunes it on the target chip.
_SEGSUM_MIN_INSTANCES = 448 * 1024
_SEGSCAN_MIN_INSTANCES = 1024 * 1024


def _gather_bwd_mode(n_instances: int) -> str:
    import os

    mode = os.environ.get("GSPLAT_GATHER_BWD", "")
    if mode:
        return mode
    if os.environ.get("GSPLAT_SEGSCAN_BWD", "0") == "1":  # legacy flag
        return "segscan"
    if jax.default_backend() == "tpu" and n_instances >= _SEGSCAN_MIN_INSTANCES:
        return "segscan"
    if jax.default_backend() == "tpu" and n_instances >= _SEGSUM_MIN_INSTANCES:
        return "segsum"
    return "scatter"


def _gather_rows_vjp_bwd(max_run, res, ct):
    padded_ids, offsets, counts, n = res
    real = padded_ids >= 0
    ct = jnp.where(real[:, None], ct, 0.0)
    mode = _gather_bwd_mode(ct.shape[0])
    if mode == "scatter" or offsets is None:
        d_pack = jnp.zeros((n, ct.shape[1]), ct.dtype).at[
            jnp.clip(padded_ids, 0, n - 1)
        ].add(ct)
        return d_pack, None, None, None

    I, F = ct.shape
    keys = jnp.where(real, padded_ids, jnp.int32(0x7FFFFFFF))
    # Sort only the permutation (a 17-operand payload sort lowers ~60x
    # worse than key+index at this scale), then row-gather the cotangents
    # into gaussian-major order: each gaussian's rows become the CONTIGUOUS
    # run [gm_offsets[g], gm_offsets[g] + counts[g]) (ops/tiles.py), since
    # a gaussian's post-sort slots ascend by tile id = its rect's row-major
    # enumeration order. Padding rows (key 0x7FFFFFFF) sort to the tail.
    k_s, perm = jax.lax.sort(
        (keys, jnp.arange(I, dtype=jnp.int32)), num_keys=1, is_stable=False
    )
    if I % 8 == 0:
        v = jnp.take(ct, perm.reshape(-1, 8), axis=0).reshape(I, F)
    else:
        v = jnp.take(ct, perm, axis=0)
    if mode == "segsum":
        # One streaming Pallas pass: run-end rows hold the full segment sum.
        from .segsum_pallas import BLOCK, segsum_scan

        pad = (-I) % BLOCK
        if pad:
            v = jnp.pad(v, ((0, pad), (0, 0)))
            k_s = jnp.concatenate(
                [k_s, jnp.full((pad,), jnp.int32(0x7FFFFFFF))]
            )
        v = segsum_scan(v, k_s)[:I]
    else:  # "segscan": pure-XLA log-level masked adds (deterministic fallback)
        # Segmented inclusive scan: after level s every position holds the
        # sum of its run's last min(rank+1, 2s) entries. Run length = a
        # gaussian's instance count <= n_tiles, so `max_run` (the caller
        # passes the tile count) statically bounds the level count.
        s = 1
        while s < min(max_run, I):
            same = jnp.concatenate(
                [jnp.zeros((s,), bool), k_s[s:] == k_s[:-s]]
            )
            shifted = jnp.concatenate([jnp.zeros((s, F), ct.dtype), v[:-s]])
            v = v + jnp.where(same[:, None], shifted, 0.0)
            s *= 2
    ends = jnp.clip(offsets + counts - 1, 0, I - 1)
    if n % 8 == 0:
        d_pack = jnp.take(v, ends.reshape(-1, 8), axis=0).reshape(n, F)
    else:
        d_pack = jnp.take(v, ends, axis=0)
    d_pack = jnp.where((counts > 0)[:, None], d_pack, 0.0)
    return d_pack, None, None, None


_gather_rows_xla.defvjp(_gather_rows_vjp_fwd, _gather_rows_vjp_bwd)


def _assemble_image(color_tiles, grid_wh, n_feat):
    """(T, 256, C) tile-major → (H, W, C) image."""
    gx, gy = grid_wh
    img = color_tiles.reshape(gy, gx, TILE, TILE, n_feat)
    return img.transpose(0, 2, 1, 3, 4).reshape(gy * TILE, gx * TILE, n_feat)


def render(
    means,  # (N, 3)
    opacities_raw,  # (N,) pre-sigmoid
    scales_raw,  # (N, 3) or (N, 1) pre-exp (1 = isotropic)
    rotations,  # (N, 4) wxyz, unnormalized
    sh_dc,  # (N, 1, 3)
    sh_rest,  # (N, K-1, 3)
    **kwargs,
):
    """Activation wrapper: sigmoid(opacity), exp(scale) with isotropic
    broadcast, SH concat — the reference rasterizer's functor path
    (rasterizer.jl:200-253) — then `rasterize`."""
    opacities = jax.nn.sigmoid(opacities_raw)
    scales = jnp.exp(scales_raw)
    if scales.shape[1] == 1:
        scales = jnp.broadcast_to(scales, (scales.shape[0], 3))
    shs = jnp.concatenate([sh_dc, sh_rest], axis=1) if sh_rest.shape[1] else sh_dc
    return rasterize(means, rotations, scales, opacities, shs, **kwargs)


def rasterize(
    means,  # (N, 3)
    quats,  # (N, 4) wxyz
    scales,  # (N, 3) activated (exp applied)
    opacities,  # (N,) activated (sigmoid applied)
    shs,  # (N, K, 3)
    *,
    camera: Camera,
    config: RasterizerConfig,
    sh_degree,  # traced int
    background=None,  # (3,)
    R_w2c=None,
    t_w2c=None,  # optional pose override (camera pose optimization)
    means2d_probe=None,  # (N, 2) zeros; gradient w.r.t. it = ∇means_2d stats
    with_covisibility: bool = False,  # per-Gaussian covisibility aux output
):
    """Render. Returns (image (H, W, C_mode), aux dict)."""
    mode = config.mode
    with_normal = mode == "rgbdn"
    R = camera.R if R_w2c is None else R_w2c
    t = camera.t if t_w2c is None else t_w2c
    if background is None:
        background = jnp.zeros(3, jnp.float32)

    resolution_wh = jnp.array([config.width, config.height], jnp.float32)
    principal_px = camera.principal * resolution_wh

    if config.impl == "pallas":
        # Fused one-pass Pallas prologue (projection + SH); the pure-JAX
        # path below is its differential-test oracle (tests/test_proj_fused).
        from .proj_fused import project_and_sh_fused

        proj = project_and_sh_fused(
            means,
            quats,
            scales,
            shs,
            R,
            t,
            camera.focal,
            principal_px,
            resolution_wh,
            sh_degree,
            near_plane=config.near_plane,
            far_plane=config.far_plane,
            radius_clip=RADIUS_CLIP,
            with_normal=with_normal,
        )
        rgbs = proj["rgb"]
    else:
        proj = project(
            means,
            quats,
            scales,
            R,
            t,
            camera.focal,
            principal_px,
            resolution_wh,
            near_plane=config.near_plane,
            far_plane=config.far_plane,
            with_normal=with_normal,
        )
        rgbs = sh_to_rgb(means, shs, -R.T @ t, sh_degree)
    mean_2d = proj["mean_2d"]
    if means2d_probe is not None:
        mean_2d = mean_2d + means2d_probe

    if config.antialiased:
        # Differentiable through both operands (the fused prologue's VJP
        # covers the compensation cotangent; tests/test_proj_fused).
        opacities = opacities * proj["compensation"]

    radius = cull_radius(opacities, proj["radius"], proj["conic"])

    binned = tiles.build_instances(
        mean_2d,
        proj["depth"],
        radius,  # aux["radii"] below stays unculled (densify-stats parity)
        grid_wh=config.grid_wh,
        max_instances=config.max_instances,
        chunk=config.chunk,
    )

    feats = [rgbs]
    if mode in ("rgbd", "rgbdn"):
        feats.append(proj["depth"][:, None])
    if with_normal:
        feats.append(proj["normal"])
    feats = jnp.concatenate(feats, axis=1)  # (N, C_blend)

    table = _gather_instance_table(
        binned["padded_ids"], mean_2d, proj["conic"], opacities, feats,
        offsets=binned["gm_offsets"], counts=binned["tile_count_per_gaussian"],
        max_run=config.grid_wh[0] * config.grid_wh[1],
    )

    if config.impl == "scan":
        color, T_final, n_contrib = blend_scan(
            table,
            binned["tile_start"],
            binned["tile_count"],
            grid_wh=config.grid_wh,
            n_feat=config.n_feat,
            chunk=config.chunk,
        )
    elif config.impl == "pallas":
        from .blend_pallas import blend_pallas

        color, T_final, n_contrib = blend_pallas(
            table,
            binned["tile_start"],
            binned["tile_count"],
            grid_wh=config.grid_wh,
            n_feat=config.n_feat,
            chunk=config.chunk,
        )
    else:
        raise ValueError(f"Unknown blend impl: {config.impl!r}")

    # Background composite: rgb channels only (feature_background,
    # rasterizer.jl:411-414). depth/normal background is 0.
    bg_feat = jnp.concatenate([background, jnp.zeros(config.n_feat - 3, jnp.float32)])
    color = color + T_final[..., None] * bg_feat

    img = _assemble_image(color, config.grid_wh, config.n_feat)
    T_img = _assemble_image(T_final[..., None], config.grid_wh, 1)[..., 0]
    alpha = 1.0 - T_img

    if mode == "rgb":
        image = img
    elif mode == "rgbd":
        image = jnp.concatenate([img[..., :3], img[..., 3:4], alpha[..., None]], axis=-1)
    else:  # rgbdn
        image = jnp.concatenate(
            [img[..., :3], img[..., 3:4], alpha[..., None], img[..., 4:7]], axis=-1
        )

    if with_covisibility:
        from .covisibility import covisibility as _covis

        covis = _covis(
            jax.lax.stop_gradient(table),
            binned["padded_ids"],
            binned["tile_start"],
            binned["tile_count"],
            n_contrib,
            grid_wh=config.grid_wh,
            n_gaussians=means.shape[0],
            chunk=config.chunk,
        )

    aux = {
        "valid": proj["valid"],
        "radii": proj["radius"],
        "compensation": proj["compensation"],
        "depths": proj["depth"],
        "mean_2d": mean_2d,
        "alpha": alpha,
        "T_final": T_img,
        "n_contrib": _assemble_image(n_contrib[..., None].astype(jnp.float32), config.grid_wh, 1)[
            ..., 0
        ].astype(jnp.int32),
        "n_instances": binned["n_instances"],
        "p_instances": binned["p_instances"],
        "overflow": binned["overflow"],
        # Per-pixel uncertainty sum(alpha_i * T_i) == 1 - T_final exactly
        # (telescoping; reference render.jl:109) — the alpha map.
        "uncertainty": alpha,
    }
    if with_covisibility:
        aux["covisibility"] = covis
    return image, aux
