"""Photometric losses & image metrics.

The reference implements SSIM as a hand-fused KernelAbstractions kernel pair
(src/fused_ssim.jl:34-371) because Julia's conv stack couldn't fuse it. On
TPU the separable 11-tap Gaussian windows are depthwise convolutions that
XLA fuses natively — the "fused" SSIM is simply this composition under jit,
and autodiff reproduces the hand-derived backward (the reference tests its
kernel against exactly such a conv composition, test/runtests.jl:496-520).

Window constants match fused_ssim.jl:1-24: 11 taps, sigma=1.5, C1=0.01^2,
C2=0.03^2, images in [0,1].
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

SSIM_WINDOW = 11
SSIM_SIGMA = 1.5
SSIM_C1 = 0.01**2
SSIM_C2 = 0.03**2


def _gaussian_taps(n: int = SSIM_WINDOW, sigma: float = SSIM_SIGMA):
    x = jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0
    w = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return w / jnp.sum(w)


def _band_matrix(n: int):
    """(n, n) banded matrix B with B[i, j] = taps[j - i + 5] — one matmul
    row-blurs n samples with zero ('same') padding at the edges."""
    taps = _gaussian_taps()
    i = jnp.arange(n)[:, None]
    j = jnp.arange(n)[None, :]
    d = j - i + SSIM_WINDOW // 2
    inband = (d >= 0) & (d < SSIM_WINDOW)
    return jnp.where(inband, taps[jnp.clip(d, 0, SSIM_WINDOW - 1)], 0.0)


def _blur_conv(img):
    """Separable 11-tap Gaussian filter as a depthwise conv pair — the
    oracle for `_blur` (kept for differential testing; see fused_ssim.jl's
    own conv-composition oracle, test/runtests.jl:496-520)."""
    c = img.shape[-1]
    taps = _gaussian_taps()
    x = img[None].transpose(0, 3, 1, 2)  # (1, C, H, W)
    kh = jnp.broadcast_to(taps.reshape(1, 1, SSIM_WINDOW, 1), (c, 1, SSIM_WINDOW, 1))
    kw = jnp.broadcast_to(taps.reshape(1, 1, 1, SSIM_WINDOW), (c, 1, 1, SSIM_WINDOW))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    pad = SSIM_WINDOW // 2
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn, feature_group_count=c
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn, feature_group_count=c
    )
    return x[0].transpose(1, 2, 0)


def _block_size(n: int, cap: int = 256, floor: int = 32) -> int:
    """Largest divisor of n that is <= cap, or 0 if none reaches `floor`
    (then the full band matrix is cheaper than the windowing overhead)."""
    best = 0
    for d in range(1, int(n**0.5) + 1):
        if n % d == 0:
            for cand in (d, n // d):
                if floor <= cand <= cap:
                    best = max(best, cand)
    return best


def _windowed_band(bs: int):
    """(bs, bs+16) local band: out row r of a block consumes window rows
    r+3..r+13 of its (bs+16)-row input window (8-zero-padded source)."""
    taps = _gaussian_taps()
    r = jnp.arange(bs)[:, None]
    k = jnp.arange(bs + 16)[None, :]
    d = k - r - 3
    inband = (d >= 0) & (d < SSIM_WINDOW)
    return jnp.where(inband, taps[jnp.clip(d, 0, SSIM_WINDOW - 1)], 0.0)


def _blur_axis0(x):
    """11-tap Gaussian blur along axis 0 of (L, M), zero ('same') padding,
    as MXU matmuls at HIGHEST precision.

    Block-banded spelling: the band is 11 wide, so the full (L, L) matrix
    wastes ~L/11 of its FLOPs. L is split into nb blocks of bs rows; each
    block's output is one (bs, bs+16) @ (bs+16, M) matmul against an
    overlapping window of the 8-zero-padded input — FLOPs shrink L/(bs+16)
    fold (~4-7x at render resolutions). Falls back to the full band matrix
    when L has no convenient divisor."""
    L, M = x.shape
    hi = jax.lax.Precision.HIGHEST
    bs = _block_size(L)
    if bs == 0 or bs == L:
        return jnp.dot(_band_matrix(L), x, precision=hi)
    nb = L // bs
    xpad = jnp.pad(x, ((8, 8), (0, 0)))
    xw = jnp.stack([xpad[b * bs : b * bs + bs + 16] for b in range(nb)])
    out = jnp.einsum("rk,bkm->brm", _windowed_band(bs), xw, precision=hi)
    return out.reshape(L, M)


def _blur(img):
    """Separable 11-tap Gaussian filter, same padding. img: (H, W, C).

    TPU spelling: two (block-)banded MATMULS on the MXU instead of grouped
    depthwise convolutions (XLA lowers feature_group_count convs poorly on
    TPU — measured ~5 ms fwd+bwd at 976x544x15, vs matmul FLOPs that are
    trivial at MXU rates). All 15 moment maps of the fused-SSIM caller ride
    the same two matmuls. HIGHEST precision: the variance maps difference
    nearly-equal second moments, so bf16 matmul error would surface in
    var/cov."""
    h, w, c = img.shape
    x = _blur_axis0(img.reshape(h, w * c)).reshape(h, w, c)
    x = _blur_axis0(x.transpose(1, 0, 2).reshape(w, h * c)).reshape(w, h, c)
    return x.transpose(1, 0, 2)


def ssim(x, y):
    """Mean SSIM over the image; x, y: (H, W, C) in [0, 1]."""
    c = x.shape[-1]
    stacked = jnp.concatenate([x, y, x * x, y * y, x * y], axis=-1)
    blurred = _blur(stacked)
    mu_x = blurred[..., 0:c]
    mu_y = blurred[..., c : 2 * c]
    mu_xx = blurred[..., 2 * c : 3 * c]
    mu_yy = blurred[..., 3 * c : 4 * c]
    mu_xy = blurred[..., 4 * c : 5 * c]
    var_x = mu_xx - mu_x * mu_x
    var_y = mu_yy - mu_y * mu_y
    cov = mu_xy - mu_x * mu_y
    num = (2 * mu_x * mu_y + SSIM_C1) * (2 * cov + SSIM_C2)
    den = (mu_x * mu_x + mu_y * mu_y + SSIM_C1) * (var_x + var_y + SSIM_C2)
    return jnp.mean(num / den)


def l1(x, y):
    return jnp.mean(jnp.abs(x - y))


def mse(x, y):
    return jnp.mean((x - y) ** 2)


def psnr(x, y):
    """20*log10(1/sqrt(mse)) (reference utils.jl:107-110)."""
    return -10.0 * jnp.log10(jnp.maximum(mse(x, y), 1e-12))


def quantize8(img):
    """Round to the 8-bit sRGB grid before scoring — published-number parity
    (reference utils.jl:111-118)."""
    return jnp.round(jnp.clip(img, 0.0, 1.0) * 255.0) / 255.0


def photometric_loss(pred, target, lambda_dssim: float = 0.2):
    """(1-l)*L1 + l*(1-SSIM) — the 3DGS objective (training.jl:668-672).
    Returns (loss, dict of parts)."""
    t_l1 = l1(pred, target)
    t_ssim = ssim(pred, target)
    loss = (1.0 - lambda_dssim) * t_l1 + lambda_dssim * (1.0 - t_ssim)
    return loss, {"l1": t_l1, "ssim": t_ssim}
