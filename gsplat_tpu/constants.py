"""Numeric constants shared by the rasterizer and training engine.

These mirror the reference implementation's constants exactly — they are
load-bearing for PSNR parity (see /root/reference notes: rasterizer constants at
src/rasterization/rasterizer.jl:63-64,293-295 and the blend thresholds at
src/rasterization/render.jl:90-98).
"""

# Tile geometry (reference: src/GaussianSplatting.jl:55-56 — BLOCK=(16,16)).
TILE = 16
TILE_PIXELS = TILE * TILE  # 256 pixels per tile.

# Instance chunk length processed per inner step of the blend kernels.
# 128 = one f32 lane-tile: the instance axis lives on vector lanes.
CHUNK = 128

# Blend thresholds (reference: src/rasterization/render.jl:90-98).
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4

# Projection config (reference: src/rasterization/rasterizer.jl:63-64,293-295).
NEAR_PLANE = 0.2
FAR_PLANE = 1000.0
RADIUS_CLIP = 3          # pixels
BLUR_EPS = 0.3           # +0.3px low-pass added to the 2D covariance
MAX_EIGVAL_FLOOR = 0.1   # floor inside max_eigval_2D's sqrt (render.jl:415-420)
FOV_CLAMP = 0.3          # FOV clamp factor: 0.3 * tan(fov) (projection.jl:267)

# Spherical-harmonics color shift (reference: spherical_harmonics.jl:72).
SH_COLOR_SHIFT = 0.5
F32_EPS = 1.1920929e-7  # eps(Float32) — added alongside the 0.5 shift.

# SH basis constants (reference: src/rasterization/utils.jl:31-48).
SH0 = 0.28209479177387814
SH1 = 0.4886025119029199
SH2C1 = 1.0925484305920792
SH2C2 = -1.0925484305920792
SH2C3 = 0.31539156525252005
SH2C4 = -1.0925484305920792
SH2C5 = 0.5462742152960396
SH3C1 = -0.5900435899266435
SH3C2 = 2.890611442640554
SH3C3 = -0.4570457994644658
SH3C4 = 0.3731763325901154
SH3C5 = -0.4570457994644658
SH3C6 = 1.445305721320277
SH3C7 = -0.5900435899266435

# Render modes → number of blended feature channels in the output image
# (reference: rasterizer.jl:47-51). The blend kernel itself composites one
# channel fewer for :rgbd/:rgbdn — the alpha map is derived as 1 - T_final
# instead of blending a constant-1 feature (mathematically identical,
# including gradients; see ops/rasterize.py).
MODE_CHANNELS = {"rgb": 3, "rgbd": 5, "rgbdn": 8}


def n_color_features(mode: str) -> int:
    try:
        return MODE_CHANNELS[mode]
    except KeyError:
        raise ValueError(f"Invalid render mode: {mode!r}") from None


def blend_features(mode: str) -> int:
    """Channels actually composited by the blend kernel (no alpha channel)."""
    return {"rgb": 3, "rgbd": 4, "rgbdn": 7}[mode]
