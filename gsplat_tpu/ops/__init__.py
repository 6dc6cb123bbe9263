from . import blend_ref, blend_scan, covisibility, projection, sh, tiles  # noqa: F401
from .rasterize import RasterizerConfig, rasterize, render  # noqa: F401
