"""gsplat_tpu: a TPU-native (JAX/XLA/Pallas) 3D Gaussian Splatting framework.

A from-scratch re-design (not a port) of the capabilities of
JuliaNeuralGraphics/GaussianSplatting.jl for TPU hardware.
"""
from . import constants  # noqa: F401
from .camera import Camera, focal2fov, fov2focal  # noqa: F401
from .models.gaussians import GaussianModel, export_ply, import_ply  # noqa: F401
from .ops.rasterize import RasterizerConfig, rasterize, render  # noqa: F401

__version__ = "0.1.0"
