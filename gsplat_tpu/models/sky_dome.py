"""Sky dome: a frozen Fibonacci-lattice Gaussian shell composited behind the scene.

Reference: src/sky_dome.jl. Construction and compositing semantics preserved:

  - lattice: equal-area Fibonacci sphere with half-offset z sampling; the
    hemisphere variant generates 2n and cuts against `up` so `n` means
    "Gaussians in the dome" (sky_dome.jl:57-97);
  - Gaussian std = radius * spacing * SKY_DOME_OVERLAP (=1): a sealed shell
    (transmittance ~= 0.004 at the deepest 3-cell gap, sky_dome.jl:100-108);
  - opacity frozen at inverse_sigmoid(0.99); SH degree 0; only features_dc
    trains (its own Adam);
  - the dome renders through its own :rgb config with far_plane = 4*radius;
  - exact behind-compositing image + (1 - alpha) * sky, where alpha is the
    scene's 1 - T_final — ordinary back-to-front blending with the dome last
    (sky_dome.jl:217-250);
  - sky_opacity_loss = sum(mask * alpha^2) / max(sum(mask), 1): bounded
    gradient at alpha -> 1, vanishing at alpha -> 0; alpha must be the raw
    (unclamped) channel (the clamp-adjoint trap).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import Camera
from ..models.gaussians import inverse_sigmoid
from ..ops.rasterize import RasterizerConfig, rasterize

SKY_DOME_OVERLAP = 1.0


def fibonacci_sphere(n: int):
    """(n, 3) unit directions + lattice angular spacing (sky_dome.jl:57-71)."""
    i = np.arange(1, n + 1, dtype=np.float64)
    golden_angle = math.pi * (3.0 - math.sqrt(5.0))
    z = 1.0 - 2.0 * (i - 0.5) / n
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    theta = golden_angle * (i - 1)
    dirs = np.stack([r * np.cos(theta), r * np.sin(theta), z], axis=1)
    return dirs.astype(np.float32), math.sqrt(4.0 * math.pi / n)


def sky_dome_directions(n: int, shape: str, up):
    """Directions + spacing; :hemisphere cuts a 2n lattice at the horizon
    (sky_dome.jl:87-97)."""
    if shape not in ("hemisphere", "sphere"):
        raise ValueError(f"Invalid sky dome shape: {shape!r}")
    if shape == "sphere":
        return fibonacci_sphere(n)
    dirs, spacing = fibonacci_sphere(2 * n)
    up = np.asarray(up, np.float64)
    up = up / np.linalg.norm(up)
    kept = dirs @ up.astype(np.float32) >= 0.0
    return dirs[kept], spacing


def estimate_up_vec(cameras) -> np.ndarray:
    """Scene up = negated mean camera view-up (reference camera.jl:117)."""
    ups = np.stack([-np.asarray(c.R)[1] for c in cameras])  # -row 1 = view up
    s = ups.sum(axis=0)
    return (s / max(np.linalg.norm(s), 1e-8)).astype(np.float32)


class SkyDome:
    """Frozen dome; only `features_dc` (held by the caller's param pytree)
    trains. Static geometry lives here as device constants."""

    def __init__(
        self,
        camera: Camera,
        *,
        n_points: int = 32_768,
        shape: str = "hemisphere",
        radius: float,
        center=np.zeros(3, np.float32),
        up=np.array([0.0, 0.0, 1.0], np.float32),
        color=np.array([0.5, 0.5, 0.5], np.float32),
        max_instances: int = 1 << 19,
        impl: str | None = None,
    ):
        dirs, spacing = sky_dome_directions(n_points, shape, up)
        n = dirs.shape[0]
        self.radius = float(radius)
        self.points = jnp.asarray(dirs * radius + np.asarray(center, np.float32))
        self.scales_raw = jnp.full(
            (n, 3), math.log(radius * spacing * SKY_DOME_OVERLAP), jnp.float32
        )
        self.rotations = jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1))
        self.opacities_raw = jnp.full((n,), inverse_sigmoid(0.99), jnp.float32)
        from ..models.gaussians import rgb_2_sh

        self.init_features_dc = jnp.asarray(
            np.tile(rgb_2_sh(np.asarray(color, np.float32))[None, None, :], (n, 1, 1))
        )
        if impl is None:
            impl = "pallas" if jax.default_backend() == "tpu" else "scan"
        self.config = RasterizerConfig(
            width=camera.width,
            height=camera.height,
            mode="rgb",
            far_plane=4.0 * self.radius,
            max_instances=max_instances,
            impl=impl,
        )
        self._cfg_cache = {(camera.width, camera.height): self.config}

    @property
    def n(self) -> int:
        return self.points.shape[0]

    def config_for(self, camera: Camera) -> RasterizerConfig:
        """Rasterizer config at `camera`'s resolution (cached per (W, H)).

        The construction camera only seeds the default — a mixed-resolution
        dataset must not render the sky at the wrong shape (the reference
        rebuilds its rasterizer on every resize, gui/worker.jl:628-632)."""
        key = (camera.width, camera.height)
        cfg = self._cfg_cache.get(key)
        if cfg is None:
            import dataclasses

            cfg = dataclasses.replace(
                self.config, width=camera.width, height=camera.height
            )
            self._cfg_cache[key] = cfg
        return cfg

    def render(self, camera: Camera, features_dc, config: RasterizerConfig | None = None):
        """(H, W, 3) sky image. features_dc: (n, 1, 3) trainable."""
        cfg = config or self.config_for(camera)
        img, _ = rasterize(
            self.points,
            self.rotations,
            jnp.exp(self.scales_raw),
            jax.nn.sigmoid(self.opacities_raw),
            features_dc,
            camera=camera,
            config=cfg,
            sh_degree=0,
        )
        return img[..., :3]

    def merge_into(self, model, features_dc=None):
        """Scene + dome as one GaussianModel for PLY export (sky_dome.jl:259-278):
        the dome's SH rest is zero-padded to the scene's degree."""
        n = self.n
        n_rest = model.features_rest.shape[1]
        cap = model.capacity + n
        grown = model.with_capacity(cap)
        alive = np.asarray(grown.alive)
        free = np.flatnonzero(~alive)[:n]
        idx = jnp.asarray(free.astype(np.int32))
        dc = features_dc if features_dc is not None else self.init_features_dc
        return grown.replace(
            points=grown.points.at[idx].set(self.points),
            features_dc=grown.features_dc.at[idx].set(dc),
            features_rest=grown.features_rest.at[idx].set(
                jnp.zeros((n, n_rest, 3), jnp.float32)
            ),
            scales=grown.scales.at[idx].set(self.scales_raw),
            rotations=grown.rotations.at[idx].set(self.rotations),
            opacities=grown.opacities.at[idx].set(self.opacities_raw),
            alive=grown.alive.at[idx].set(True),
        )


def composite_sky(image, alpha, sky_rgb):
    """image + (1 - alpha) * sky — exact back-to-front blend with the dome
    last (sky_dome.jl:246-250). image (H,W,3), alpha (H,W), sky (H,W,3)."""
    return image + (1.0 - alpha)[..., None] * sky_rgb


def sky_opacity_loss(alpha, sky_weight):
    """sum(w * alpha^2) / max(sum(w), 1); alpha raw/unclamped
    (sky_dome.jl:300-320)."""
    sw = jnp.maximum(jax.lax.stop_gradient(jnp.sum(sky_weight)), 1.0)
    return jnp.sum(sky_weight * alpha**2) / sw
