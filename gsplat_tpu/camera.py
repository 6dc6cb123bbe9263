"""Camera model: world-to-camera pose + pinhole intrinsics.

Mirrors the reference's `Camera`/`NU.CameraIntrinsics` semantics
(reference: src/camera.jl:2-45): `R`/`t` are the world→camera transform,
`focal` is in pixels, `principal` is normalized to [0, 1] and multiplied by
the resolution at projection time, and resolutions are kept as static Python
ints (the rasterizer requires multiples of 16).

Implemented as a flax.struct dataclass so a Camera is a jit-traceable pytree
with static (hashable) resolution fields.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import struct


def fov2focal(fov: float, pixels: int) -> float:
    return float(pixels) / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: int) -> float:
    return 2.0 * math.atan(float(pixels) / (2.0 * focal))


@struct.dataclass
class Camera:
    R: jnp.ndarray  # (3, 3) world→camera rotation
    t: jnp.ndarray  # (3,)  world→camera translation
    focal: jnp.ndarray  # (2,) [fx, fy] in pixels
    principal: jnp.ndarray  # (2,) [cx, cy] normalized to [0, 1]
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)

    @classmethod
    def create(
        cls,
        R=None,
        t=None,
        *,
        width: int,
        height: int,
        focal=None,
        principal=None,
        fov_x: float | None = None,
        fov_y: float | None = None,
    ) -> "Camera":
        if R is None:
            R = np.eye(3, dtype=np.float32)
        if t is None:
            t = np.zeros(3, dtype=np.float32)
        if focal is None:
            if fov_x is None:
                raise ValueError("Provide either focal or fov_x/fov_y.")
            fx = fov2focal(fov_x, width)
            fy = fov2focal(fov_y, height) if fov_y is not None else fx
            focal = np.array([fx, fy], dtype=np.float32)
        if principal is None:
            principal = np.array([0.5, 0.5], dtype=np.float32)
        return cls(
            R=jnp.asarray(R, jnp.float32),
            t=jnp.asarray(t, jnp.float32),
            focal=jnp.asarray(focal, jnp.float32),
            principal=jnp.asarray(principal, jnp.float32),
            width=int(width),
            height=int(height),
        )

    @property
    def resolution(self):
        """(width, height) as static ints."""
        return (self.width, self.height)

    @property
    def w2c(self) -> jnp.ndarray:
        m = jnp.eye(4, dtype=jnp.float32)
        m = m.at[:3, :3].set(self.R)
        m = m.at[:3, 3].set(self.t)
        return m

    @property
    def c2w(self) -> jnp.ndarray:
        Rt = self.R.T
        m = jnp.eye(4, dtype=jnp.float32)
        m = m.at[:3, :3].set(Rt)
        m = m.at[:3, 3].set(-Rt @ self.t)
        return m

    @property
    def camera_center(self) -> jnp.ndarray:
        return -self.R.T @ self.t

    @property
    def principal_px(self) -> jnp.ndarray:
        res = jnp.array([self.width, self.height], jnp.float32)
        return self.principal * res

    def with_pose(self, R, t) -> "Camera":
        return self.replace(R=jnp.asarray(R, jnp.float32), t=jnp.asarray(t, jnp.float32))

    def with_c2w(self, c2w) -> "Camera":
        c2w = jnp.asarray(c2w, jnp.float32)
        R = c2w[:3, :3].T
        t = -R @ c2w[:3, 3]
        return self.replace(R=R, t=t)

    def shifted(self, relative) -> "Camera":
        """Translate along the camera's local axes (GUI movement).

        Functional version of reference `shift!` (src/camera.jl:136-139):
        c2w translation += c2w rotation @ relative.
        """
        c2w = self.c2w
        t_new = c2w[:3, 3] + c2w[:3, :3] @ jnp.asarray(relative, jnp.float32)
        return self.with_c2w(jnp.concatenate([c2w[:3, :3], t_new[:, None]], axis=1))

    def rotated(self, rotation) -> "Camera":
        """Pre-rotate the camera's orientation (GUI look controls).

        Functional version of reference `rotate!` (src/camera.jl:141-144):
        c2w rotation = rotation @ c2w rotation.
        """
        c2w = self.c2w
        R_new = jnp.asarray(rotation, jnp.float32) @ c2w[:3, :3]
        return self.with_c2w(jnp.concatenate([R_new, c2w[:3, 3:4]], axis=1))

    def with_resolution(self, width: int, height: int) -> "Camera":
        """Rescale to a new resolution, keeping the field of view.

        Mirrors reference `set_resolution!` (src/camera.jl:87-93): focal
        lengths scale with the resolution, principal stays normalized.
        """
        sx = width / self.width
        sy = height / self.height
        scale = jnp.array([sx, sy], jnp.float32)
        return self.replace(focal=self.focal * scale, width=int(width), height=int(height))


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> tuple[np.ndarray, np.ndarray]:
    """Build a w2c (R, t) looking from `eye` to `target`, +z forward."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-8:
        right = np.cross(fwd, np.array([1.0, 0.0, 0.0]))
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_c2w = np.stack([right, down, fwd], axis=1)  # columns: camera axes in world
    R = R_c2w.T
    t = -R @ eye
    return R.astype(np.float32), t.astype(np.float32)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """6D rotation parametrization → rotation matrix (Zhou et al.).

    Mirrors reference `rotation_6d_to_matrix` (src/camera.jl:170-177): the
    orthonormalized vectors are the *rows* of the result. Used by camera
    pose optimization.
    """
    a1, a2 = d6[:3], d6[3:]
    b1 = a1 / jnp.linalg.norm(a1)
    b2 = a2 - jnp.dot(b1, a2) * b1
    b3 = b2 / jnp.linalg.norm(b2)
    b4 = jnp.cross(b1, b3)
    return jnp.stack([b1, b3, b4], axis=0)
