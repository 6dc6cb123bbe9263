"""Camera pose optimization: 6D-rotation + translation deltas on w2c.

Reference: src/camera_opt.jl. The deltas are trainable; after each step the
optimized delta is re-absorbed into the camera pose and zeroed (with the
delta optimizer reset), so gradients always linearize around the current
pose. Gradients reach the deltas through the rasterizer's optional
`R_w2c`/`t_w2c` arguments: where the reference accumulates per-Gaussian pose
gradients with @atomic in its backward projection kernel
(projection.jl:243-255), here they are an ordinary autodiff reduction
(the per-Gaussian sum XLA emits for the broadcast transpose).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import Camera, rotation_6d_to_matrix

POSE_ID6 = np.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], np.float32)


def pose_delta(R_w2c, t_w2c, drot, dt):
    """Apply (drot, dt) deltas to a w2c pose (camera_opt.jl:26-31)."""
    dR = rotation_6d_to_matrix(drot + jnp.asarray(POSE_ID6))
    new_R = R_w2c @ dR
    new_t = R_w2c @ dt + t_w2c
    return new_R, new_t


class CameraOpt:
    """Holds the current pose and the zeroed deltas; `apply` absorbs an
    optimized delta into the pose (camera_opt.jl:33-53).

    The reference resets its Adam after every step (the delta always starts
    from zero), making each update a single bias-corrected Adam step — i.e.
    sign-like steps of size lr. Reproduced exactly.
    """

    def __init__(self, camera: Camera, lr: float = 1e-4):
        self.camera = camera
        self.lr = lr

    def params(self):
        return {
            "drot": jnp.zeros(6, jnp.float32),
            "dt": jnp.zeros(3, jnp.float32),
        }

    def pose(self, params):
        """(R, t) with the current deltas applied — feed to rasterize()."""
        return pose_delta(self.camera.R, self.camera.t, params["drot"], params["dt"])

    def apply(self, grads):
        """One single-step Adam update of the deltas, then absorb into the
        camera and reset. Returns the updated Camera."""
        eps = 1e-15
        upd = {}
        for k, g in grads.items():
            # Adam from zero state at t=1: mhat=g, vhat=g^2.
            upd[k] = -self.lr * g / (jnp.sqrt(g * g) + eps)
        new_R, new_t = pose_delta(
            self.camera.R, self.camera.t, upd["drot"], upd["dt"]
        )
        self.camera = self.camera.with_pose(new_R, new_t)
        return self.camera
