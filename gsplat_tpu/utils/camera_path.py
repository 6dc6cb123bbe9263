"""Keyframed camera paths: spline interpolation, TOML I/O, video capture.

Headless re-design of the reference's GUI camera-path subsystem
(gui/camera_path.jl, camera_path_io.jl, capture_mode.jl): keyframes hold a
camera pose; playback interpolates positions with a Catmull-Rom spline and
rotations with quaternion slerp (the NU.CameraKeyframe/spline machinery the
reference pulls from NerfUtils); capture renders the interpolated cameras to
PNG frames and, when imageio's ffmpeg is available, an mp4.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from ..camera import Camera


def rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> (w, x, y, z) unit quaternion."""
    R = np.asarray(R, np.float64)
    tr = np.trace(R)
    if tr > 0:
        w = np.sqrt(1.0 + tr) / 2.0
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 1e-12)) * 2
        q = np.zeros(4)
        q[1 + i] = s / 4
        q[0] = (R[k, j] - R[j, k]) / s
        q[1 + j] = (R[j, i] + R[i, j]) / s
        q[1 + k] = (R[k, i] + R[i, k]) / s
        w, x, y, z = q
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = np.asarray(q, np.float64) / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def slerp(q0, q1, t: float) -> np.ndarray:
    q0 = np.asarray(q0, np.float64)
    q1 = np.asarray(q1, np.float64)
    d = float(np.dot(q0, q1))
    if d < 0:
        q1, d = -q1, -d
    if d > 0.9995:
        out = q0 + t * (q1 - q0)
        return out / np.linalg.norm(out)
    th = np.arccos(np.clip(d, -1, 1))
    return (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)


def catmull_rom(p0, p1, p2, p3, t: float) -> np.ndarray:
    """Centripetal-ish Catmull-Rom position spline segment p1->p2."""
    t2, t3 = t * t, t * t * t
    return 0.5 * (
        (2 * p1)
        + (-p0 + p2) * t
        + (2 * p0 - 5 * p1 + 4 * p2 - p3) * t2
        + (-p0 + 3 * p1 - 3 * p2 + p3) * t3
    )


@dataclass
class CameraPath:
    """Ordered keyframes of (c2w position, c2w rotation quaternion, fov).

    Keyframes carry the capturing camera's intrinsics as (fov_x, fov_y) —
    resolution-independent, like the reference's NU.CameraKeyframe which
    stores the GUI camera's intrinsics (gui/camera_path.jl:75) — so a
    capture of a dataset-fit path reproduces the dataset's field of view
    at any output resolution. Paths loaded from older TOMLs (no `fov`
    key) fall back to the base camera's intrinsics."""

    positions: list = field(default_factory=list)  # world-space camera centers
    quats: list = field(default_factory=list)  # c2w rotation (w, x, y, z)
    fovs: list = field(default_factory=list)  # (fov_x, fov_y) radians, or None

    def append(self, camera: Camera) -> None:
        from ..camera import focal2fov

        R_c2w = np.asarray(camera.R).T
        self.positions.append(np.asarray(camera.camera_center, np.float64).copy())
        self.quats.append(rotmat_to_quat(R_c2w))
        fx, fy = np.asarray(camera.focal, np.float64)
        self.fovs.append(
            np.array([focal2fov(fx, camera.width), focal2fov(fy, camera.height)])
        )

    def __len__(self):
        return len(self.positions)

    def _has_fovs(self) -> bool:
        return len(self.fovs) == len(self.positions) and all(
            f is not None for f in self.fovs
        )

    def sample(self, u: float):
        """Pose at path parameter u in [0, 1]. Returns (R_w2c, t_w2c, fov)
        with fov = (fov_x, fov_y) linearly interpolated, or None when the
        path has no stored intrinsics."""
        n = len(self)
        assert n >= 2, "need at least 2 keyframes"
        s = u * (n - 1)
        i = min(int(np.floor(s)), n - 2)
        t = s - i
        P = self.positions
        p0 = P[max(i - 1, 0)]
        p3 = P[min(i + 2, n - 1)]
        pos = catmull_rom(p0, P[i], P[i + 1], p3, t)
        q = slerp(self.quats[i], self.quats[i + 1], t)
        R_c2w = quat_to_rotmat(q)
        R = R_c2w.T
        fov = None
        if self._has_fovs():
            fov = (1 - t) * np.asarray(self.fovs[i]) + t * np.asarray(self.fovs[i + 1])
        return R.astype(np.float32), (-R @ pos).astype(np.float32), fov

    def cameras(self, base: Camera, n_frames: int):
        from ..camera import fov2focal

        for k in range(n_frames):
            u = k / max(n_frames - 1, 1)
            R, t, fov = self.sample(u)
            cam = base.with_pose(R, t)
            if fov is not None:
                cam = cam.replace(
                    focal=np.array(
                        [fov2focal(fov[0], base.width), fov2focal(fov[1], base.height)],
                        np.float32,
                    )
                )
            yield cam

    # -- TOML I/O (reference camera_path_io.jl) -----------------------------

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write("# gsplat_tpu camera path\n")
            for k, (p, q) in enumerate(zip(self.positions, self.quats)):
                f.write("[[keyframe]]\n")
                f.write("position = [%r, %r, %r]\n" % tuple(float(v) for v in p))
                f.write("rotation = [%r, %r, %r, %r]\n" % tuple(float(v) for v in q))
                if k < len(self.fovs) and self.fovs[k] is not None:
                    f.write("fov = [%r, %r]\n" % tuple(float(v) for v in self.fovs[k]))

    @classmethod
    def load(cls, path: str) -> "CameraPath":
        import tomllib

        with open(path, "rb") as f:
            data = tomllib.load(f)
        out = cls()
        for kf in data.get("keyframe", []):
            out.positions.append(np.asarray(kf["position"], np.float64))
            q = np.asarray(kf["rotation"], np.float64)
            out.quats.append(q / np.linalg.norm(q))
            fov = kf.get("fov")
            out.fovs.append(np.asarray(fov, np.float64) if fov is not None else None)
        return out


def capture_path(
    model,
    path: CameraPath,
    base_camera: Camera,
    out: str,
    *,
    n_frames: int = 120,
    fps: int = 30,
    sh_degree: int | None = None,
    max_instances: int | None = None,
):
    """Render the interpolated path to `out` (mp4 if imageio+ffmpeg can,
    else a directory of PNGs). Reference capture_mode.jl, headless."""
    import jax
    import numpy as np

    from ..ops.rasterize import RasterizerConfig, render

    on_tpu = jax.default_backend() == "tpu"
    cfg = RasterizerConfig(
        width=base_camera.width,
        height=base_camera.height,
        mode="rgb",
        max_instances=max_instances or ((1 << 20) if on_tpu else (1 << 16)),
        impl="pallas" if on_tpu else "scan",
        chunk=32,  # forward-only table (see viewer.py / micro15)
    )
    deg = model.max_sh_degree if sh_degree is None else sh_degree

    # One jitted closure (eager per-frame rendering dispatches every op
    # through the remote-TPU tunnel) + one frame in flight: dispatch frame
    # k+1, then fetch frame k — the host-side encode overlaps device work.
    import dataclasses

    def make_fwd(cfg):
        return jax.jit(
            lambda args, cam: render(args[0], args[1], args[2], args[3],
                                     args[4], args[5], camera=cam, config=cfg,
                                     sh_degree=deg)
        )

    fwd = make_fwd(cfg)
    args = model.render_args()

    # A truncated (instance-budget overflow) frame renders only the lowest
    # tiles: probe the first frame and grow to demand before committing to
    # the whole path. Instance demand varies with camera pose ALONG the
    # path too, so every frame's aux["overflow"] is checked in the retire
    # callback and overflowing frames are re-rendered afterwards with a
    # grown budget (same pattern as api.render_views).
    first_cam = next(iter(path.cameras(base_camera, 1)))
    for _ in range(4):
        _img, aux = fwd(args, first_cam)
        if not bool(aux["overflow"]):
            break
        grown = max(2 * cfg.max_instances, int(aux["p_instances"]) * 9 // 8)
        print(f"[capture] instance budget overflow; growing to {grown}",
              flush=True)
        cfg = dataclasses.replace(cfg, max_instances=grown)
        fwd = make_fwd(cfg)

    def to_u8(img):
        return np.clip(np.asarray(img[..., :3]) * 255, 0, 255).astype(np.uint8)

    from .pipeline import pipelined

    cams = list(path.cameras(base_camera, n_frames))
    frames = []
    overflowed = []

    def retire(out):
        img, aux = out
        if bool(aux["overflow"]):
            overflowed.append(len(frames))
        frames.append(to_u8(img))

    pipelined(cams, lambda cam: fwd(args, cam), retire)

    for idx in overflowed:
        rcfg, rfwd = cfg, fwd
        for _ in range(4):
            img, aux = rfwd(args, cams[idx])
            if not bool(aux["overflow"]):
                break
            grown = max(2 * rcfg.max_instances, int(aux["p_instances"]) * 9 // 8)
            print(f"[capture] frame {idx} overflowed; re-rendering at budget "
                  f"{grown}", flush=True)
            rcfg = dataclasses.replace(rcfg, max_instances=grown)
            rfwd = make_fwd(rcfg)
        else:
            print(f"[capture] frame {idx} still overflowing after regrow; "
                  "frame is truncated", flush=True)
        frames[idx] = to_u8(img)
        cfg, fwd = rcfg, rfwd  # later overflow frames start from here

    if out.endswith(".mp4"):
        try:
            import imageio.v2 as imageio

            imageio.mimwrite(out, frames, fps=fps)
            return out
        except Exception as e:
            print(f"[capture] mp4 write failed ({e}); writing PNG frames instead")
            out = os.path.splitext(out)[0] + "_frames"
    os.makedirs(out, exist_ok=True)
    from PIL import Image

    for i, fr in enumerate(frames):
        Image.fromarray(fr).save(os.path.join(out, f"frame_{i:05d}.png"))
    return out
