"""GaussianModel: the trainable scene as a static-capacity JAX pytree.

TPU-native re-design of the reference's mutable `GaussianModel`
(reference: src/gaussians.jl:2-61). The reference grows/shrinks raw device
arrays under densification; XLA wants static shapes, so here the model is a
flax.struct pytree with a *static capacity* and an `alive` mask:

  - rows [0, n_alive) hold real Gaussians, rows beyond are zero-padded and
    masked dead (opacity_raw = DEAD_OPACITY => sigmoid ~ 0, radius-culled
    in projection because scales are tiny);
  - densification (clone/split/relocate) is gather/scatter into free slots;
  - capacity growth is a host-side re-pad (one re-jit per capacity bucket).

Field layout is row-major (N, ...) — the natural XLA orientation — where the
reference is column-major (3, N) etc. All values are *raw* (pre-activation):
sigmoid(opacities), exp(scales), as in the reference.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..constants import SH0

# Raw opacity assigned to dead slots: sigmoid(-20) ~ 2e-9.
DEAD_OPACITY = -20.0
DEAD_SCALE = -20.0  # exp(-20) ~ 2e-9 world units -> radius-culled


def rgb_2_sh(c):
    """Color [0,1] -> degree-0 SH coefficient (gaussians.jl:131)."""
    return (c - 0.5) / SH0


def sh_2_rgb(s):
    return s * SH0 + 0.5


def inverse_sigmoid(x):
    return math.log(x / (1.0 - x)) if isinstance(x, float) else jnp.log(x / (1.0 - x))


def sh_degree_to_n_coeffs(d: int) -> int:
    return (d + 1) ** 2


@struct.dataclass
class GaussianModel:
    """Parameter pytree. Capacity = points.shape[0] (static)."""

    points: jnp.ndarray  # (C, 3) world positions
    features_dc: jnp.ndarray  # (C, 1, 3) SH degree-0
    features_rest: jnp.ndarray  # (C, (d+1)^2-1, 3) higher SH
    scales: jnp.ndarray  # (C, 3) or (C, 1) raw (pre-exp); 1 = isotropic
    rotations: jnp.ndarray  # (C, 4) quaternion wxyz, unnormalized
    opacities: jnp.ndarray  # (C,) raw (pre-sigmoid)
    alive: jnp.ndarray  # (C,) bool
    sh_degree: int = struct.field(pytree_node=False, default=3)

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    @property
    def n_alive(self):
        return jnp.sum(self.alive.astype(jnp.int32))

    @property
    def max_sh_degree(self) -> int:
        n = 1 + self.features_rest.shape[1]
        return int(math.isqrt(n)) - 1

    @property
    def isotropic(self) -> bool:
        return self.scales.shape[1] == 1

    def params(self) -> dict:
        """The trainable leaves, keyed with the reference's optimizer names
        (training.jl:233-239)."""
        return {
            "points": self.points,
            "features_dc": self.features_dc,
            "features_rest": self.features_rest,
            "scales": self.scales,
            "rotations": self.rotations,
            "opacities": self.opacities,
        }

    def replace_params(self, p: dict) -> "GaussianModel":
        return self.replace(
            points=p["points"],
            features_dc=p["features_dc"],
            features_rest=p["features_rest"],
            scales=p["scales"],
            rotations=p["rotations"],
            opacities=p["opacities"],
        )

    @classmethod
    def create(
        cls,
        points: np.ndarray,  # (N, 3)
        colors: np.ndarray,  # (N, 3) in [0, 1]
        scales: np.ndarray,  # (N,) initial world-space scale (std dev)
        *,
        capacity: int | None = None,
        max_sh_degree: int = 3,
        isotropic: bool = False,
        init_opacity: float = 0.1,
    ) -> "GaussianModel":
        """From a point cloud (reference ctor, gaussians.jl:22-61):
        colors -> rgb_2_sh dc, zero rest, log-scales, identity quats,
        opacity = inverse_sigmoid(0.1)."""
        n = points.shape[0]
        cap = capacity or n
        assert cap >= n
        n_rest = sh_degree_to_n_coeffs(max_sh_degree) - 1
        s_cols = 1 if isotropic else 3

        pts = np.zeros((cap, 3), np.float32)
        pts[:n] = points
        dc = np.zeros((cap, 1, 3), np.float32)
        dc[:n, 0] = rgb_2_sh(np.asarray(colors, np.float32))
        rest = np.zeros((cap, n_rest, 3), np.float32)
        sc = np.full((cap, s_cols), DEAD_SCALE, np.float32)
        sc[:n] = np.log(np.asarray(scales, np.float32))[:, None]
        rot = np.zeros((cap, 4), np.float32)
        rot[:, 0] = 1.0
        op = np.full((cap,), DEAD_OPACITY, np.float32)
        op[:n] = inverse_sigmoid(float(init_opacity))
        alive = np.zeros((cap,), bool)
        alive[:n] = True
        return cls(
            points=jnp.asarray(pts),
            features_dc=jnp.asarray(dc),
            features_rest=jnp.asarray(rest),
            scales=jnp.asarray(sc),
            rotations=jnp.asarray(rot),
            opacities=jnp.asarray(op),
            alive=jnp.asarray(alive),
            sh_degree=0,
        )

    def with_capacity(self, new_capacity: int) -> "GaussianModel":
        """Host-side re-pad to a larger capacity (one re-jit per bucket)."""
        assert new_capacity >= self.capacity
        pad = new_capacity - self.capacity
        if pad == 0:
            return self

        def _pad(x, fill=0.0):
            cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, cfg, constant_values=fill)

        return self.replace(
            points=_pad(self.points),
            features_dc=_pad(self.features_dc),
            features_rest=_pad(self.features_rest),
            scales=_pad(self.scales, DEAD_SCALE),
            rotations=jnp.concatenate(
                [
                    self.rotations,
                    jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (pad, 1)),
                ]
            ),
            opacities=_pad(self.opacities, DEAD_OPACITY),
            alive=_pad(self.alive, False),
        )

    def masked_opacities(self):
        """Raw opacities with dead slots clamped to DEAD_OPACITY, so padding
        never renders regardless of what the optimizer wrote there."""
        return jnp.where(self.alive, self.opacities, DEAD_OPACITY)

    def render_args(self):
        """(means, opacities_raw, scales_raw, rotations, sh_dc, sh_rest)
        in ops.rasterize.render order."""
        return (
            self.points,
            self.masked_opacities(),
            self.scales,
            self.rotations,
            self.features_dc,
            self.features_rest,
        )

    def compact(self) -> "GaussianModel":
        """Host-side: move alive rows to the front (keeps capacity)."""
        alive = np.asarray(self.alive)
        order = np.argsort(~alive, kind="stable")
        idx = jnp.asarray(order)
        return self.replace(
            points=self.points[idx],
            features_dc=self.features_dc[idx],
            features_rest=self.features_rest[idx],
            scales=self.scales[idx],
            rotations=self.rotations[idx],
            opacities=self.opacities[idx],
            alive=self.alive[idx],
        )


def reset_opacity(model: GaussianModel, max_opacity: float = 0.1) -> GaussianModel:
    """Clamp opacity to <= max (raw-space min), reference reset_opacity!
    (gaussians.jl:118-126)."""
    cap = inverse_sigmoid(float(max_opacity))
    return model.replace(opacities=jnp.minimum(model.opacities, cap))


# ---------------------------------------------------------------------------
# PLY interop — byte-compatible with the reference layout (gaussians.jl:157-247)
# so external 3DGS viewers open exports directly.
# ---------------------------------------------------------------------------


def export_ply(model: GaussianModel, path: str) -> None:
    """Binary little-endian PLY: x y z nx ny nz f_dc_* f_rest_* (channel-major)
    opacity scale_* rot_*, all `float` (gaussians.jl:157-200). Only alive rows."""
    alive = np.asarray(model.alive)
    pts = np.asarray(model.points)[alive]
    dc = np.asarray(model.features_dc)[alive]  # (n, 1, 3)
    rest = np.asarray(model.features_rest)[alive]  # (n, K-1, 3)
    scales = np.asarray(model.scales)[alive]
    if scales.shape[1] == 1:
        scales = np.repeat(scales, 3, axis=1)
    rots = np.asarray(model.rotations)[alive]
    ops = np.asarray(model.opacities)[alive]
    n, n_rest = pts.shape[0], rest.shape[1]

    props = ["x", "y", "z", "nx", "ny", "nz"]
    props += [f"f_dc_{i}" for i in range(3)]
    props += [f"f_rest_{i}" for i in range(3 * n_rest)]
    props += ["opacity"] + [f"scale_{i}" for i in range(3)] + [f"rot_{i}" for i in range(4)]

    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {p}\n" for p in props)
        + "end_header\n"
    )
    # channel-major f_rest: [ch0 of all coeffs..., ch1..., ch2...] (gaussians.jl:178)
    rest_cm = rest.transpose(0, 2, 1).reshape(n, 3 * n_rest)
    data = np.concatenate(
        [
            pts,
            np.zeros((n, 3), np.float32),  # normals (unused)
            dc.reshape(n, 3),
            rest_cm,
            ops[:, None],
            scales,
            rots,
        ],
        axis=1,
    ).astype("<f4")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(data.tobytes())


def import_ply(path: str, *, capacity: int | None = None) -> GaussianModel:
    """Read a reference-layout 3DGS PLY (tolerant of property order,
    gaussians.jl:208-247)."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        assert magic == b"ply", "not a PLY file"
        fmt = f.readline().strip()
        assert b"binary_little_endian" in fmt, f"unsupported PLY format: {fmt}"
        n = None
        names = []
        while True:
            line = f.readline().strip()
            if line == b"end_header":
                break
            parts = line.split()
            if parts[0] == b"element":
                assert parts[1] == b"vertex"
                n = int(parts[2])
            elif parts[0] == b"property":
                t = parts[1].decode()
                assert t in ("float", "float32"), f"unsupported property type {t}"
                names.append(parts[2].decode())
        raw = np.frombuffer(f.read(n * len(names) * 4), "<f4").reshape(n, len(names))

    col = {name: i for i, name in enumerate(names)}
    pts = raw[:, [col["x"], col["y"], col["z"]]]
    dc = raw[:, [col["f_dc_0"], col["f_dc_1"], col["f_dc_2"]]].reshape(n, 1, 3)
    n_rest = sum(1 for k in col if k.startswith("f_rest_")) // 3
    if n_rest:
        rest_cm = raw[:, [col[f"f_rest_{i}"] for i in range(3 * n_rest)]]
        rest = rest_cm.reshape(n, 3, n_rest).transpose(0, 2, 1)
    else:
        rest = np.zeros((n, 0, 3), np.float32)
    scales = raw[:, [col["scale_0"], col["scale_1"], col["scale_2"]]]
    rots = raw[:, [col["rot_0"], col["rot_1"], col["rot_2"], col["rot_3"]]]
    ops = raw[:, col["opacity"]]

    cap = capacity or n
    model = GaussianModel(
        points=jnp.zeros((cap, 3), jnp.float32).at[:n].set(pts),
        features_dc=jnp.zeros((cap, 1, 3), jnp.float32).at[:n].set(dc),
        features_rest=jnp.zeros((cap, rest.shape[1], 3), jnp.float32).at[:n].set(rest),
        scales=jnp.full((cap, 3), DEAD_SCALE, jnp.float32).at[:n].set(scales),
        rotations=jnp.zeros((cap, 4), jnp.float32).at[:, 0].set(1.0).at[:n].set(rots),
        opacities=jnp.full((cap,), DEAD_OPACITY, jnp.float32).at[:n].set(ops),
        alive=jnp.zeros((cap,), bool).at[:n].set(True),
        sh_degree=int(math.isqrt(1 + rest.shape[1])) - 1,
    )
    return model


def knn_mean_sq_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean squared distance to the k nearest neighbors — the reference's
    initial-scale heuristic (dataset.jl:236-249, NearestNeighbors KDTree).
    Host-side scipy cKDTree."""
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    d, _ = tree.query(points, k=k + 1)  # first hit is the point itself
    msd = np.mean(d[:, 1:] ** 2, axis=1)
    return np.maximum(msd, 1e-12).astype(np.float32)


def initial_scales(points: np.ndarray) -> np.ndarray:
    """sqrt(mean 3-NN squared distance), the reference init (dataset.jl:239-247)."""
    return np.sqrt(knn_mean_sq_dist(points, 3))
