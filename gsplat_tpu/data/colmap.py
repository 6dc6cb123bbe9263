"""COLMAP dataset loading: binary sparse-reconstruction parsers + dataset.

The reference delegates COLMAP parsing to NerfUtils.jl and wraps it in
`ColmapDataset` (reference: src/dataset.jl:7-219). Here the binary parsers
are implemented directly (the COLMAP format is public:
cameras.bin / images.bin / points3D.bin) and the dataset is a host-side
store of numpy images + Camera pytrees; per-step image upload happens in the
trainer (the reference's H2D boundary, training.jl:587-592).

Reference semantics preserved for metric parity:
  - images resized to a multiple of 16 (rounding UP, so renders are <=1%
    larger than other implementations — documented deviation,
    GaussianSplatting.jl:253-258), focal/principal rescaled accordingly;
  - test split = every `holdout`-th view by sorted filename (llffhold=8);
  - camera extent = 1.1 x max camera-to-centroid distance (dataset.jl:150);
  - initial scales = sqrt(mean 3-NN squared distance) over the SfM cloud.
"""
from __future__ import annotations

import os
import struct as _struct
from dataclasses import dataclass, field

import numpy as np

from ..camera import Camera

# COLMAP camera model ids -> (name, n_params)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}


def _read(f, fmt):
    size = _struct.calcsize(fmt)
    return _struct.unpack(fmt, f.read(size))


def read_cameras_bin(path):
    """-> {camera_id: dict(model, width, height, params)}."""
    cams = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            cam_id, model_id = _read(f, "<ii")
            w, h = _read(f, "<QQ")
            name, n_params = CAMERA_MODELS[model_id]
            params = np.array(_read(f, f"<{n_params}d"))
            cams[cam_id] = dict(model=name, width=int(w), height=int(h), params=params)
    return cams


def read_images_bin(path):
    """-> {image_id: dict(qvec wxyz, tvec, camera_id, name)} (2D points skipped)."""
    images = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            (image_id,) = _read(f, "<i")
            qvec = np.array(_read(f, "<4d"))
            tvec = np.array(_read(f, "<3d"))
            (camera_id,) = _read(f, "<i")
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_p2d,) = _read(f, "<Q")
            f.seek(24 * n_p2d, os.SEEK_CUR)  # x, y f64 + point3D_id i64
            images[image_id] = dict(
                qvec=qvec, tvec=tvec, camera_id=camera_id, name=name.decode("utf-8")
            )
    return images


def read_points3d_bin(path):
    """-> (xyz (N,3) f64, rgb (N,3) u8)."""
    xyzs, rgbs = [], []
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            data = _read(f, "<QdddBBBd")
            xyzs.append(data[1:4])
            rgbs.append(data[4:7])
            (track_len,) = _read(f, "<Q")
            f.seek(8 * track_len, os.SEEK_CUR)
    return np.array(xyzs, np.float64), np.array(rgbs, np.uint8)


def qvec_to_rotmat(q):
    """COLMAP quaternion (w, x, y, z) -> world-to-camera rotation."""
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def round_up16(x: int) -> int:
    return -(-x // 16) * 16


def _intrinsics(cam):
    """(fx, fy, cx, cy) from a COLMAP camera (pinhole family only; distorted
    models use their pinhole part — the reference makes the same
    simplification via NerfUtils)."""
    p = cam["params"]
    if cam["model"] in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "SIMPLE_RADIAL_FISHEYE"):
        return p[0], p[0], p[1], p[2]
    return p[0], p[1], p[2], p[3]


@dataclass
class ColmapDataset:
    """Host-side dataset: images as float32 numpy (H, W, 3) in [0,1]."""

    cameras: list  # list[Camera] all views
    images: list  # list[np.ndarray] (H, W, 3) f32, aligned with cameras
    names: list  # filenames, aligned
    train_ids: list
    test_ids: list
    points: np.ndarray  # (N, 3) SfM cloud
    colors: np.ndarray  # (N, 3) in [0, 1]
    scales: np.ndarray  # (N,) initial per-gaussian scale
    camera_extent: float
    depths: list = field(default_factory=list)  # optional per-view depth priors
    depth_qsteps: list = field(default_factory=list)  # per-prior quantization step
    sky_masks: list = field(default_factory=list)  # optional soft sky masks
    root: str | None = None  # dataset directory (sidecar caches live here)

    @property
    def n_train(self):
        return len(self.train_ids)

    @property
    def n_test(self):
        return len(self.test_ids)

    def get_train(self, i):
        vid = self.train_ids[i]
        return self.cameras[vid], self.images[vid]

    def get_test(self, i):
        vid = self.test_ids[i]
        return self.cameras[vid], self.images[vid]

    def thumbnail(self, vid: int, max_width: int = 128) -> np.ndarray:
        """View `vid` downscaled to at most `max_width` px wide, aspect kept,
        as uint8 (h, w, 3) — the GUI frustum-overlay image planes
        (reference thumbnail, dataset.jl:226-234)."""
        img = self.images[vid]
        h, w = img.shape[:2]
        if w > max_width:
            from PIL import Image

            im = Image.fromarray(
                (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)
            )
            im = im.resize(
                (max_width, max(1, round(h * max_width / w))), Image.BILINEAR
            )
            return np.asarray(im)
        return (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)


def load_colmap(
    path: str,
    *,
    scale: int = 1,
    holdout: int = 8,
    max_extent: float = float("inf"),
    permute: bool = True,
    load_depths: bool = False,
    load_sky_masks: bool = False,
) -> ColmapDataset:
    """Load `<path>/sparse/0/*.bin` + `<path>/images[_<scale>]/`.

    `holdout=8` puts every 8th view (by sorted filename) in the test split
    (llffhold protocol); 0 disables the split (dataset.jl:120-136).
    """
    from PIL import Image

    sparse = os.path.join(path, "sparse", "0")
    if not os.path.isdir(sparse):
        sparse = os.path.join(path, "sparse")
    cams_bin = read_cameras_bin(os.path.join(sparse, "cameras.bin"))
    images_bin = read_images_bin(os.path.join(sparse, "images.bin"))
    xyz, rgb = read_points3d_bin(os.path.join(sparse, "points3D.bin"))

    img_dir = os.path.join(path, f"images_{scale}" if scale > 1 else "images")
    if not os.path.isdir(img_dir):
        img_dir = os.path.join(path, "images")

    entries = sorted(images_bin.values(), key=lambda e: e["name"])
    cameras, images, names = [], [], []
    centers = []
    depths, depth_qsteps, sky_masks = [], [], []

    # Native threaded decode+resize (C++ libjpeg/libpng + Lanczos-3; see
    # gsplat_tpu/native) when the library builds; PIL otherwise / on opt-out.
    use_native = os.environ.get("GSPLAT_NATIVE_IO", "1") != "0"
    if use_native:
        from .. import native

        use_native = native.available()

    kept, sizes, paths = [], [], []
    for e in entries:
        img_path = os.path.join(img_dir, e["name"])
        if not os.path.exists(img_path):
            continue
        with Image.open(img_path) as im:  # header-only size probe
            w0, h0 = im.size
        cam = cams_bin[e["camera_id"]]
        # If images/ holds full-res but scale > 1, downscale now.
        ds = cam["width"] / w0
        w = round_up16(round(w0 / (scale / ds))) if ds < scale else round_up16(w0)
        h = round_up16(round(h0 / (scale / ds))) if ds < scale else round_up16(h0)
        kept.append((e, w0, h0))
        sizes.append((w, h))
        paths.append(img_path)

    arrs = None
    if use_native and paths:
        from .. import native

        try:
            arrs = native.decode_batch(paths, sizes)
        except IOError:
            arrs = None  # unsupported codec somewhere: PIL fallback

    for i, (e, w0, h0) in enumerate(kept):
        w, h = sizes[i]
        cam = cams_bin[e["camera_id"]]
        if arrs is not None:
            arr = arrs[i]
        else:
            with Image.open(paths[i]) as im:
                im = im.convert("RGB")
                if (w, h) != (w0, h0):
                    im = im.resize((w, h), Image.LANCZOS)
                arr = np.asarray(im, np.float32) / 255.0

        fx, fy, cx, cy = _intrinsics(cam)
        sx, sy = w / cam["width"], h / cam["height"]
        R = qvec_to_rotmat(e["qvec"]).astype(np.float32)
        t = e["tvec"].astype(np.float32)
        camera = Camera.create(
            R=R,
            t=t,
            width=w,
            height=h,
            focal=np.array([fx * sx, fy * sy], np.float32),
            principal=np.array([cx * sx / w, cy * sy / h], np.float32),
        )
        cameras.append(camera)
        images.append(arr)
        names.append(e["name"])
        centers.append(-R.T @ t)

        stem = os.path.splitext(e["name"])[0]
        if load_depths:
            dp = os.path.join(path, "depths", stem + ".png")
            if os.path.exists(dp):
                d, q = _load_gray(dp, (w, h))
                depths.append(d)
                depth_qsteps.append(q)
            else:
                depths.append(None)
                depth_qsteps.append(0.0)
        if load_sky_masks:
            sp = os.path.join(path, "sky", stem + ".png")
            sky_masks.append(_load_gray(sp, (w, h))[0] if os.path.exists(sp) else None)

    if not cameras:
        raise FileNotFoundError(f"no images found under {img_dir}")

    centers = np.stack(centers)
    centroid = centers.mean(axis=0)
    extent = 1.1 * float(np.max(np.linalg.norm(centers - centroid, axis=1)))
    extent = min(max(extent, 1e-3), max_extent)

    ids = list(range(len(cameras)))
    if holdout and holdout > 0:
        test_ids = ids[::holdout]
        train_ids = [i for i in ids if i % holdout != 0]
    else:
        train_ids, test_ids = ids, []

    from ..models.gaussians import initial_scales

    pts = xyz.astype(np.float32)
    return ColmapDataset(
        cameras=cameras,
        images=images,
        names=names,
        train_ids=train_ids,
        test_ids=test_ids,
        points=pts,
        colors=rgb.astype(np.float32) / 255.0,
        scales=initial_scales(pts),
        camera_extent=extent,
        depths=depths,
        depth_qsteps=depth_qsteps,
        sky_masks=sky_masks,
        root=path,
    )


def _load_gray(path, size_wh):
    """Grayscale map normalized to [0, 1] plus the source encoding's
    quantization step (1/255 for 8-bit, 1/65535 for 16-bit, 0 for float
    formats) — the step sizes the depth-loss deadband so the model is not
    pulled onto the prior's quantization staircase
    (reference load_depth_prior, depth_supervision.jl:28-36)."""
    from PIL import Image

    with Image.open(path) as im:
        mode = im.mode
        if mode in ("I;16", "I;16B", "I;16L", "I"):
            denom, qstep = 65535.0, 1.0 / 65535.0
        elif mode == "F":
            denom, qstep = 1.0, 0.0
        else:  # 8-bit (L/P/RGB/...)
            denom, qstep = 255.0, 1.0 / 255.0
        im = im.convert("F")
        if im.size != size_wh:
            im = im.resize(size_wh, Image.BILINEAR)
        return np.asarray(im, np.float32) / denom, qstep


# ---------------------------------------------------------------------------
# Synthetic scene generator — used by tests and the training smoke path.
# ---------------------------------------------------------------------------


def make_synthetic_dataset(
    n_points: int = 200,
    n_views: int = 12,
    width: int = 64,
    height: int = 64,
    holdout: int = 4,
    seed: int = 0,
) -> ColmapDataset:
    """A random colored point cloud viewed from a camera ring, with ground
    truth images rendered by the scan rasterizer (so training against it is
    a well-posed inverse problem)."""
    import jax.numpy as jnp

    from ..camera import look_at
    from ..models.gaussians import GaussianModel, initial_scales
    from ..ops.rasterize import RasterizerConfig, render

    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1.0, 1.0, (n_points, 3)).astype(np.float32)
    colors = rng.uniform(0.1, 0.9, (n_points, 3)).astype(np.float32)
    scales = initial_scales(pts) * 1.5

    gt = GaussianModel.create(pts, colors, scales, max_sh_degree=0, init_opacity=0.8)
    cfg = RasterizerConfig(
        width=width, height=height, mode="rgb", max_instances=1 << 16, impl="scan"
    )

    cameras, images, names = [], [], []
    centers = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        eye = np.array([3.5 * np.cos(ang), 0.6, 3.5 * np.sin(ang)])
        R, t = look_at(eye, np.zeros(3))
        cam = Camera.create(
            R=R, t=t, width=width, height=height,
            focal=np.array([width * 0.8, width * 0.8], np.float32),
        )
        img, _ = render(*gt.render_args(), camera=cam, config=cfg, sh_degree=0)
        cameras.append(cam)
        images.append(np.asarray(img))
        names.append(f"view_{i:03d}.png")
        centers.append(eye)

    centers = np.stack(centers)
    extent = 1.1 * float(np.max(np.linalg.norm(centers - centers.mean(0), axis=1)))
    ids = list(range(n_views))
    return ColmapDataset(
        cameras=cameras,
        images=images,
        names=names,
        train_ids=[i for i in ids if holdout == 0 or i % holdout != 0],
        test_ids=ids[::holdout] if holdout else [],
        points=pts,
        colors=colors,
        scales=scales,
        camera_extent=extent,
    )
