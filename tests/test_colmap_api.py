"""COLMAP binary I/O round-trip + API layer (main/benchmark/CLI).

The reference leans on NerfUtils for COLMAP parsing; here the parsers are
ours, so they get a write-read round-trip test against a synthesized scene.
"""
import os
import struct as _struct

import numpy as np
import pytest

from gsplat_tpu.data.colmap import (
    load_colmap,
    make_synthetic_dataset,
    read_cameras_bin,
    read_images_bin,
    read_points3d_bin,
    round_up16,
)
from gsplat_tpu.train.params_io import load_opt_params, save_opt_params, with_params
from gsplat_tpu.train.optim import OptimizationParams
from gsplat_tpu.train.logging import LossHistory, LossLog, LossTracker


def write_colmap_scene(root, dataset):
    """Serialize a synthetic dataset as a COLMAP binary scene + images/."""
    from PIL import Image

    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir, exist_ok=True)

    cam0 = dataset.cameras[0]
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(_struct.pack("<Q", 1))
        fx, fy = float(cam0.focal[0]), float(cam0.focal[1])
        cx = float(cam0.principal[0]) * cam0.width
        cy = float(cam0.principal[1]) * cam0.height
        f.write(_struct.pack("<iiQQ", 1, 1, cam0.width, cam0.height))  # PINHOLE
        f.write(_struct.pack("<4d", fx, fy, cx, cy))

    def rot_to_qvec(R):
        # Shepperd's method: branch on the largest of (trace, R00, R11, R22)
        # so 180-degree rotations (w == 0) stay finite.
        tr = R[0, 0] + R[1, 1] + R[2, 2]
        if tr > max(R[0, 0], R[1, 1], R[2, 2]):
            s = 2.0 * np.sqrt(1.0 + tr)
            q = [s / 4, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
                 (R[1, 0] - R[0, 1]) / s]
        elif R[0, 0] >= max(R[1, 1], R[2, 2]):
            s = 2.0 * np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2])
            q = [(R[2, 1] - R[1, 2]) / s, s / 4, (R[0, 1] + R[1, 0]) / s,
                 (R[0, 2] + R[2, 0]) / s]
        elif R[1, 1] >= R[2, 2]:
            s = 2.0 * np.sqrt(1.0 - R[0, 0] + R[1, 1] - R[2, 2])
            q = [(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s, s / 4,
                 (R[1, 2] + R[2, 1]) / s]
        else:
            s = 2.0 * np.sqrt(1.0 - R[0, 0] - R[1, 1] + R[2, 2])
            q = [(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
                 (R[1, 2] + R[2, 1]) / s, s / 4]
        return np.array(q)

    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(_struct.pack("<Q", len(dataset.cameras)))
        for i, cam in enumerate(dataset.cameras):
            q = rot_to_qvec(np.asarray(cam.R, np.float64))
            t = np.asarray(cam.t, np.float64)
            f.write(_struct.pack("<i", i + 1))
            f.write(_struct.pack("<4d", *q))
            f.write(_struct.pack("<3d", *t))
            f.write(_struct.pack("<i", 1))
            f.write(dataset.names[i].encode() + b"\x00")
            f.write(_struct.pack("<Q", 0))
            img = (np.asarray(dataset.images[i]) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(imgdir, dataset.names[i]))

    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(_struct.pack("<Q", len(dataset.points)))
        for i, (p, c) in enumerate(zip(dataset.points, dataset.colors)):
            f.write(_struct.pack("<Q", i + 1))
            f.write(_struct.pack("<3d", *p.astype(np.float64)))
            f.write(_struct.pack("<3B", *(c * 255).astype(np.uint8)))
            f.write(_struct.pack("<d", 0.5))
            f.write(_struct.pack("<Q", 0))


@pytest.fixture(scope="module")
def colmap_scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    ds = make_synthetic_dataset(n_points=100, n_views=9, width=48, height=48)
    write_colmap_scene(root, ds)
    return root, ds


def test_colmap_binary_roundtrip(colmap_scene):
    root, ds = colmap_scene
    sparse = os.path.join(root, "sparse", "0")
    cams = read_cameras_bin(os.path.join(sparse, "cameras.bin"))
    assert cams[1]["model"] == "PINHOLE"
    assert cams[1]["width"] == 48
    imgs = read_images_bin(os.path.join(sparse, "images.bin"))
    assert len(imgs) == 9
    assert imgs[1]["name"] == ds.names[0]
    xyz, rgb = read_points3d_bin(os.path.join(sparse, "points3D.bin"))
    np.testing.assert_allclose(xyz, ds.points, atol=1e-6)
    np.testing.assert_allclose(rgb / 255.0, ds.colors, atol=1 / 255.0)


def test_load_colmap_dataset(colmap_scene):
    root, ds = colmap_scene
    loaded = load_colmap(root, holdout=4)
    assert len(loaded.cameras) == 9
    assert loaded.test_ids == [0, 4, 8]
    assert len(loaded.train_ids) == 6
    # Camera poses survive the quaternion round-trip.
    i = ds.names.index(loaded.names[0])
    np.testing.assert_allclose(
        np.asarray(loaded.cameras[0].R), np.asarray(ds.cameras[i].R), atol=1e-5
    )
    # Images round-trip through 8-bit PNG.
    np.testing.assert_allclose(loaded.images[0], ds.images[i], atol=2 / 255.0)
    assert loaded.camera_extent == pytest.approx(ds.camera_extent, rel=1e-3)
    # Initial scales from the kNN heuristic are positive.
    assert np.all(loaded.scales > 0)


def test_round_up16():
    assert round_up16(48) == 48
    assert round_up16(47) == 48
    assert round_up16(49) == 64


def test_main_trains_on_colmap_scene(colmap_scene, tmp_path):
    from gsplat_tpu.api import main

    root, _ = colmap_scene
    ck = str(tmp_path / "out.safetensors")
    ply = str(tmp_path / "out.ply")
    trainer = main(
        root, scale=1, n_steps=20, strategy=None, holdout=4,
        checkpoint=ck, ply=ply, log_every=10, max_instances=8192,
    )
    assert trainer.step == 20
    assert os.path.exists(ck) and os.path.exists(ply)
    from gsplat_tpu.models.gaussians import import_ply

    m = import_ply(ply)
    assert int(m.n_alive) > 0


def test_opt_params_toml_roundtrip(tmp_path):
    p = OptimizationParams(use_sky_dome=True, lr_feature=1e-3, sky_dome_points=1000)
    path = str(tmp_path / "params.toml")
    save_opt_params(path, p)
    p2 = load_opt_params(path)
    assert p2 == p
    # Partial file takes defaults.
    with open(path, "w") as f:
        f.write('lambda_dssim = 0.3\n')
    p3 = load_opt_params(path)
    assert p3.lambda_dssim == 0.3
    assert p3.lr_feature == OptimizationParams().lr_feature
    # Strict errors.
    with pytest.raises(KeyError):
        with_params(p, nonsense=1)
    with pytest.raises(TypeError):
        with_params(p, lambda_dssim="high")
    with pytest.raises(ValueError):
        with_params(p, sky_dome_shape="cube")
    with pytest.raises(TypeError):
        with_params(p, use_sky_dome=1)


def test_loss_log_ema():
    log = LossLog(horizon=10)
    for _ in range(100):
        log.record(2.0)
    assert log.smoothed == pytest.approx(2.0, rel=1e-6)
    # Bias correction: early smoothed value equals the sample, not a
    # zero-diluted average.
    log2 = LossLog(horizon=200)
    log2.record(5.0)
    assert log2.smoothed == pytest.approx(5.0, rel=1e-6)


def test_loss_history_thinning():
    h = LossHistory(capacity=16)
    for step in range(100):
        h.record(step, {"total": float(step)})
    assert len(h.steps) <= 16
    assert h.interval > 1
    # Monotone steps, last sample recent.
    assert h.steps == sorted(h.steps)
    assert h.steps[-1] >= 90 - h.interval
    snap = h.snapshot()
    snap["steps"].append(999)
    assert h.steps[-1] != 999  # snapshot isolation


def test_camera_path_spline_and_io(tmp_path):
    from gsplat_tpu.camera import Camera, look_at
    from gsplat_tpu.utils.camera_path import CameraPath

    path = CameraPath()
    for i in range(4):
        ang = i * np.pi / 4
        R, t = look_at(np.array([3 * np.cos(ang), 0.5, 3 * np.sin(ang)]), np.zeros(3))
        path.append(Camera.create(R=R, t=t, width=64, height=64,
                                  focal=np.array([60.0, 60.0], np.float32)))
    # Endpoint interpolation hits the keyframes.
    R0, t0, _ = path.sample(0.0)
    c0 = -R0.T @ t0
    np.testing.assert_allclose(c0, path.positions[0], atol=1e-5)
    R1, t1, _ = path.sample(1.0)
    np.testing.assert_allclose(-R1.T @ t1, path.positions[-1], atol=1e-5)
    # Rotations stay orthonormal along the path.
    for u in np.linspace(0, 1, 9):
        R, _, _ = path.sample(float(u))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # TOML round-trip.
    f = str(tmp_path / "path.toml")
    path.save(f)
    p2 = CameraPath.load(f)
    np.testing.assert_allclose(np.stack(p2.positions), np.stack(path.positions), atol=1e-12)
    np.testing.assert_allclose(np.stack(p2.quats), np.stack(path.quats), atol=1e-12)


def test_memory_usage_and_debug_report():
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.train.trainer import TrainState
    from gsplat_tpu.utils.debug import memory_usage, nonfinite_gradient_report
    import jax.numpy as jnp

    pts = np.zeros((10, 3), np.float32)
    model = GaussianModel.create(pts, np.full((10, 3), 0.5, np.float32),
                                 np.full(10, 0.1, np.float32), max_sh_degree=0)
    state = TrainState.create(model)
    mu = memory_usage(state)
    assert mu["model"] > 0 and mu["total"] > mu["model"]
    grads = {"points": jnp.zeros((10, 3)).at[3, 1].set(jnp.nan)}
    rep = nonfinite_gradient_report(grads, model)
    assert "points" in rep and "3" in rep


def test_viewer_render_frame():
    from gsplat_tpu.data.colmap import make_synthetic_dataset
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.viewer import Viewer

    ds = make_synthetic_dataset(n_points=50, n_views=3, width=48, height=48)
    model = GaussianModel.create(ds.points, ds.colors, ds.scales, max_sh_degree=0)
    v = Viewer(model, width=64, height=64, max_instances=4096)
    jpeg = v.render_frame([4.0, 1.0, 0.0], [0.0, 0.0, 0.0])
    assert jpeg[:2] == b"\xff\xd8"  # JPEG magic
    assert v.info()["n_gaussians"] == 50


def test_depth_prior_qstep_and_anchor_cache(tmp_path, monkeypatch):
    """Per-prior quantization step detection (8-bit vs 16-bit PNGs,
    reference depth_supervision.jl:28-36) and the fingerprinted anchor
    sidecar cache (a second startup skips the RANSAC fits,
    depth_supervision.jl:360-404)."""
    from PIL import Image

    from gsplat_tpu.data.colmap import load_colmap
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.train.optim import OptimizationParams
    from gsplat_tpu.train.trainer import Trainer

    # Needs >= 256 projected SfM samples per view (the RANSAC gate).
    root = str(tmp_path / "scene")
    ds = make_synthetic_dataset(n_points=600, n_views=9, width=48, height=48)
    write_colmap_scene(root, ds)
    ddir = os.path.join(root, "depths")
    os.makedirs(ddir, exist_ok=True)
    # Inverse-depth priors written at the SfM points' projected pixels (the
    # anchor fit samples prior values there against the points' camera
    # depths), alternating 8-bit / 16-bit encodings.
    for i, name in enumerate(ds.names):
        stem = os.path.splitext(name)[0]
        cam = ds.cameras[i]
        pc = (np.asarray(cam.R) @ ds.points.T + np.asarray(cam.t)[:, None]).T
        H, W = 48, 48
        f = np.asarray(cam.focal)
        pp = np.asarray(cam.principal) * np.array([W, H])
        z = np.maximum(pc[:, 2], 0.1)
        px = (pc[:, 0] / z * f[0] + pp[0]).astype(int)
        py = (pc[:, 1] / z * f[1] + pp[1]).astype(int)
        inb = (px >= 0) & (px < W) & (py >= 0) & (py < H) & (pc[:, 2] > 0.1)
        disp = np.clip(1.5 / z, 0, 1)
        prior = np.full((H, W), float(np.median(disp[inb])), np.float32)
        prior[py[inb], px[inb]] = disp[inb]
        if i % 2 == 0:
            Image.fromarray((prior * 255).astype(np.uint8)).save(
                os.path.join(ddir, stem + ".png")
            )
        else:
            arr16 = (prior * 65535).astype(np.uint16)
            Image.fromarray(arr16, mode="I;16").save(os.path.join(ddir, stem + ".png"))

    loaded = load_colmap(root, holdout=4, load_depths=True)
    assert loaded.root == root
    assert np.isclose(loaded.depth_qsteps[0], 1 / 255)
    assert np.isclose(loaded.depth_qsteps[1], 1 / 65535)
    assert 0.0 <= float(np.max(loaded.depths[0])) <= 1.0

    p = OptimizationParams(use_depth_loss=True)
    model = GaussianModel.create(loaded.points, loaded.colors, loaded.scales,
                                 max_sh_degree=0)
    t1 = Trainer(model, loaded, opt_params=p, max_instances=8192)
    cache = os.path.join(root, f"depth_anchors_{p.depth_loss_mode}.json")
    assert os.path.exists(cache)
    assert t1.depth_qsteps[0] == loaded.depth_qsteps[0]

    # Second startup: the cache satisfies the anchors; RANSAC must not run.
    import gsplat_tpu.models.depth_supervision as dsup

    def boom(*a, **k):
        raise AssertionError("fit_depth_anchors called despite a valid cache")

    monkeypatch.setattr(dsup, "fit_depth_anchors", boom)
    t2 = Trainer(model, loaded, opt_params=p, max_instances=8192)
    assert len(t2.anchors) == len(loaded.cameras)
    have = [a for a in t2.anchors if a is not None]
    assert have, "expected at least one usable cached anchor"


def test_training_viewer_live(tmp_path):
    """Live-training viewer: the RenderWorker-protocol analogue. Drives the
    HTTP surface end-to-end — start training, watch the step counter move,
    fetch a mid-training frame / loss curves / frusta / thumbnail, save a
    checkpoint — all while the worker thread shares the single-owner lock
    (reference: gui/worker.jl:410-496, training_details.jl:78-110)."""
    import json as _json
    import time as _time

    from gsplat_tpu.data.colmap import make_synthetic_dataset
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.train.trainer import Trainer
    from gsplat_tpu.viewer import TrainingViewer

    ds = make_synthetic_dataset(n_points=80, n_views=4, width=48, height=48)
    model = GaussianModel.create(ds.points, ds.colors, ds.scales, max_sh_degree=0)
    trainer = Trainer(model, ds, max_instances=4096)
    tv = TrainingViewer(
        trainer, width=64, height=64, max_instances=4096,
        max_steps=24, out_dir=str(tmp_path),
    )
    # Exercise handle() directly — the HTTP layer is a thin routing shim.
    code, ctype, body = tv.handle("/", {})
    assert code == 200 and b"gsplat_tpu viewer" in body
    code, _, body = tv.handle("/info", {})
    info = _json.loads(body)
    assert info["training"] is False and info["step"] == 0

    code, _, body = tv.handle("/train", {"cmd": "start"})
    assert _json.loads(body)["training"] is True
    deadline = _time.time() + 120
    while _time.time() < deadline:
        step = _json.loads(tv.handle("/info", {})[2])["step"]
        if step >= 24:
            break
        _time.sleep(0.5)
    assert step >= 24, f"training never reached max_steps (step={step})"
    # worker self-pauses at max_steps
    deadline = _time.time() + 10
    while _time.time() < deadline and _json.loads(tv.handle("/info", {})[2])["training"]:
        _time.sleep(0.2)
    assert _json.loads(tv.handle("/info", {})[2])["training"] is False

    code, ctype, jpeg = tv.handle(
        "/frame", {"ex": 4.0, "ey": 1.0, "ez": 0.0, "tx": 0.0, "ty": 0.0, "tz": 0.0}
    )
    assert code == 200 and jpeg[:2] == b"\xff\xd8"
    losses = _json.loads(tv.handle("/losses", {})[2])
    assert losses["steps"] and losses["curves"]["total"], losses
    assert len(losses["steps"]) == len(losses["curves"]["total"])
    frusta = _json.loads(tv.handle("/frustums", {})[2])
    assert len(frusta) == 4 and all(len(f["c2w"]) == 12 for f in frusta)
    code, ctype, thumb = tv.handle("/thumb", {"i": 1})
    assert thumb[:2] == b"\xff\xd8"
    params = tv.handle("/params", {})[2].decode()
    assert "position_lr_init" in params or "lr" in params
    saved = _json.loads(tv.handle("/save", {})[2])
    assert saved["step"] >= 24 and os.path.exists(saved["path"])
    tv.stop()


def test_native_io_kill_switch(monkeypatch):
    """GSPLAT_NATIVE_IO=0 must keep the .so out of the process entirely
    (available() False) so a suspect native build can be excluded."""
    from gsplat_tpu import native

    monkeypatch.setenv("GSPLAT_NATIVE_IO", "0")
    assert not native.available()
    assert native.build_error() is None or isinstance(native.build_error(), str)


def test_native_io_matches_python(tmp_path, rng):
    """The C++ IO runtime (gsplat_tpu/native): COLMAP parsers must equal the
    pure-Python parsers exactly; the threaded libjpeg/libpng + Lanczos-3
    decode must track PIL's LANCZOS closely; and load_colmap through the
    native path must produce the same dataset geometry."""
    from gsplat_tpu import native

    if os.environ.get("GSPLAT_NATIVE_IO", "1") == "0":
        pytest.skip("native IO disabled via GSPLAT_NATIVE_IO=0")
    assert native.available(), native.build_error()

    root = str(tmp_path / "scene")
    ds = make_synthetic_dataset(n_points=80, n_views=5, width=48, height=48)
    write_colmap_scene(root, ds)

    from gsplat_tpu.data import colmap as pyc

    sparse = os.path.join(root, "sparse", "0")
    cams_py = pyc.read_cameras_bin(os.path.join(sparse, "cameras.bin"))
    cams_c = native.read_cameras_bin(os.path.join(sparse, "cameras.bin"))
    assert cams_py.keys() == cams_c.keys()
    for k in cams_py:
        assert cams_py[k]["model"] == cams_c[k]["model"]
        assert cams_py[k]["width"] == cams_c[k]["width"]
        np.testing.assert_array_equal(cams_py[k]["params"], cams_c[k]["params"])

    ims_py = pyc.read_images_bin(os.path.join(sparse, "images.bin"))
    ims_c = native.read_images_bin(os.path.join(sparse, "images.bin"))
    assert ims_py.keys() == ims_c.keys()
    for k in ims_py:
        assert ims_py[k]["name"] == ims_c[k]["name"]
        assert ims_py[k]["camera_id"] == ims_c[k]["camera_id"]
        np.testing.assert_array_equal(ims_py[k]["qvec"], ims_c[k]["qvec"])
        np.testing.assert_array_equal(ims_py[k]["tvec"], ims_c[k]["tvec"])

    xyz_py, rgb_py = pyc.read_points3d_bin(os.path.join(sparse, "points3D.bin"))
    xyz_c, rgb_c = native.read_points3d_bin(os.path.join(sparse, "points3D.bin"))
    np.testing.assert_array_equal(xyz_py, xyz_c)
    np.testing.assert_array_equal(rgb_py, rgb_c)

    # Image decode + resize: PNG decode is lossless, so same-size must be
    # exact; resized must track PIL LANCZOS closely (different fixed-point).
    img_path = os.path.join(root, "images", ds.names[0])
    from PIL import Image

    with Image.open(img_path) as im:
        w0, h0 = im.size
        ref_same = np.asarray(im.convert("RGB"), np.float32) / 255.0
        ref_small = (
            np.asarray(im.convert("RGB").resize((32, 32), Image.LANCZOS), np.float32)
            / 255.0
        )
    got_same = native.decode_resize(img_path, w0, h0)
    np.testing.assert_array_equal(got_same, ref_same)
    got_small = native.decode_resize(img_path, 32, 32)
    assert np.abs(got_small - ref_small).mean() < 2e-3
    assert np.abs(got_small - ref_small).max() < 0.08

    # Batch path == single path, threaded.
    outs = native.decode_batch([img_path, img_path], [(32, 32), (w0, h0)], n_threads=2)
    np.testing.assert_array_equal(outs[0], got_small)
    np.testing.assert_array_equal(outs[1], got_same)

    # Whole-dataset equivalence through load_colmap.
    import gsplat_tpu.data.colmap as colmap_mod

    ds_native = colmap_mod.load_colmap(root, scale=1, holdout=0)
    os.environ["GSPLAT_NATIVE_IO"] = "0"
    try:
        ds_py = colmap_mod.load_colmap(root, scale=1, holdout=0)
    finally:
        os.environ.pop("GSPLAT_NATIVE_IO")
    assert ds_native.names == ds_py.names
    np.testing.assert_array_equal(ds_native.points, ds_py.points)
    for a, b in zip(ds_native.images, ds_py.images):
        assert np.abs(a - b).max() < 1e-6  # same size: lossless decode


def test_viewer_pick_and_export(tmp_path):
    """Depth-render orbit picking (reference handle_pick!) and PLY export
    through the viewer routes."""
    import json as _json

    from gsplat_tpu.data.colmap import make_synthetic_dataset
    from gsplat_tpu.models.gaussians import GaussianModel, import_ply
    from gsplat_tpu.viewer import Viewer

    ds = make_synthetic_dataset(n_points=60, n_views=3, width=48, height=48)
    model = GaussianModel.create(ds.points, ds.colors, ds.scales, max_sh_degree=0)
    v = Viewer(model, width=64, height=64, max_instances=4096, dataset=ds)
    v.out_dir = str(tmp_path)
    code, _, body = v.handle("/pick", {
        "ex": 5.0, "ey": 1.0, "ez": 0.0, "tx": 0.0, "ty": 0.0, "tz": 0.0,
        "px": 0.5, "py": 0.5,
    })
    pt = _json.loads(body)["point"]
    assert pt is not None and len(pt) == 3
    # The picked point must sit between the eye and the far side of the cloud.
    d = np.linalg.norm(np.array(pt) - np.array([5.0, 1.0, 0.0]))
    assert 0.5 < d < 20.0, (pt, d)

    code, _, body = v.handle("/export", {})
    path = _json.loads(body)["path"]
    assert os.path.exists(path)
    m = import_ply(path)
    assert int(m.n_alive) == 60


def test_benchmark_autosave_resume(colmap_scene, tmp_path, monkeypatch):
    """A crashed benchmark() run resumes from its latest autosave: the
    second invocation picks up the step counter, skips completed eval
    targets, and restores the SH ramp position (Trainer.from_checkpoint)."""
    from gsplat_tpu.api import benchmark

    root, _ = colmap_scene
    wd = str(tmp_path)
    r1 = benchmark(
        root, scale=1, strategies=("default",), n_steps=8, eval_steps=(8,),
        holdout=4, autosave_every=4, work_dir=wd,
    )
    saves = [f for f in os.listdir(wd) if f.startswith("bench_default-")]
    assert saves, os.listdir(wd)
    r2 = benchmark(
        root, scale=1, strategies=("default",), n_steps=12, eval_steps=(8, 12),
        holdout=4, autosave_every=4, work_dir=wd,
    )
    # Resumed run evaluates only the NEW target (8 was <= resume step).
    assert [r["step"] for r in r2] == [12]


def test_trainer_from_checkpoint_restores_sh_ramp(tmp_path):
    from gsplat_tpu.data.colmap import make_synthetic_dataset
    from gsplat_tpu.io.checkpoint import save_checkpoint
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.train.trainer import Trainer

    ds = make_synthetic_dataset(n_points=50, n_views=3, width=48, height=48)
    model = GaussianModel.create(ds.points, ds.colors, ds.scales, max_sh_degree=3)
    tr = Trainer(model, ds, max_instances=4096, sh_ramp_every=2)
    tr.train(5)
    assert tr.sh_degree == 2
    path = str(tmp_path / "ck.safetensors")
    save_checkpoint(path, tr.state)
    tr2 = Trainer.from_checkpoint(path, ds, max_instances=4096, sh_ramp_every=2)
    assert int(tr2.state.step) == 5
    assert tr2.sh_degree == 2, "SH ramp position must survive resume"


def test_camera_shift_rotate_mutators():
    """Functional shift/rotate (reference camera.jl:136-144): shifting moves
    along local axes; rotating pre-multiplies the orientation; w2c/c2w stay
    consistent inverses."""
    import numpy as np

    from gsplat_tpu.camera import Camera, look_at

    R, t = look_at(np.array([1.0, 2.0, 5.0]), np.zeros(3))
    cam = Camera.create(R=R, t=t, width=64, height=48,
                        focal=np.array([60.0, 60.0], np.float32))
    fwd = np.asarray(cam.c2w)[:3, 2]
    cam2 = cam.shifted(np.array([0.0, 0.0, 1.5], np.float32))
    np.testing.assert_allclose(
        np.asarray(cam2.camera_center),
        np.asarray(cam.camera_center) + 1.5 * fwd, atol=1e-5,
    )
    th = 0.3
    rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                    [-np.sin(th), 0, np.cos(th)]], np.float32)
    cam3 = cam.rotated(rot)
    np.testing.assert_allclose(
        np.asarray(cam3.c2w)[:3, :3], rot @ np.asarray(cam.c2w)[:3, :3], atol=1e-5
    )
    # position unchanged by a pure rotation
    np.testing.assert_allclose(
        np.asarray(cam3.camera_center), np.asarray(cam.camera_center), atol=1e-5
    )
    # w2c is still the inverse of c2w
    np.testing.assert_allclose(
        np.asarray(cam3.w2c) @ np.asarray(cam3.c2w), np.eye(4), atol=1e-5
    )


def test_dataset_thumbnail(colmap_scene):
    _, ds = colmap_scene
    th = ds.thumbnail(0, max_width=16)
    assert th.dtype == np.uint8 and th.shape[1] <= 16 and th.shape[2] == 3
    h, w = ds.images[0].shape[:2]
    assert abs(th.shape[0] / th.shape[1] - h / w) < 0.2
