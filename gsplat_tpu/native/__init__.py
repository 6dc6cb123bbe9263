"""Native host-IO runtime: ctypes bindings for gsplat_io.cpp.

The TPU compute path is JAX/XLA/Pallas; this module is the C++ runtime
around it for host-side data loading — COLMAP binary parsing and a
threaded libjpeg/libpng decode + Lanczos-3 resize pipeline (the reference
delegates this layer to NerfUtils.jl/Images.jl, src/dataset.jl:7-219).

The library builds on first use with g++ (cached next to this file); when
the toolchain or codec headers are unavailable, `available()` returns
False and callers fall back to the pure-Python loaders, which remain the
semantic oracle (tests assert parser equality and image closeness).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "gsplat_io.cpp")
_LIB = os.path.join(_DIR, "libgsplat_io.so")
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", _LIB, "-ljpeg", "-lpng", "-lpthread",
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    except (OSError, subprocess.TimeoutExpired) as e:
        return str(e)
    return None if r.returncode == 0 else r.stderr[-2000:]


def _load():
    global _lib, _build_error
    if os.environ.get("GSPLAT_NATIVE_IO", "1") == "0":
        return None  # global kill-switch: never load the .so
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            err = _build()
            if err is not None:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            _build_error = str(e)
            return None
        c = ctypes.c_char_p
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        i64 = ctypes.POINTER(ctypes.c_int64)
        lib.colmap_read_cameras.argtypes = [c, i64, ctypes.c_void_p, ctypes.c_void_p,
                                            ctypes.c_void_p, ctypes.c_void_p]
        lib.colmap_read_images.argtypes = [c, i64, ctypes.c_void_p, ctypes.c_void_p,
                                           ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.colmap_read_points.argtypes = [c, i64, ctypes.c_void_p, ctypes.c_void_p]
        lib.image_probe.argtypes = [c, ctypes.POINTER(ctypes.c_int32),
                                    ctypes.POINTER(ctypes.c_int32)]
        lib.image_decode_resize.argtypes = [c, ctypes.c_int, ctypes.c_int, f32p]
        lib.image_decode_batch.argtypes = [ctypes.c_char_p, i64p, i32p, i64p,
                                           f32p, ctypes.c_int, ctypes.c_int, i32p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


# ---------------------------------------------------------------- parsers

_MODEL_NAMES = {
    0: "SIMPLE_PINHOLE", 1: "PINHOLE", 2: "SIMPLE_RADIAL", 3: "RADIAL",
    4: "OPENCV", 5: "OPENCV_FISHEYE", 6: "FULL_OPENCV", 7: "FOV",
    8: "SIMPLE_RADIAL_FISHEYE", 9: "RADIAL_FISHEYE", 10: "THIN_PRISM_FISHEYE",
}
_MODEL_NPARAMS = {0: 3, 1: 4, 2: 4, 3: 5, 4: 8, 5: 8, 6: 12, 7: 5, 8: 4, 9: 5, 10: 12}


def read_cameras_bin(path: str) -> dict:
    """Same contract as data.colmap.read_cameras_bin, parsed natively."""
    lib = _load()
    n = ctypes.c_int64(0)
    rc = lib.colmap_read_cameras(path.encode(), ctypes.byref(n), None, None, None, None)
    if rc != 0:
        raise IOError(f"colmap_read_cameras({path}) failed: {rc}")
    k = n.value
    ids = np.zeros(k, np.int32)
    models = np.zeros(k, np.int32)
    wh = np.zeros(2 * k, np.int64)
    params = np.zeros((k, 12), np.float64)
    rc = lib.colmap_read_cameras(
        path.encode(), ctypes.byref(n), ids.ctypes.data, models.ctypes.data,
        wh.ctypes.data, params.ctypes.data,
    )
    if rc != 0:
        raise IOError(f"colmap_read_cameras({path}) failed: {rc}")
    out = {}
    for i in range(k):
        m = int(models[i])
        out[int(ids[i])] = dict(
            model=_MODEL_NAMES[m], width=int(wh[2 * i]), height=int(wh[2 * i + 1]),
            params=params[i, : _MODEL_NPARAMS[m]].copy(),
        )
    return out


def read_images_bin(path: str) -> dict:
    lib = _load()
    n = ctypes.c_int64(0)
    rc = lib.colmap_read_images(path.encode(), ctypes.byref(n),
                                None, None, None, None, None)
    if rc != 0:
        raise IOError(f"colmap_read_images({path}) failed: {rc}")
    k = n.value
    ids = np.zeros(k, np.int32)
    qvecs = np.zeros((k, 4), np.float64)
    tvecs = np.zeros((k, 3), np.float64)
    cam_ids = np.zeros(k, np.int32)
    names = np.zeros((k, 256), np.uint8)
    rc = lib.colmap_read_images(
        path.encode(), ctypes.byref(n), ids.ctypes.data, qvecs.ctypes.data,
        tvecs.ctypes.data, cam_ids.ctypes.data, names.ctypes.data,
    )
    if rc != 0:
        raise IOError(f"colmap_read_images({path}) failed: {rc}")
    out = {}
    for i in range(k):
        raw = bytes(names[i])
        out[int(ids[i])] = dict(
            qvec=qvecs[i].copy(), tvec=tvecs[i].copy(), camera_id=int(cam_ids[i]),
            name=raw[: raw.index(b"\x00")].decode("utf-8"),
        )
    return out


def read_points3d_bin(path: str):
    lib = _load()
    n = ctypes.c_int64(0)
    rc = lib.colmap_read_points(path.encode(), ctypes.byref(n), None, None)
    if rc != 0:
        raise IOError(f"colmap_read_points({path}) failed: {rc}")
    k = n.value
    xyz = np.zeros((k, 3), np.float64)
    rgb = np.zeros((k, 3), np.uint8)
    rc = lib.colmap_read_points(path.encode(), ctypes.byref(n),
                                xyz.ctypes.data, rgb.ctypes.data)
    if rc != 0:
        raise IOError(f"colmap_read_points({path}) failed: {rc}")
    return xyz, rgb


# ---------------------------------------------------------------- images

def probe_image(path: str) -> tuple[int, int]:
    """(width, height) of an image file."""
    lib = _load()
    w = ctypes.c_int32(0)
    h = ctypes.c_int32(0)
    if lib.image_probe(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise IOError(f"image_probe({path}) failed")
    return w.value, h.value


def decode_resize(path: str, out_w: int, out_h: int) -> np.ndarray:
    """f32 RGB (out_h, out_w, 3) in [0,1]; Lanczos-3 resize."""
    lib = _load()
    out = np.zeros((out_h, out_w, 3), np.float32)
    if lib.image_decode_resize(path.encode(), out_w, out_h, out) != 0:
        raise IOError(f"image_decode_resize({path}) failed")
    return out


def decode_batch(paths: list, sizes: list, n_threads: int = 0) -> list:
    """Threaded decode+resize: paths[i] -> f32 (sizes[i][1], sizes[i][0], 3).

    The prefetch pipeline of the native loader: all images of a dataset
    decode in parallel on host cores while JAX compiles."""
    lib = _load()
    n = len(paths)
    enc = [p.encode() + b"\x00" for p in paths]
    blob = b"".join(enc)
    path_off = np.zeros(n, np.int64)
    pos = 0
    for i, e in enumerate(enc):
        path_off[i] = pos
        pos += len(e)
    wh = np.zeros(2 * n, np.int32)
    out_off = np.zeros(n, np.int64)
    total = 0
    for i, (w, h) in enumerate(sizes):
        wh[2 * i] = w
        wh[2 * i + 1] = h
        out_off[i] = total
        total += w * h * 3
    out = np.zeros(total, np.float32)
    status = np.zeros(n, np.int32)
    rc = lib.image_decode_batch(blob, path_off, wh, out_off, out, n, n_threads, status)
    if rc != 0:
        bad = [paths[i] for i in range(n) if status[i] != 0]
        raise IOError(f"image_decode_batch failed for: {bad[:5]}")
    return [
        out[out_off[i] : out_off[i] + sizes[i][0] * sizes[i][1] * 3]
        .reshape(sizes[i][1], sizes[i][0], 3)
        .copy()
        for i in range(n)
    ]
