"""Generate a photo-textured multi-view COLMAP scene for quality benchmarks.

The environment has no network egress and no real capture hardware, so a
true MipNeRF-360 scene is unobtainable; this is the closest obtainable
stand-in: a ray-traced 360-degree orbit around a cluster of textured
objects on a textured ground plane, with

  - real-photograph texture content (matplotlib's bundled grace_hopper.jpg)
    plus procedural textures with natural-image 1/f statistics (fBm value
    noise, wood rings, marble, bricks),
  - hard shadows + lambertian/Blinn-Phong shading (view-dependent
    highlights exercise the SH color model beyond degree 0),
  - 2x supersampling,
  - a COLMAP-style sparse cloud built from *actual ray hits* of the train
    views (subsampled, with measurement noise) — matching how SfM seeds
    real scenes,

written as a standard COLMAP binary scene (sparse/0/{cameras,images,
points3D}.bin + images/) consumable by `gsplat_tpu.api.benchmark()`
(reference protocol: /root/reference/src/GaussianSplatting.jl:260-359).

Usage: python benchmark/make_scene.py OUT_DIR [--width 640] [--height 416]
                                              [--views 40] [--points 30000]
"""
from __future__ import annotations

import argparse
import os
import struct
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BIG = 1e9


# ---------------------------------------------------------------- textures
def _fbm(h, w, octaves=None, seed=0, persistence=0.55):
    """Fractal value noise: 1/f spectrum like natural images.

    `octaves` defaults to enough levels that the finest grid reaches the
    pixel scale of the texture — a fixed octave count leaves a high-res
    texture band-limited (the round-2 atrium_hd scene rendered 1248x832
    views from 512px textures with detail stopping at octave 6, so GT was
    locally smooth, the converged model legitimately used BIG splats —
    median 39 px screen radius — and the reference-faithful >=20px prune,
    densification.jl:19-24, demolished 85% of a healthy model per pass)."""
    rng = np.random.default_rng(seed)
    if octaves is None:
        octaves = max(6, int(np.log2(max(h, w))) - 1)
    out = np.zeros((h, w), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        gh, gw = 2 ** (o + 2), 2 ** (o + 2)
        g = rng.standard_normal((gh, gw)).astype(np.float32)
        ys = np.linspace(0, gh - 1, h, dtype=np.float32)
        xs = np.linspace(0, gw - 1, w, dtype=np.float32)
        y0 = np.floor(ys).astype(int) % gh
        x0 = np.floor(xs).astype(int) % gw
        fy = (ys - np.floor(ys))[:, None]
        fx = (xs - np.floor(xs))[None, :]
        y1, x1 = (y0 + 1) % gh, (x0 + 1) % gw
        a = g[np.ix_(y0, x0)] * (1 - fy) * (1 - fx) + g[np.ix_(y0, x1)] * (1 - fy) * fx
        b = g[np.ix_(y1, x0)] * fy * (1 - fx) + g[np.ix_(y1, x1)] * fy * fx
        out += amp * (a + b)
        total += amp
        amp *= persistence
    out /= total
    return (out - out.min()) / (np.ptp(out) + 1e-9)


def make_textures(res=512):
    tex = {}
    try:
        from PIL import Image
        import matplotlib

        p = os.path.join(
            os.path.dirname(matplotlib.__file__), "mpl-data", "sample_data",
            "grace_hopper.jpg",
        )
        img = np.asarray(Image.open(p).resize((res, res))).astype(np.float32) / 255.0
        # Upscaling adds no detail: modulate with pixel-scale fBm so the
        # photo surface has texture at the texture's own resolution.
        detail = (_fbm(res, res, seed=11) - 0.5)[..., None]
        tex["photo"] = np.clip(img * (1.0 + 0.35 * detail), 0, 1)
    except Exception:
        tex["photo"] = np.stack([_fbm(res, res, seed=s) for s in (7, 8, 9)], -1)

    n = _fbm(res, res, seed=1)
    nf = _fbm(res, res, seed=12, persistence=0.8)  # blade-scale grain
    g = 0.6 * n + 0.4 * nf
    grass = np.stack([0.18 + 0.28 * g, 0.28 + 0.40 * g, 0.10 + 0.17 * g], -1)
    tex["ground"] = grass

    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / res
    rings = 0.5 + 0.5 * np.sin(40 * (xx + 0.3 * _fbm(res, res, seed=2)))
    tex["wood"] = np.stack(
        [0.45 + 0.25 * rings, 0.28 + 0.16 * rings, 0.12 + 0.08 * rings], -1)

    m = _fbm(res, res, seed=3)
    veins = 0.5 + 0.5 * np.sin(14 * (yy + 1.6 * m))
    tex["marble"] = np.stack(
        [0.55 + 0.4 * veins, 0.55 + 0.38 * veins, 0.58 + 0.38 * veins], -1)

    bx = ((xx * 8 + (np.floor(yy * 16) % 2) * 0.5) % 1.0 > 0.08).astype(np.float32)
    by = ((yy * 16) % 1.0 > 0.12).astype(np.float32)
    brick = bx * by
    bn = _fbm(res, res, seed=4)
    tex["brick"] = np.stack(
        [0.55 * brick + 0.25 + 0.1 * bn,
         0.20 * brick + 0.16 + 0.08 * bn,
         0.12 * brick + 0.13 + 0.06 * bn], -1)

    c = _fbm(res, res, seed=5)
    tex["rust"] = np.stack([0.45 + 0.4 * c, 0.30 + 0.25 * c, 0.15 + 0.1 * c], -1)
    # Multiplicative luminance grain at texel scale on every surface:
    # natural captures carry pixel-level texture everywhere, and without it
    # the optimizer (correctly) covers surfaces with big splats whose >=20px
    # screen radii the reference prune then mass-kills (see _fbm docstring).
    for i, k in enumerate(tex):
        grain = _fbm(res, res, seed=20 + i, persistence=0.8)[..., None]
        tex[k] = tex[k] * (0.78 + 0.44 * grain)
    for k in tex:
        tex[k] = np.clip(tex[k], 0, 1).astype(np.float32)
    return tex


def tex_lookup(tex, uv):
    """uv (..., 2) in [0,1] -> (..., 3), bilinear, wrap."""
    h, w, _ = tex.shape
    u = (uv[..., 0] % 1.0) * (w - 1)
    v = (uv[..., 1] % 1.0) * (h - 1)
    x0, y0 = np.floor(u).astype(int), np.floor(v).astype(int)
    x1, y1 = np.minimum(x0 + 1, w - 1), np.minimum(y0 + 1, h - 1)
    fu, fv = (u - x0)[..., None], (v - y0)[..., None]
    return (tex[y0, x0] * (1 - fu) * (1 - fv) + tex[y0, x1] * fu * (1 - fv)
            + tex[y1, x0] * (1 - fu) * fv + tex[y1, x1] * fu * fv)


# ---------------------------------------------------------------- geometry
# Primitives: dicts with intersect(ro, rd) -> (t, normal, uv, texname, spec)
def sphere(center, radius, texname, spec=0.0, uvscale=1.0):
    c = np.asarray(center, np.float32)

    def hit(ro, rd):
        oc = ro - c
        b = np.einsum("ij,ij->i", oc, rd)
        cc = np.einsum("ij,ij->i", oc, oc) - radius * radius
        disc = b * b - cc
        ok = disc > 0
        sq = np.sqrt(np.maximum(disc, 0))
        t = np.where(ok, -b - sq, BIG)
        t = np.where(t > 1e-3, t, np.where(ok & (-b + sq > 1e-3), -b + sq, BIG))
        p = ro + rd * t[:, None]
        n = (p - c) / radius
        u = (np.arctan2(n[:, 2], n[:, 0]) / (2 * np.pi) + 0.5) * uvscale
        v = (np.arccos(np.clip(n[:, 1], -1, 1)) / np.pi) * uvscale
        return t, n, np.stack([u, v], -1), texname, spec

    return hit


def box(lo, hi, texname, spec=0.0, uvscale=1.0):
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)

    def hit(ro, rd):
        inv = 1.0 / np.where(np.abs(rd) < 1e-9, 1e-9, rd)
        t0 = (lo[None] - ro) * inv
        t1 = (hi[None] - ro) * inv
        tmin = np.minimum(t0, t1).max(1)
        tmax = np.maximum(t0, t1).min(1)
        ok = (tmax > np.maximum(tmin, 1e-3))
        t = np.where(ok, np.where(tmin > 1e-3, tmin, tmax), BIG)
        p = ro + rd * t[:, None]
        # face normal: the axis where p is at a bound
        eps = 1e-3
        n = np.zeros_like(p)
        for ax in range(3):
            n[:, ax] = np.where(np.abs(p[:, ax] - lo[ax]) < eps, -1.0,
                                np.where(np.abs(p[:, ax] - hi[ax]) < eps, 1.0, 0.0))
        nn = np.linalg.norm(n, axis=1, keepdims=True)
        n = n / np.where(nn == 0, 1, nn)
        ext = hi - lo
        u = np.where(np.abs(n[:, 0]) > 0.5, (p[:, 2] - lo[2]) / ext[2],
                     (p[:, 0] - lo[0]) / ext[0]) * uvscale
        v = np.where(np.abs(n[:, 1]) > 0.5, (p[:, 2] - lo[2]) / ext[2],
                     (p[:, 1] - lo[1]) / ext[1]) * uvscale
        return t, n, np.stack([u, v], -1), texname, spec

    return hit


def ground(y, half, texname, uvscale=0.12):
    def hit(ro, rd):
        t = np.where(np.abs(rd[:, 1]) > 1e-7, (y - ro[:, 1]) / rd[:, 1], BIG)
        p = ro + rd * t[:, None]
        ok = (t > 1e-3) & (np.abs(p[:, 0]) < half) & (np.abs(p[:, 2]) < half)
        t = np.where(ok, t, BIG)
        n = np.zeros_like(p)
        n[:, 1] = 1.0
        uv = np.stack([p[:, 0] * uvscale, p[:, 2] * uvscale], -1)
        return t, n, uv, texname, 0.0

    return hit


def build_scene():
    prims = [
        # Finer ground texel density (uvscale 0.12 -> 0.3): at the orbit's
        # viewing distances this puts ~1-2.5 texels under each render pixel,
        # i.e. pixel-scale view-CONSISTENT detail (2x supersampling keeps it
        # alias-free) — a real capture's grass, not a smooth green wash.
        ground(0.0, 14.0, "ground", uvscale=0.3),
        box([-1.3, 0.0, -1.1], [1.3, 1.1, 1.1], "wood", spec=0.15, uvscale=1.0),
        sphere([0.0, 1.65, 0.0], 0.62, "marble", spec=0.5),
        sphere([-1.9, 0.55, 1.3], 0.55, "photo", spec=0.2),
        box([1.4, 0.0, -2.2], [2.5, 1.9, -1.1], "brick", spec=0.0, uvscale=2.0),
        sphere([1.9, 0.42, 1.6], 0.42, "rust", spec=0.6),
        box([-2.9, 0.0, -2.0], [-1.9, 0.75, -1.0], "photo", spec=0.1),
        sphere([-0.4, 0.35, 2.3], 0.35, "wood", spec=0.3, uvscale=2.0),
        # Mid-field clutter: more textured surface, less bare ground.
        sphere([0.9, 0.28, -3.1], 0.28, "marble", spec=0.3, uvscale=2.0),
        box([-3.3, 0.0, 1.2], [-2.5, 0.5, 2.0], "brick", spec=0.0, uvscale=3.0),
        sphere([3.1, 0.5, 0.2], 0.5, "photo", spec=0.15),
        box([2.6, 0.0, 2.6], [3.4, 0.9, 3.4], "wood", spec=0.1, uvscale=2.0),
        sphere([-1.1, 0.22, -2.6], 0.22, "rust", spec=0.4, uvscale=3.0),
    ]
    # Horizon ring: distant textured "buildings" fill the band between
    # ground and sky that the orbit's outward-facing rays otherwise leave
    # empty — real 360-degree captures have background structure there,
    # and without it the optimizer covers the horizon with enormous splats.
    rngb = np.random.default_rng(42)
    names = ["brick", "photo", "wood", "marble", "rust"]
    for k in range(10):
        a = 2 * np.pi * (k + 0.5) / 10
        r = 11.0 + 1.5 * float(rngb.uniform())
        cx, cz = r * np.cos(a), r * np.sin(a)
        w = 1.6 + 1.4 * float(rngb.uniform())
        h = 2.0 + 2.5 * float(rngb.uniform())
        prims.append(box(
            [cx - w, 0.0, cz - w], [cx + w, h, cz + w],
            names[k % len(names)], spec=0.05, uvscale=2.0 + k % 3,
        ))
    return prims


SUN = np.array([0.45, 0.75, 0.3], np.float32)
SUN /= np.linalg.norm(SUN)


def sky(rd):
    tt = np.clip(rd[:, 1] * 0.5 + 0.5, 0, 1)[:, None]
    base = (1 - tt) * np.array([[0.85, 0.8, 0.7]]) + tt * np.array([[0.35, 0.55, 0.9]])
    sun = np.maximum(rd @ SUN, 0) ** 64
    return np.clip(base + sun[:, None] * np.array([[1.0, 0.9, 0.7]]), 0, 1)


def trace(scene, tex, ro, rd):
    """Returns (color (R,3), hit_t (R,), hit_mask)."""
    best_t = np.full(ro.shape[0], BIG, np.float32)
    best = None
    for prim in scene:
        t, n, uv, name, spec = prim(ro, rd)
        closer = t < best_t
        if best is None:
            best = [n.copy(), uv.copy(), np.full(len(t), -1, np.int8), np.zeros(len(t), np.float32)]
            names = []
        if name not in names:
            names.append(name)
        idx = names.index(name)
        best_t = np.where(closer, t, best_t)
        best[0] = np.where(closer[:, None], n, best[0])
        best[1] = np.where(closer[:, None], uv, best[1])
        best[2] = np.where(closer, idx, best[2])
        best[3] = np.where(closer, spec, best[3])
    hit = best_t < BIG * 0.5
    p = ro + rd * np.minimum(best_t, 1e4)[:, None]

    albedo = np.zeros((ro.shape[0], 3), np.float32)
    for i, name in enumerate(names):
        m = best[2] == i
        if m.any():
            albedo[m] = tex_lookup(tex[name], best[1][m])

    # shadow ray
    sp = p + best[0] * 1e-2
    shadow_t = np.full(ro.shape[0], BIG, np.float32)
    sd = np.broadcast_to(SUN[None], sp.shape)
    for prim in scene:
        t, *_ = prim(sp, np.ascontiguousarray(sd))
        shadow_t = np.minimum(shadow_t, t)
    lit = (shadow_t > 100.0).astype(np.float32)

    ndl = np.maximum(best[0] @ SUN, 0)
    half = SUN[None] - rd
    half = half / (np.linalg.norm(half, axis=1, keepdims=True) + 1e-9)
    spec_i = np.maximum(np.einsum("ij,ij->i", best[0], half), 0) ** 32
    ambient = 0.35 + 0.1 * np.clip(best[0][:, 1], 0, 1)
    col = albedo * (ambient + 0.85 * ndl * lit)[:, None] + (
        0.6 * best[3] * spec_i * lit)[:, None]
    col = np.where(hit[:, None], col, sky(rd))
    return np.clip(col, 0, 1).astype(np.float32), best_t, hit


# ---------------------------------------------------------------- cameras
def look_at_rt(eye, target, up=(0, 1, 0)):
    """World-to-camera R,t; camera convention: x right, y down, z forward
    (COLMAP). Matches gsplat_tpu.camera.look_at semantics."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], 0)
    t = -R @ eye
    return R.astype(np.float32), t.astype(np.float32)


def render_view(scene, tex, R, t, W, H, focal, ss=2):
    """Ray trace one view at ss x supersampling; returns (H, W, 3) f32 and
    the full-res primary hit buffer (p, hit) for sparse-cloud sampling."""
    Ws, Hs = W * ss, H * ss
    fx, fy = focal * ss, focal * ss
    cx, cy = Ws / 2, Hs / 2
    ys, xs = np.mgrid[0:Hs, 0:Ws].astype(np.float32)
    dirs_cam = np.stack(
        [(xs + 0.5 - cx) / fx, (ys + 0.5 - cy) / fy, np.ones_like(xs)], -1
    ).reshape(-1, 3)
    dirs = dirs_cam @ R  # camera-to-world rotate (R is w2c; rows are axes)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    eye = (-R.T @ t).astype(np.float32)
    ro = np.broadcast_to(eye[None], dirs.shape)
    col, bt, hit = trace(scene, tex, np.ascontiguousarray(ro),
                         np.ascontiguousarray(dirs.astype(np.float32)))
    img = col.reshape(Hs, Ws, 3).reshape(H, ss, W, ss, 3).mean((1, 3))
    # hit buffer at full-res centers (stride ss)
    pts = (ro + dirs * bt[:, None]).reshape(Hs, Ws, 3)[::ss, ::ss]
    hitm = hit.reshape(Hs, Ws)[::ss, ::ss]
    return img.astype(np.float32), pts.reshape(-1, 3), hitm.reshape(-1), col.reshape(Hs, Ws, 3)[::ss, ::ss].reshape(-1, 3)


# ---------------------------------------------------------------- writer
def rot_to_qvec(R):
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


def write_scene(root, W, H, focal, views, images, pts, cols):
    from PIL import Image

    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir, exist_ok=True)
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, W, H))  # PINHOLE
        f.write(struct.pack("<4d", focal, focal, W / 2, H / 2))
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(views)))
        for i, (R, t) in enumerate(views):
            q = rot_to_qvec(np.asarray(R, np.float64))
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *np.asarray(t, np.float64)))
            f.write(struct.pack("<i", 1))
            name = f"view_{i:03d}.png"
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
            Image.fromarray((images[i] * 255 + 0.5).astype(np.uint8)).save(
                os.path.join(imgdir, name))
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for i, (p, c) in enumerate(zip(pts, cols)):
            f.write(struct.pack("<Q", i + 1))
            f.write(struct.pack("<3d", *p.astype(np.float64)))
            f.write(struct.pack("<3B", *(np.clip(c, 0, 1) * 255).astype(np.uint8)))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))  # empty track


_WORK = None


def _work_entry(i):
    return _WORK(i)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=416)
    ap.add_argument("--views", type=int, default=40)
    ap.add_argument("--points", type=int, default=30_000)
    ap.add_argument("--texres", type=int, default=0,
                    help="texture resolution (default: 2x image width, "
                    "pow2-rounded — detail down to the render pixel scale)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--jobs", type=int, default=1,
                    help="render views in parallel worker processes")
    args = ap.parse_args()
    assert args.width % 16 == 0 and args.height % 16 == 0

    rng = np.random.default_rng(args.seed)
    texres = args.texres or 1 << int(np.ceil(np.log2(2 * args.width)))
    tex = make_textures(res=texres)
    scene = build_scene()
    focal = 0.78 * args.width

    def view_pose(i):
        ang = 2 * np.pi * i / args.views
        radius = 6.0 + 1.0 * np.sin(3 * ang)
        height = 1.6 + 1.2 * (0.5 + 0.5 * np.sin(2 * ang + 1.0))
        eye = np.array([radius * np.cos(ang), height, radius * np.sin(ang)])
        return look_at_rt(eye, np.array([0.0, 0.7, 0.0]))

    def render_one(i):
        R, t = view_pose(i)
        img, hit_p, hit_m, hit_c = render_view(
            scene, tex, R, t, args.width, args.height, focal)
        print(f"view {i + 1}/{args.views}", flush=True)
        return img, hit_p, hit_m, hit_c

    if args.jobs > 1:
        # fork start method: workers inherit scene/tex/args via globals
        # (a closure doesn't pickle through Pool.map).
        import multiprocessing as mp

        global _WORK
        _WORK = render_one
        with mp.get_context("fork").Pool(args.jobs) as pool:
            rendered = pool.map(_work_entry, range(args.views))
    else:
        rendered = [render_one(i) for i in range(args.views)]

    views, images = [], []
    cloud_p, cloud_c = [], []
    for i, (img, hit_p, hit_m, hit_c) in enumerate(rendered):
        views.append(view_pose(i))
        images.append(img)
        # COLMAP-like sparse samples from real hits (train views only;
        # llffhold=8 -> every 8th view is test)
        if i % 8 != 0:
            idx = np.flatnonzero(hit_m)
            take = rng.choice(idx, size=min(2000, len(idx)), replace=False)
            cloud_p.append(hit_p[take] + rng.normal(0, 0.01, (len(take), 3)))
            cloud_c.append(hit_c[take])

    pts = np.concatenate(cloud_p, 0)
    cols = np.concatenate(cloud_c, 0)
    if len(pts) > args.points:
        sel = rng.choice(len(pts), args.points, replace=False)
        pts, cols = pts[sel], cols[sel]
    write_scene(args.out, args.width, args.height, focal, views, images,
                pts.astype(np.float32), cols.astype(np.float32))
    print(f"wrote {args.out}: {len(views)} views {args.width}x{args.height}, "
          f"{len(pts)} points")


if __name__ == "__main__":
    main()
