"""micro16: where do the prologue's 7.6 ms of relayout copies go at 1M?

profile_quality_step attributed 7.6 ms/step to reshape/copy ops around the
fused projection+SH custom call at the quality operating point. The wide
(w=8) layout feeds the kernel attr.reshape(16*8, N/8) — a row-major
identity on paper, but XLA's tiled layouts make it a relayout copy; the
feature-major attr build (means.T/quats.T/scales.T concat) and the (N,3K)
SH transpose are narrow-transpose copies of their own.

Times project_and_sh_fused end-to-end at N=1M (w=8 vs w=1), then each
build stage in isolation, and dumps a profiler trace.

Usage: /opt/venv/bin/python benchmark/micro16.py [N]
"""
import os
import sys
import time
from pathlib import Path

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent.parent / ".jax_tpu_cache"),
)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 40


def fetch_time(f, *args, reps=REPS):
    out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    from gsplat_tpu.camera import Camera, look_at
    from gsplat_tpu.constants import RADIUS_CLIP
    from gsplat_tpu.ops.proj_fused import ATTR_ROWS, project_and_sh_fused

    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.uniform(-4, 4, (n, 3)).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    scales = jnp.asarray(np.full((n, 3), 0.01, np.float32))
    shs = jnp.asarray(rng.normal(size=(n, 16, 3)).astype(np.float32) * 0.1)
    R, t = look_at(np.array([9.0, 1.0, 9.0]), np.zeros(3))
    cam = Camera.create(R=R, t=t, width=1248, height=832,
                        focal=np.array([873.6, 873.6], np.float32))
    res = jnp.array([1248.0, 832.0], jnp.float32)

    def full(means, quats, scales, shs):
        return project_and_sh_fused(
            means, quats, scales, shs, cam.R, cam.t, cam.focal,
            cam.principal * res, res, 3,
            near_plane=0.2, far_plane=10_000.0, radius_clip=RADIUS_CLIP,
            with_normal=False,
        )["mean_2d"]

    for wide, gm in (("1", "1"), ("1", "0"), ("0", "0")):
        os.environ["GSPLAT_PROLOGUE_WIDE"] = wide
        os.environ["GSPLAT_PROLOGUE_GM"] = gm
        try:
            ms = fetch_time(jax.jit(full), means, quats, scales, shs)
            print(f"[micro16] N={n} wide={wide} gm={gm}: {ms:.2f} ms", flush=True)
        except Exception as e:
            print(f"[micro16] N={n} wide={wide} gm={gm}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    os.environ["GSPLAT_PROLOGUE_WIDE"] = "1"
    os.environ["GSPLAT_PROLOGUE_GM"] = "1"

    # fwd+bwd with the gm layout (the backward emits gm-layout grads).
    def full_grad(means, quats, scales, shs):
        def loss(m, q, s, sh):
            r = project_and_sh_fused(
                m, q, s, sh, cam.R, cam.t, cam.focal,
                cam.principal * res, res, 3,
                near_plane=0.2, far_plane=10_000.0, radius_clip=RADIUS_CLIP,
                with_normal=False,
            )
            return jnp.sum(r["mean_2d"]) + jnp.sum(r["rgb"])
        return jax.grad(loss, argnums=(0, 3))(means, quats, scales, shs)

    for gm in ("1", "0"):
        os.environ["GSPLAT_PROLOGUE_GM"] = gm
        try:
            ms = fetch_time(jax.jit(full_grad), means, quats, scales, shs)
            print(f"[micro16] fwd+bwd gm={gm}: {ms:.2f} ms", flush=True)
        except Exception as e:
            print(f"[micro16] fwd+bwd gm={gm}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    os.environ["GSPLAT_PROLOGUE_GM"] = "1"

    # Build stages in isolation (each fetch-terminated).
    def build_attr(means, quats, scales):
        return jnp.concatenate(
            [means.T, quats.T, scales.T,
             jnp.zeros((ATTR_ROWS - 10, n), jnp.float32)], axis=0)

    def attr_wide(means, quats, scales):
        return build_attr(means, quats, scales).reshape(ATTR_ROWS * 8, n // 8)

    def sh_t(shs):
        return shs.reshape(n, 48).T

    def sh_wide(shs):
        return shs.reshape(n, 48).T.reshape(48 * 8, n // 8)

    print(f"[micro16] attr build (16,N): {fetch_time(jax.jit(build_attr), means, quats, scales):.2f} ms", flush=True)
    print(f"[micro16] attr build+wide reshape: {fetch_time(jax.jit(attr_wide), means, quats, scales):.2f} ms", flush=True)
    print(f"[micro16] sh transpose (48,N): {fetch_time(jax.jit(sh_t), shs):.2f} ms", flush=True)
    print(f"[micro16] sh transpose+wide: {fetch_time(jax.jit(sh_wide), shs):.2f} ms", flush=True)

    # Candidate cheaper spellings for the wide layout.
    def attr_wide_direct(means, quats, scales):
        # Row 8i+r = feature i, gaussian block r: build each feature's
        # (8, N/8) split straight from the (N,) column.
        cols = [means[:, i] for i in range(3)] + \
               [quats[:, i] for i in range(4)] + \
               [scales[:, i] for i in range(3)]
        rows = [c.reshape(8, n // 8) for c in cols]
        rows += [jnp.zeros(((ATTR_ROWS - 10) * 8, n // 8), jnp.float32)]
        return jnp.concatenate(rows, axis=0)

    def sh_wide_direct(shs):
        flat = shs.reshape(n, 48)
        rows = [flat[:, i].reshape(8, n // 8) for i in range(48)]
        return jnp.concatenate(rows, axis=0)

    print(f"[micro16] attr wide DIRECT: {fetch_time(jax.jit(attr_wide_direct), means, quats, scales):.2f} ms", flush=True)
    print(f"[micro16] sh wide DIRECT: {fetch_time(jax.jit(sh_wide_direct), shs):.2f} ms", flush=True)

    parity = bool(jnp.all(attr_wide_direct(means, quats, scales)
                          == attr_wide(means, quats, scales)))
    parity_sh = bool(jnp.all(sh_wide_direct(shs) == sh_wide(shs)))
    print(f"[micro16] direct == reshape parity: attr={parity} sh={parity_sh}", flush=True)

    trace_dir = "/tmp/micro16_trace"
    f = jax.jit(full)
    with jax.profiler.trace(trace_dir):
        for _ in range(8):
            out = f(means, quats, scales, shs)
        _ = np.asarray(out.ravel()[0])
    print(f"[micro16] trace in {trace_dir}", flush=True)


if __name__ == "__main__":
    main()
