"""Profile the bench-scale fwd+bwd grad closure and attribute the gap.

PERFORMANCE.md next-target #1: fwd+bwd 21.6 ms - fwd 9.6 ms = 12.0 ms of
backward, but the individually-timed parts (blend bwd ~5.5, gather
transpose ~1.5, prologue bwd ~1.3) only sum to ~8.3 ms. This traces the
actual grad closure so the missing ~4 ms gets an op-level owner.

Usage: /opt/venv/bin/python benchmark/trace_bwd.py [n] [w] [h]
then:  /opt/venv/bin/python benchmark/trace_top_ops.py /tmp/trace_bwd 40
"""
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
W = int(sys.argv[2]) if len(sys.argv) > 2 else 976
H = int(sys.argv[3]) if len(sys.argv) > 3 else 544
OUT = os.environ.get("TRACE_DIR", "/tmp/trace_bwd")


def main():
    from gsplat_tpu.camera import Camera, look_at
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.ops.rasterize import RasterizerConfig, render

    rng = np.random.default_rng(0)
    pts = np.stack(
        [rng.uniform(-4, 4, N), rng.uniform(-4, 4, N), rng.uniform(-4, 4, N)], 1
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    model = GaussianModel.create(pts, cols, np.full(N, 0.01, np.float32),
                                 max_sh_degree=3)
    R, t = look_at(np.array([9.0, 1.0, 0.0]), np.zeros(3))
    cam = Camera.create(R=R, t=t, width=W, height=H,
                        focal=np.array([0.7 * W, 0.7 * W], np.float32))
    budget = int(os.environ.get("BENCH_MAX_INSTANCES", max(4 * N, 1 << 16)))
    cfg = RasterizerConfig(width=W, height=H, mode="rgb",
                           max_instances=budget, impl="pallas")
    margs = model.render_args()

    full = jax.jit(lambda a: render(*a, camera=cam, config=cfg, sh_degree=3)[0])
    tgt = jnp.asarray(np.asarray(full(margs)))

    from gsplat_tpu.train.losses import photometric_loss

    lossf = jax.jit(jax.value_and_grad(lambda a: photometric_loss(
        render(*a, camera=cam, config=cfg, sh_degree=3)[0][..., :3],
        tgt[..., :3], 0.2)[0]))

    out = lossf(margs)  # compile + warm
    _ = np.asarray(out[0])
    with jax.profiler.trace(OUT):
        for _i in range(20):
            out = lossf(margs)
        _ = np.asarray(out[0])
    print(f"trace written to {OUT}")


if __name__ == "__main__":
    main()
