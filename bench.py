"""Benchmark: full differentiable render step (forward + backward) throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference records ~150 train-steps/s (6.7 ms/step, blocking
sync) on its author's AMD GPU for MipNeRF-360 bicycle @ scale 4
(/root/reference/src/GaussianSplatting.jl:96-99). A 3DGS train step is
dominated by the differentiable rasterize fwd+bwd, which is what this
harness times on a synthetic scene of comparable size.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

N_GAUSSIANS = int(os.environ.get("BENCH_N", 100_000))
WIDTH = int(os.environ.get("BENCH_W", 976))
HEIGHT = int(os.environ.get("BENCH_H", 544))
STEPS = int(os.environ.get("BENCH_STEPS", 30))
BASELINE_STEPS_PER_S = 150.0


def main():
    from gsplat_tpu import Camera, RasterizerConfig
    from gsplat_tpu.ops.rasterize import render

    rng = np.random.default_rng(0)
    n = N_GAUSSIANS
    means = np.stack(
        [rng.uniform(-4.0, 4.0, n), rng.uniform(-4.0, 4.0, n), rng.uniform(1.0, 20.0, n)],
        axis=1,
    ).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales_raw = rng.uniform(-5.5, -3.5, size=(n, 3)).astype(np.float32)
    opac_raw = rng.normal(size=(n,)).astype(np.float32)
    sh_dc = (rng.normal(size=(n, 1, 3)) * 0.3).astype(np.float32)
    sh_rest = np.zeros((n, 15, 3), np.float32)
    params = tuple(
        jnp.asarray(a) for a in (means, opac_raw, scales_raw, quats, sh_dc, sh_rest)
    )

    cam = Camera.create(
        width=WIDTH, height=HEIGHT, focal=np.array([0.7 * WIDTH, 0.7 * WIDTH], np.float32)
    )
    impl = os.environ.get("BENCH_IMPL", "pallas" if jax.default_backend() == "tpu" else "scan")
    max_instances = int(os.environ.get("BENCH_MAX_INSTANCES", max(8 * n, 1 << 16)))
    cfg = RasterizerConfig(
        width=WIDTH, height=HEIGHT, mode="rgb", max_instances=max_instances, impl=impl
    )
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32)

    def loss_fn(params):
        img, _ = render(*params, camera=cam, config=cfg, sh_degree=3)
        return jnp.mean(jnp.abs(img - target))

    @jax.jit
    def train_step(params):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, jax.tree_util.tree_map(lambda p, g: p - 1e-4 * g, params, grads)

    # Warmup / compile.
    loss, params = train_step(params)
    loss.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(STEPS):
        loss, params = train_step(params)
    loss.block_until_ready()
    dt = time.perf_counter() - t0
    steps_per_s = STEPS / dt

    print(
        json.dumps(
            {
                "metric": "render_train_steps_per_s",
                "value": round(steps_per_s, 3),
                "unit": f"steps/s ({N_GAUSSIANS}g {WIDTH}x{HEIGHT} {impl} fwd+bwd)",
                "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
