"""Multi-chip training + fully-sharded rendering, end to end.

Runs identically on real TPU chips and on a virtual CPU mesh — the scaling
layer is jax.sharding over a Mesh (SURVEY.md §2.8), not backend calls. Try:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    /opt/venv/bin/python examples/multichip.py

What it shows:
1. Data-parallel training: one step consumes a BATCH of views, vmapped
   inside the same `_step_core` the sequential Trainer jits (full 8-term
   loss), with the view axis sharded over the mesh's `data` axis; XLA
   inserts one psum of the per-Gaussian gradients over ICI.
2. Fully-sharded rendering (SURVEY §2.8 layout 2): Gaussians row-sharded
   (projection/SH local), emitted instances exchanged with ONE all-to-all
   to range-partitioned tile owners, local chunk-aligned tables, Pallas
   blend per shard — no replicated instance table anywhere.

For multi-HOST meshes see gsplat_tpu.parallel.mesh.init_distributed
(jax.distributed wiring + per-host view loading; tests/test_multihost.py).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gsplat_tpu.data import make_synthetic_dataset
from gsplat_tpu.models.gaussians import GaussianModel
from gsplat_tpu.ops.rasterize import RasterizerConfig, rasterize
from gsplat_tpu.parallel.data_parallel import batch_cameras, data_parallel_train_step
from gsplat_tpu.parallel.fullshard import render_fully_sharded
from gsplat_tpu.parallel.mesh import make_mesh
from gsplat_tpu.train.optim import OptimizationParams
from gsplat_tpu.train.trainer import TrainState


def main():
    n_dev = len(jax.devices())
    print(f"backend={jax.default_backend()} devices={n_dev}")
    on_tpu = jax.default_backend() == "tpu"

    # --- 1. data-parallel training over a `data` mesh axis -------------------
    ds = make_synthetic_dataset(n_points=512, n_views=n_dev, width=64, height=64,
                                holdout=0)
    model = GaussianModel.create(ds.points, ds.colors, ds.scales, max_sh_degree=0)
    state = TrainState.create(model)
    cams = batch_cameras([ds.cameras[i] for i in range(n_dev)])
    targets = jnp.stack([jnp.asarray(ds.images[i]) for i in range(n_dev)])
    cfg = RasterizerConfig(width=64, height=64, mode="rgb", max_instances=1 << 13,
                           impl="pallas" if on_tpu else "scan")
    mesh = make_mesh(n_dev, axis="data")
    kw = dict(config=cfg, opt_params=OptimizationParams(),
              camera_extent=float(ds.camera_extent))
    bg = jnp.zeros(3, jnp.float32)
    for i in range(20):
        state, metrics = data_parallel_train_step(
            state, cams, targets, bg, 0, mesh=mesh, **kw)
        if i % 5 == 0:
            print(f"  dp step {i:>2}: loss={float(metrics['loss']):.4f}")
    print(f"  dp step 19: loss={float(metrics['loss']):.4f}")

    # --- 2. fully-sharded render over a `shard` mesh axis --------------------
    m = state.model
    n = m.capacity
    assert n % n_dev == 0, (n, n_dev)
    scales = jnp.broadcast_to(jnp.exp(m.scales), (n, 3))
    opac = jax.nn.sigmoid(m.masked_opacities())
    shs = jnp.concatenate([m.features_dc, m.features_rest], axis=1) \
        if m.features_rest.shape[1] else m.features_dc
    smesh = make_mesh(n_dev, axis="shard")
    img, aux = render_fully_sharded(
        m.points, m.rotations, scales, opac, shs,
        camera=ds.cameras[0], config=cfg, sh_degree=0, mesh=smesh,
        exchange_budget=2048,
    )
    ref, _ = rasterize(
        m.points, m.rotations, scales, opac, shs,
        camera=ds.cameras[0], config=cfg, sh_degree=0,
    )
    d = float(jnp.abs(img - ref[..., :3]).max())
    print(f"  fully-sharded vs single-device render: max|d|={d:.2e} "
          f"overflow={bool(aux['overflow'])}")
    assert d < 1e-3


if __name__ == "__main__":
    main()
