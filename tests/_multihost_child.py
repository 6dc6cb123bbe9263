"""Child process for the multi-host test (tests/test_multihost.py).

Runs ONE data-parallel train step over a 4-device global mesh, either as
one process of a 2-process gloo-backed CPU job (mode=dist: 2 local devices
each, per-process local view loading through `host_local_to_global`) or as
a single process owning all 4 devices (mode=ref). Prints a JSON line with
the step loss and per-parameter checksums; the parent asserts the
distributed processes agree with each other and with the reference.

Usage: python _multihost_child.py <mode> <coordinator> <nprocs> <pid>
"""
import json
import sys

import numpy as np

mode, coordinator, nprocs, pid = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
)

import jax

if mode == "dist":
    from gsplat_tpu.parallel import init_distributed

    init_distributed(coordinator, nprocs, pid)

import jax.numpy as jnp

from gsplat_tpu.data.colmap import make_synthetic_dataset
from gsplat_tpu.models.gaussians import GaussianModel
from gsplat_tpu.ops.rasterize import RasterizerConfig
from gsplat_tpu.parallel import (
    batch_cameras,
    data_parallel_train_step,
    host_local_to_global,
    make_global_mesh,
)
from gsplat_tpu.train.optim import OptimizationParams
from gsplat_tpu.train.trainer import TrainState

assert len(jax.devices()) == 4, jax.devices()
mesh = make_global_mesh(axis="data")

ds = make_synthetic_dataset(n_points=60, n_views=4, width=32, height=32, holdout=0)
model = GaussianModel.create(ds.points, ds.colors, ds.scales, max_sh_degree=0)
# numpy leaves: identical on every process -> jit replicates them globally.
state = jax.tree_util.tree_map(np.asarray, TrainState.create(model))

B = 4
if mode == "dist":
    # Each host loads ONLY its own slice of the view batch from "disk".
    lo, hi = pid * (B // nprocs), (pid + 1) * (B // nprocs)
    local_cams = batch_cameras([ds.cameras[i] for i in range(lo, hi)])
    local_targets = np.stack([np.asarray(ds.images[i]) for i in range(lo, hi)])
    cams = host_local_to_global(mesh, "data", local_cams)
    targets = host_local_to_global(mesh, "data", local_targets)
else:
    cams = batch_cameras([ds.cameras[i] for i in range(B)])
    targets = jnp.stack([jnp.asarray(ds.images[i]) for i in range(B)])

cfg = RasterizerConfig(width=32, height=32, mode="rgb", max_instances=4096, impl="scan")
new_state, metrics = data_parallel_train_step(
    state, cams, targets, jnp.zeros(3, jnp.float32), 0,
    config=cfg, opt_params=OptimizationParams(),
    camera_extent=float(ds.camera_extent), mesh=mesh,
)

out = {
    "pid": pid,
    "loss": float(np.asarray(jax.device_get(metrics["loss"]))),
    "checksums": {
        k: float(np.sum(np.asarray(jax.device_get(v))))
        for k, v in new_state.model.params().items()
    },
}
print("RESULT " + json.dumps(out), flush=True)
