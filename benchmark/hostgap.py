"""Separate the quality-scale wall/device gap (round-4 target #2).

At the protocol operating point the step costs ~317 ms wall while traced
device time is ~152 ms, and the wall does not move when device ops shrink
(PERFORMANCE.md round 3). This harness isolates the candidates:

  A. dispatch-only: N chunks dispatched back-to-back, ONE fetch at the end
     — the true device + async-dispatch pipeline floor (no retire path).
  B. the Trainer's pipelined loop (dispatch + per-chunk metrics fetch).
  C. A with chunk size 2x — does a per-chunk fixed cost (tunnel round
     trips, trace-cache lookup, input staging) explain the gap?
  D. A with the chunk inputs PRE-STAGED on device — is host->device input
     staging (cameras, ids: ~15 small tunnel transfers per chunk) the cost?

Usage: /opt/venv/bin/python benchmark/hostgap.py [CKPT]
"""
import os

# Persistent XLA compile cache: capacity-bucket regrowth recompiles the
# 736k-scale train/refine programs ~13x per protocol run (60-135 s each);
# cached, a resume or replay pays none of it.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(__import__("pathlib").Path(__file__).resolve().parent.parent / ".jax_tpu_cache"))
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else (
        "benchmark/scenes/atrium_hd/bench_default-014000.safetensors"
    )
    import jax

    from gsplat_tpu.api import reference_opt_params
    from gsplat_tpu.data.colmap import load_colmap
    from gsplat_tpu.train.trainer import Trainer

    ds = load_colmap("benchmark/scenes/atrium_hd", scale=1, holdout=8,
                     max_extent=float("inf"))
    tr = Trainer.from_checkpoint(
        ckpt, ds, opt_params=reference_opt_params(), strategy=None,
        max_instances=1 << 21, seed=0,
    )

    # --- B: the real pipelined loop --------------------------------------
    tr.train(40)  # compile + budget fit
    t0 = time.perf_counter()
    tr.train(200)
    np.asarray(tr.state.model.points.ravel()[0])
    wall_b = (time.perf_counter() - t0) / 200 * 1e3
    print(f"B trainer pipelined loop        {wall_b:8.1f} ms/step", flush=True)

    # --- A: dispatch-only, one fetch -------------------------------------
    def dispatch_only(k, n_chunks, tag, prestage=False):
        tr.chunk_steps = k
        state0 = tr.state
        inputs = [tr._build_chunk_inputs(k, 10_000 + i * k) for i in range(n_chunks)]
        if prestage:
            inputs = jax.tree_util.tree_map(
                lambda x: jax.device_put(x) if hasattr(x, "shape") else x, inputs
            )
        # warmup one chunk (trace at this K)
        tr._dispatch_chunk(inputs[0])
        np.asarray(tr.state.model.points.ravel()[0])
        t0 = time.perf_counter()
        for inp in inputs:
            tr._dispatch_chunk(inp)
        np.asarray(tr.state.model.points.ravel()[0])
        ms = (time.perf_counter() - t0) / (n_chunks * k) * 1e3
        print(f"{tag:<32}{ms:8.1f} ms/step", flush=True)
        tr.state = state0
        return ms

    dispatch_only(20, 10, "A dispatch-only K=20")
    dispatch_only(40, 5, "C dispatch-only K=40")
    dispatch_only(20, 10, "D dispatch-only K=20 prestaged", prestage=True)

    # --- E: dispatch-only with per-chunk metrics fetch (the retire cost) --
    tr.chunk_steps = 20
    inputs = [tr._build_chunk_inputs(20, 20_000 + i * 20) for i in range(10)]
    packs = tr._dispatch_chunk(inputs[0])
    np.asarray(packs)
    t0 = time.perf_counter()
    pending = None
    for inp in inputs:
        packs = tr._dispatch_chunk(inp)
        if pending is not None:
            np.asarray(pending)  # retire previous (pipelined fetch)
        pending = packs
    np.asarray(pending)
    np.asarray(tr.state.model.points.ravel()[0])
    ms = (time.perf_counter() - t0) / 200 * 1e3
    print(f"{'E dispatch + pipelined fetch':<32}{ms:8.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
