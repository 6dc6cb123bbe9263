"""Probe: can Mosaic lower a vectorized VMEM gather (jnp.take / x[ids])
inside a Pallas TPU kernel, and how fast is it vs the XLA row-gather?

The instance-table gather (rasterize.py:_gather_instance_table) costs
~2-2.6 ms at the bench config for ~0.1 ms of bandwidth; if `dynamic_gather`
lowers, a Pallas kernel with the whole (N, 16) table resident in VMEM can
stream the sorted ids and gather at VPU speed.

Usage: /opt/venv/bin/python benchmark/micro9.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 100_352        # table rows (multiple of 1024)
I = 380_928        # instances (multiple of 1024)
F = 16             # row width
REPS = 40


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    except Exception as e:
        print(f"  {name:<44} FAILED: {type(e).__name__}: {str(e)[:300]}")
        return None
    t0 = time.perf_counter()
    for _i in range(REPS):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"  {name:<44} {ms:8.3f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, N, I).astype(np.int32))
    ids_sorted = jnp.sort(ids)

    # --- XLA reference -----------------------------------------------------
    ref = timeit("xla take (random ids)", jax.jit(lambda t, i: jnp.take(t, i, axis=0)), table, ids)
    timeit("xla take (sorted ids)", jax.jit(lambda t, i: jnp.take(t, i, axis=0)), table, ids_sorted)

    # --- Pallas: whole table in VMEM, gather per id-block -------------------
    BLK = 1024

    def kernel(ids_ref, table_ref, o_ref):
        o_ref[:] = jnp.take(table_ref[:], ids_ref[:], axis=0)

    def pallas_gather(t, i):
        return pl.pallas_call(
            kernel,
            grid=(I // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda b: (b,), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, F), lambda b: (b, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((I, F), jnp.float32),
        )(i, t)

    got = timeit("pallas take(table_vmem, ids_blk)", jax.jit(pallas_gather), table, ids)
    if got is not None and ref is not None:
        print("  allclose:", bool(jnp.allclose(got, ref)))

    # --- Pallas variant: table transposed (F, N), gather along lanes --------
    tableT = table.T.copy()  # (F=16 sublane-ish, N lanes)

    def kernel_t(ids_ref, table_ref, o_ref):
        o_ref[:] = jnp.take(table_ref[:], ids_ref[:], axis=1)

    def pallas_gather_t(t, i):
        return pl.pallas_call(
            kernel_t,
            grid=(I // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda b: (b,), memory_space=pltpu.VMEM),
                pl.BlockSpec((F, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((F, BLK), lambda b: (0, b), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F, I), jnp.float32),
        )(i, t)

    gotT = timeit("pallas take(tableT_vmem, axis=1)", jax.jit(pallas_gather_t), tableT, ids)
    if gotT is not None and ref is not None:
        print("  allclose:", bool(jnp.allclose(gotT.T, ref)))

    # --- Pallas in-kernel scatter-add probe (the gather-transpose bwd) -------
    # accumulate ct rows onto a VMEM-resident (N, F) accumulator across the
    # sequential grid; if `.at[ids].add` lowers, the backward segment-sum
    # (1.2 ms XLA scatter-add) can ride the same VMEM-resident design.
    def kernel_scat(ids_ref, ct_ref, o_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] = o_ref[:].at[ids_ref[:]].add(ct_ref[:])

    def pallas_scatter_add(i, ct):
        return pl.pallas_call(
            kernel_scat,
            grid=(I // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda b: (b,), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, F), lambda b: (b, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((N, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
        )(i, ct)

    ct = jnp.asarray(rng.normal(size=(I, F)).astype(np.float32))
    sref = timeit("xla scatter-add rows", jax.jit(
        lambda i, c: jnp.zeros((N, F), jnp.float32).at[i].add(c)), ids, ct)
    sgot = timeit("pallas scatter-add rows (vmem accum)",
                  jax.jit(pallas_scatter_add), ids, ct)
    if sgot is not None and sref is not None:
        print("  allclose:", bool(jnp.allclose(sgot, sref, atol=1e-3)))

    # --- Scatter-max probe: monotone idx (the tiles.py marker scatter) ------
    M = N
    upd_idx = jnp.sort(jnp.asarray(rng.integers(0, I, M).astype(np.int32)))
    upd_val = jnp.asarray(rng.integers(1, N, M).astype(np.int32))
    timeit(
        "xla scatter-max (monotone idx)",
        jax.jit(lambda i, v: jnp.zeros((I,), jnp.int32).at[i].max(v, mode="drop")),
        upd_idx, upd_val,
    )


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    main()
