"""Probe: faster spellings for the two remaining XLA line-items in binning
and the instance fetch (PERFORMANCE.md round-3 targets):

  1. the marker scatter (tiles.py:163, ~1.6 ms XLA scatter-max at 380k)
     - indices_are_sorted / unique_indices flag variants
     - scatter cummax'd values (dedups runs for free)
  2. the instance-table row gather (rasterize.py, 2.36 ms XLA take at 380k)
     - take along the LANE axis of the transposed (F, N) table (the compact
       orientation the blend consumes — would also kill the repack)
     - 2-D-shaped ids (does XLA vectorize the minor gather dim?)
     - bf16 rows (is the cost per-row or bandwidth?)

Usage: /opt/venv/bin/python benchmark/micro13.py   (run on the real TPU)
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

N = 100_352        # gaussians (table rows)
T = 4_096          # tiles (pad markers)
I = 380_928        # instance slots (multiple of 1024)
F = 16
REPS = 40


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    except Exception as e:
        print(f"  {name:<52} FAILED: {type(e).__name__}: {str(e)[:240]}")
        return None
    t0 = time.perf_counter()
    for _i in range(REPS):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"  {name:<52} {ms:8.3f} ms", flush=True)
    return out


def make_marker_inputs(rng):
    """Realistic tiles.py marker-scatter inputs: sorted idx with duplicate
    runs (culled gaussians share their successor's offset), val = gid+1 or 0."""
    counts = rng.integers(0, 8, N).astype(np.int32)
    counts[rng.random(N) < 0.35] = 0  # culled
    total = counts.sum()
    scale = (I * 0.7) / max(total, 1)
    counts = np.minimum((counts * scale).astype(np.int32), 127)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    idx = np.concatenate([offsets, counts.sum() + np.arange(T)]).astype(np.int32)
    val = np.concatenate([
        np.where(counts > 0, np.arange(1, N + 1), 0),
        (1 << 24) + np.arange(1, T + 1),
    ]).astype(np.int32)
    return jnp.asarray(idx), jnp.asarray(val)


def main():
    rng = np.random.default_rng(0)

    # ---- marker scatter variants -------------------------------------------
    idx, val = make_marker_inputs(rng)
    ref = timeit(
        "scatter-max (current: mode=drop)",
        jax.jit(lambda i, v: jnp.zeros((I,), jnp.int32).at[i].max(v, mode="drop")),
        idx, val,
    )
    timeit(
        "scatter-max + indices_are_sorted",
        jax.jit(lambda i, v: jnp.zeros((I,), jnp.int32).at[i].max(
            v, mode="drop", indices_are_sorted=True)),
        idx, val,
    )
    got = timeit(
        "scatter-max of cummax(val) + sorted flag",
        jax.jit(lambda i, v: jnp.zeros((I,), jnp.int32).at[i].max(
            jax.lax.cummax(v), mode="drop", indices_are_sorted=True)),
        idx, val,
    )
    # cummax'd scatter then owner-cummax must equal scatter+cummax on markers.
    if ref is not None and got is not None:
        ok = bool(jnp.all(jax.lax.cummax(ref) == jax.lax.cummax(got)))
        print("  owner equivalence (cummax'd variant):", ok)
    # Dedup'd unique scatter-set: only last-of-run entries, others dropped.
    def dedup_set(i, v):
        cv = jax.lax.cummax(v)
        last = jnp.concatenate([i[1:] != i[:-1], jnp.ones((1,), bool)])
        iu = jnp.where(last, i, I)  # out-of-bounds -> dropped
        return jnp.zeros((I,), jnp.int32).at[iu].set(
            cv, mode="drop", unique_indices=True)
    got2 = timeit("dedup'd unique scatter-set of cummax(val)",
                  jax.jit(dedup_set), idx, val)
    if ref is not None and got2 is not None:
        ok = bool(jnp.all(jax.lax.cummax(ref) == jax.lax.cummax(got2)))
        print("  owner equivalence (dedup'd set):", ok)

    # ---- instance row-gather variants ---------------------------------------
    table = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    tableT = jnp.asarray(np.asarray(table).T.copy())  # (F, N)
    ids = jnp.asarray(rng.integers(0, N, I).astype(np.int32))

    ref = timeit("xla take rows (N,F) axis=0 [current]",
                 jax.jit(lambda t, i: jnp.take(t, i, axis=0)), table, ids)
    gotT = timeit("xla take lanes (F,N) axis=1 [compact orient]",
                  jax.jit(lambda t, i: jnp.take(t, i, axis=1)), tableT, ids)
    if ref is not None and gotT is not None:
        print("  allclose:", bool(jnp.allclose(gotT.T, ref)))
    timeit("xla take rows, ids shaped (I/8, 8)",
           jax.jit(lambda t, i: jnp.take(t, i.reshape(-1, 8), axis=0)), table, ids)
    timeit("xla take rows, bf16 table",
           jax.jit(lambda t, i: jnp.take(t, i, axis=0)),
           table.astype(jnp.bfloat16), ids)
    timeit("xla take lanes (F,N) bf16",
           jax.jit(lambda t, i: jnp.take(t, i, axis=1)),
           tableT.astype(jnp.bfloat16), ids)
    # The backward of the lane gather (scatter-add along lanes).
    ct = jnp.asarray(rng.normal(size=(F, I)).astype(np.float32))
    timeit("xla scatter-add lanes (bwd of take axis=1)",
           jax.jit(lambda i, c: jnp.zeros((F, N), jnp.float32).at[:, i].add(c)),
           ids, ct)
    ctr = jnp.asarray(rng.normal(size=(I, F)).astype(np.float32))
    timeit("xla scatter-add rows (bwd of take axis=0) [current]",
           jax.jit(lambda i, c: jnp.zeros((N, F), jnp.float32).at[i].add(c)),
           ids, ctr)
    # Segment-sum spelling of the row scatter-add (ids unsorted here; the
    # real bwd sees tile-sorted ids).
    timeit("segment_sum rows",
           jax.jit(lambda i, c: jax.ops.segment_sum(c, i, num_segments=N)),
           ids, ctr)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    main()
