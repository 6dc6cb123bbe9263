"""Micro-timings of individual ops on the real TPU (binning internals,
gather transpose, Adam, SSIM) — finds which primitive dominates a stage.

Usage: /opt/venv/bin/python benchmark/micro.py
"""
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

REPS = 40


def timeit(name, fn, *args):
    out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ravel")]
    _ = np.asarray(leaves[0].ravel()[0])
    t0 = time.perf_counter()
    for _i in range(REPS):
        out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ravel")]
    _ = np.asarray(leaves[0].ravel()[0])
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"  {name:<36} {ms:8.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    N = 100_000
    I = 400_000
    I_pad = 401_408
    n_tiles = 61 * 34

    key = jnp.asarray(rng.integers(0, 2**32, I, dtype=np.uint32))
    gid = jnp.asarray(rng.integers(0, N, I, dtype=np.int32))

    print("binning internals (I=400k):")
    timeit("sort_key_val u32 (I)", jax.jit(jax.lax.sort_key_val), key, gid)
    srt = jnp.sort(key)
    tiles_iota = jnp.arange(n_tiles, dtype=jnp.int32)
    timeit("searchsorted 2x (T over I)",
           jax.jit(lambda s, ti: (jnp.searchsorted(s, ti.astype(jnp.uint32)),
                                  jnp.searchsorted(s, ti.astype(jnp.uint32), side="right"))),
           srt, tiles_iota)

    offsets = jnp.asarray(np.sort(rng.integers(0, I, N)).astype(np.int32))
    vals = jnp.arange(1, N + 1, dtype=jnp.int32)
    timeit("marker scatter-max (N->I)",
           jax.jit(lambda o, v: jnp.zeros((I,), jnp.int32).at[o].max(v, mode="drop")),
           offsets, vals)
    markers = jnp.zeros((I,), jnp.int32).at[offsets].max(vals, mode="drop")
    timeit("cummax (I)", jax.jit(jax.lax.cummax), markers)

    pack = jnp.asarray(rng.standard_normal((N, 5)).astype(np.float32))
    gidc = jnp.clip(gid, 0, N - 1)
    timeit("row gather (N,5)->(I,5)", jax.jit(lambda p, g: p[g]), pack, gidc)

    dest = jnp.asarray(rng.permutation(I_pad)[:I].astype(np.int32))
    timeit("scatter set (I)->(I_pad)",
           jax.jit(lambda d, g: jnp.full((I_pad,), -1, jnp.int32).at[d].set(g, mode="drop")),
           dest, gid)

    print("gather/transpose (table):")
    pack16 = jnp.asarray(rng.standard_normal((N, 16)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, N, I_pad, dtype=np.int32))
    gf = lambda p, i: jnp.take(p, i, axis=0)
    timeit("fwd row gather (N,16)->(I_pad,16)", jax.jit(gf), pack16, ids)
    ct = jnp.asarray(rng.standard_normal((I_pad, 16)).astype(np.float32))
    timeit("transpose scatter-add (I_pad,16)->(N,16)",
           jax.jit(lambda c, i: jnp.zeros((N, 16), jnp.float32).at[i].add(c)),
           ct, ids)
    # alternative: segment-sum after sorting ids (ids pre-sorted variant)
    ids_sorted = jnp.sort(ids)
    timeit("transpose scatter-add (sorted ids)",
           jax.jit(lambda c, i: jnp.zeros((N, 16), jnp.float32).at[i].add(c)),
           ct, ids_sorted)
    timeit("segment_sum (sorted ids)",
           jax.jit(lambda c, i: jax.ops.segment_sum(c, i, num_segments=N,
                                                    indices_are_sorted=True)),
           ct, ids_sorted)
    # cumsum-difference trick: contiguous ranges per gaussian
    starts = jnp.asarray(np.sort(rng.integers(0, I_pad, N)).astype(np.int32))
    def cumsum_range(c, s):
        cs = jnp.concatenate([jnp.zeros((1, 16)), jnp.cumsum(c, axis=0)], 0)
        e = jnp.concatenate([s[1:], jnp.array([I_pad], jnp.int32)])
        return cs[e] - cs[s]
    timeit("cumsum+range-diff (I_pad,16)->(N,16)", jax.jit(cumsum_range), ct, starts)

    print("optimizer/loss:")
    params = jnp.asarray(rng.standard_normal((N, 59)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((N, 59)).astype(np.float32))
    m = jnp.zeros_like(params)
    v = jnp.zeros_like(params)
    def adam(p, g, m, v):
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        return p - 0.001 * m / (jnp.sqrt(v) + 1e-8), m, v
    timeit("adam-ish (N,59)", jax.jit(adam), params, g, m, v)

    from gsplat_tpu.train.losses import photometric_loss
    a = jnp.asarray(rng.uniform(0, 1, (544, 976, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (544, 976, 3)).astype(np.float32))
    timeit("L1+SSIM fwd", jax.jit(lambda x, y: photometric_loss(x, y, 0.2)[0]), a, b)
    timeit("L1+SSIM fwd+bwd",
           jax.jit(jax.grad(lambda x, y: photometric_loss(x, y, 0.2)[0])), a, b)


if __name__ == "__main__":
    main()
