"""Instance binning: brute-force cross-check of the static-shape pipeline."""
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.constants import TILE
from gsplat_tpu.ops import tiles


def brute_force_instances(mean_2d, depth, radius, grid_wh):
    """All (tile, depth, gid) instances via plain python loops."""
    gx, gy = grid_wh
    out = []
    rmin, rmax = tiles.tile_rect(jnp.asarray(mean_2d), jnp.asarray(radius), grid_wh)
    rmin, rmax = np.asarray(rmin), np.asarray(rmax)
    for i in range(len(radius)):
        if radius[i] <= 0:
            continue
        for ty in range(rmin[i, 1], rmax[i, 1]):
            for tx in range(rmin[i, 0], rmax[i, 0]):
                out.append((ty * gx + tx, depth[i], i))
    return sorted(out, key=lambda e: (e[0], e[1]))


def test_tile_rect_semantics():
    """get_rect floor/ceil-div + clamp semantics (utils.jl:18-29)."""
    grid = (4, 4)
    m = jnp.array([[24.0, 24.0]])
    r = jnp.array([8], jnp.int32)
    rmin, rmax = tiles.tile_rect(m, r, grid)
    # [16, 32] spans tiles 1..2 → rmin=(1,1), rmax=(2,2); the touching-right
    # edge at 32 = tile boundary gives ceil(32/16)=2.
    assert rmin.tolist() == [[1, 1]] and rmax.tolist() == [[2, 2]]

    # Clamping at the grid edge.
    m = jnp.array([[-50.0, 1000.0]])
    r = jnp.array([10], jnp.int32)
    rmin, rmax = tiles.tile_rect(m, r, grid)
    assert rmin.tolist() == [[0, 4]] and rmax.tolist() == [[0, 4]]


def test_build_instances_matches_bruteforce(rng):
    grid = (4, 3)
    n = 64
    mean_2d = rng.uniform(-10, 70, size=(n, 2)).astype(np.float32)
    depth = rng.uniform(0.5, 10.0, size=n).astype(np.float32)
    radius = rng.integers(0, 20, size=n).astype(np.int32)

    res = tiles.build_instances(
        jnp.asarray(mean_2d),
        jnp.asarray(depth),
        jnp.asarray(radius),
        grid_wh=grid,
        max_instances=1024,
        chunk=8,
    )
    assert not bool(res["overflow"])

    expected = brute_force_instances(mean_2d, depth, radius, grid)
    assert int(res["n_instances"]) == len(expected)

    padded_ids = np.asarray(res["padded_ids"])
    tile_start = np.asarray(res["tile_start"])
    tile_count = np.asarray(res["tile_count"])

    got = []
    for t in range(grid[0] * grid[1]):
        s, c = tile_start[t], tile_count[t]
        ids = padded_ids[s : s + c]
        assert np.all(ids >= 0), "real range must not contain padding"
        # padding after the range up to the chunk boundary is -1
        pad_end = s + -(-c // 8) * 8
        assert np.all(padded_ids[s + c : pad_end] == -1)
        # within a tile: sorted by depth
        d = depth[ids]
        assert np.all(np.diff(d) >= 0)
        got.extend((t, depth[i], i) for i in ids)

    # Same multiset of (tile, gaussian) pairs.
    assert sorted((t, i) for t, _, i in got) == sorted((t, i) for t, _, i in expected)


def test_build_instances_chunk_alignment(rng):
    grid = (2, 2)
    res = tiles.build_instances(
        jnp.asarray(rng.uniform(0, 60, size=(10, 2)).astype(np.float32)),
        jnp.asarray(rng.uniform(1, 5, size=10).astype(np.float32)),
        jnp.asarray(np.full(10, 30, np.int32)),
        grid_wh=grid,
        max_instances=256,
        chunk=16,
    )
    assert np.all(np.asarray(res["tile_start"]) % 16 == 0)


def test_overflow_flag():
    n = 8
    res = tiles.build_instances(
        jnp.full((n, 2), 32.0),
        jnp.ones(n),
        jnp.full((n,), 100, jnp.int32),  # each touches every tile
        grid_wh=(4, 4),
        max_instances=16,  # 8*16=128 instances > 16
        chunk=8,
    )
    assert bool(res["overflow"])


def test_empty_scene():
    res = tiles.build_instances(
        jnp.zeros((4, 2)),
        jnp.zeros(4),
        jnp.zeros(4, jnp.int32),
        grid_wh=(2, 2),
        max_instances=64,
        chunk=8,
    )
    assert int(res["n_instances"]) == 0
    assert np.all(np.asarray(res["padded_ids"]) == -1)
    assert np.all(np.asarray(res["tile_count"]) == 0)


def test_sort_depth_truncation_at_1080p_scale(rng):
    """Ordering fidelity of the u32 single-key sort at a 1080p tile grid
    (8,160 tiles -> 13 tile bits, 19 depth bits = 8 exponent + 11 mantissa).
    Claim under test (tiles.py:135-144): inversions vs a full-precision
    (tile, depth) sort occur ONLY between near-identical depths — relative
    depth inversions are bounded by one truncated-mantissa ulp (2^-10)."""
    grid = (120, 68)  # 1920x1088
    gx, gy = grid
    n = 50_000
    mean_2d = np.stack(
        [rng.uniform(0, 1920, n), rng.uniform(0, 1088, n)], axis=1
    ).astype(np.float32)
    # Adversarial depth distribution: clusters of near-identical depths at
    # many magnitudes plus uniform filler.
    base = rng.uniform(0.3, 900.0, n // 10)
    depth = np.concatenate(
        [np.repeat(base, 5) * (1.0 + rng.uniform(-2e-4, 2e-4, n // 2)),
         rng.uniform(0.3, 900.0, n - n // 2)]
    ).astype(np.float32)
    radius = rng.integers(1, 24, size=n).astype(np.int32)

    # 8k+ sparsely-filled tiles: the chunk-aligned re-pack waste is large,
    # so the budget must carry it (the Trainer would grow to this on the
    # overflow flag).
    res = tiles.build_instances(
        jnp.asarray(mean_2d), jnp.asarray(depth), jnp.asarray(radius),
        grid_wh=grid, max_instances=1 << 22, chunk=128,
    )
    assert not bool(res["overflow"])

    ids = np.asarray(res["padded_ids"])
    start = np.asarray(res["tile_start"])
    count = np.asarray(res["tile_count"])
    worst = 0.0
    checked = 0
    for t in np.nonzero(count > 1)[0][::7]:  # sample tiles
        gid = ids[start[t] : start[t] + count[t]]
        assert np.all(gid >= 0)
        d = depth[gid]
        # Relative inversion size between adjacent sorted entries.
        inv = np.maximum(0.0, (d[:-1] - d[1:]) / np.maximum(d[1:], 1e-9))
        worst = max(worst, float(inv.max(initial=0.0)))
        checked += len(d)
    assert checked > 10_000
    assert worst <= 2.0 ** -10, f"depth inversion {worst} exceeds one ulp bound"
