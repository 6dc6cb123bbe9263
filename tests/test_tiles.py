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
    """Ordering fidelity at a 1080p tile grid (8,160 tiles). The two-key
    (tile, full-depth-bits) sort must produce ZERO depth inversions — the
    exact order the reference's UInt64 key gives (utils.jl:85-120). (A
    round-1 packed u32 key kept only 11 mantissa bits here and allowed
    near-tie inversions; the image-equivalence test below showed those
    reach 0.15 pixel error, so the key was widened.)"""
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
    assert worst == 0.0, f"exact two-key sort must have zero inversions, got {worst}"


def test_sort_image_equivalence_vs_exact_two_key(rng):
    """Image-level fidelity at a 1080p tile grid (VERDICT r1 #9): blend the
    SAME instance multiset (a) in build_instances' sort order and (b)
    re-sorted per tile by full-precision f32 depth in numpy (the
    reference's (tile, depth) order, utils.jl:85-120) and assert the
    composited tiles agree. With the exact two-key sort these must match to
    float tolerance; a truncated packed key reintroduced here fails loudly
    (near-tie high-alpha splats composite out of order, 0.15 max pixel
    error measured)."""
    import jax.numpy as jnp

    from gsplat_tpu.ops import tiles
    from gsplat_tpu.ops.blend_scan import blend_scan
    from gsplat_tpu.ops.rasterize import _gather_instance_table

    grid = (120, 68)  # 1920x1088 -> 8160 tiles, 13 tile bits / 19 depth bits
    gx, gy = grid
    n = 6_000
    # Cluster splats in a horizontal band so a few hundred tiles are deep
    # while the tile-bit allocation still reflects the full 1080p grid.
    mean_2d = np.stack(
        [rng.uniform(0, 1920, n), rng.uniform(380, 700, n)], axis=1
    ).astype(np.float32)
    base = rng.uniform(0.3, 900.0, n // 10)
    depth = np.concatenate(
        [np.repeat(base, 5) * (1.0 + rng.uniform(-2e-4, 2e-4, n // 2)),
         rng.uniform(0.3, 900.0, n - n // 2)]
    ).astype(np.float32)
    radius = rng.integers(8, 30, size=n).astype(np.int32)

    res = tiles.build_instances(
        jnp.asarray(mean_2d), jnp.asarray(depth), jnp.asarray(radius),
        grid_wh=grid, max_instances=1 << 19, chunk=128,
    )
    assert not bool(res["overflow"])
    ids = np.asarray(res["padded_ids"])
    start = np.asarray(res["tile_start"])
    count = np.asarray(res["tile_count"])

    # Exact two-key order: stable re-sort of each tile's ids by f32 depth.
    ids_exact = ids.copy()
    for t in np.nonzero(count > 1)[0]:
        s, c = start[t], count[t]
        gid = ids[s : s + c]
        ids_exact[s : s + c] = gid[np.argsort(depth[gid], kind="stable")]

    # Identical instance tables up to within-tile order.
    conic = np.tile(np.array([[0.02, 0.0, 0.02]], np.float32), (n, 1))
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    feats = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    mk = lambda pid: _gather_instance_table(
        jnp.asarray(pid), jnp.asarray(mean_2d), jnp.asarray(conic),
        jnp.asarray(opac), jnp.asarray(feats),
    )
    kw = dict(grid_wh=grid, n_feat=3, chunk=128)
    c_u32, T_u32, _ = blend_scan(mk(ids), res["tile_start"], res["tile_count"], **kw)
    c_ex, T_ex, _ = blend_scan(mk(ids_exact), res["tile_start"], res["tile_count"], **kw)

    dc = np.abs(np.asarray(c_u32) - np.asarray(c_ex))
    dT = np.abs(np.asarray(T_u32) - np.asarray(T_ex))
    assert dc.max() < 1e-5, f"max color diff {dc.max()}"
    assert dT.max() < 1e-5, f"max transmittance diff {dT.max()}"


def test_cummax_pallas_matches_lax(rng):
    """The streaming Pallas scan (ops/cummax_pallas.py) must equal
    lax.cummax exactly — it replaces it inside build_instances on TPU."""
    import jax

    from gsplat_tpu.ops.cummax_pallas import cummax_pallas

    for n, density in ((1024, 0.9), (8192, 0.02), (1024 * 37, 0.3)):
        x = np.zeros(n, np.int32)
        pos = np.sort(rng.choice(n, max(1, int(n * density)), replace=False))
        x[pos] = rng.integers(1, 1 << 30, len(pos))
        # Monotone variant too (the shape build_instances produces).
        for vals in (x, np.sort(x)):
            out = np.asarray(cummax_pallas(jnp.asarray(vals)))
            np.testing.assert_array_equal(out, np.maximum.accumulate(vals))


def test_build_instances_duplicate_run_heavy(rng):
    """The dedup'd unique scatter-set spelling of the marker expansion
    (tiles.py round 3) must survive LONG duplicate-offset runs: consecutive
    culled gaussians all share their successor's offset. 70% culled with
    clustered runs + many empty tiles (pad markers with zero pad_counts)."""
    grid = (4, 4)
    n = 256
    mean_2d = rng.uniform(-10, 70, size=(n, 2)).astype(np.float32)
    # Cluster culls in long runs: blocks of 32 with a single survivor.
    radius = np.zeros(n, np.int32)
    for b in range(0, n, 32):
        keep = b + int(rng.integers(0, 32))
        radius[keep] = int(rng.integers(5, 40))
    depth = rng.uniform(0.5, 10.0, size=n).astype(np.float32)

    res = tiles.build_instances(
        jnp.asarray(mean_2d), jnp.asarray(depth), jnp.asarray(radius),
        grid_wh=grid, max_instances=1024, chunk=8,
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
        assert np.all(ids >= 0)
        assert np.all(np.diff(depth[ids]) >= 0)
        got.extend((t, i) for i in ids)
    assert sorted(got) == sorted((t, i) for t, _, i in expected)

    # Degenerate: EVERYTHING culled -> zero instances, all pads.
    res0 = tiles.build_instances(
        jnp.asarray(mean_2d), jnp.asarray(depth),
        jnp.asarray(np.zeros(n, np.int32)),
        grid_wh=grid, max_instances=1024, chunk=8,
    )
    assert int(res0["n_instances"]) == 0
    assert np.all(np.asarray(res0["padded_ids"]) == -1)
