"""cost_distance vs a sequential full-mosaic Dijkstra oracle.

Exactness contract: a path's cost accumulates left-to-right along the
path in both implementations, so optimal values match bit-for-bit —
the comparisons below are EXACT float equality, not allclose."""

import heapq
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.kernels import png as pngk
from tilegrab_spark.operators.costdistance import _MOVES, cost_distance

Z = 4
X0, Y0 = 5, 6


def _table(spark, tiles, px):
    rows = []
    for (dx, dy), g in tiles.items():
        x, y = X0 + dx, Y0 + dy
        arr = np.stack([g, g, g], axis=2).astype(np.uint8)
        rows.append((f"{Z}_{x}_{y}", pngk.encode_png(arr), px, px, "png", Z, x, y))
    return spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, z int, x long, y long",
    )


def _sources_df(spark, pts):
    return spark.createDataFrame([(int(gx), int(gy)) for gx, gy in pts], "gx long, gy long")


def _oracle(tiles, px, pts, sids=None):
    """Sequential lexicographic (dist, sid) Dijkstra over the stitched
    mosaic; uncovered cells block movement. ``pts`` are mosaic-local
    (mx, my); ``sids`` default to the operator's global-pixel-id rule
    computed at world scale (passed in by the caller when asserted)."""
    dxs = [d for d, _ in tiles]
    dys = [d for _, d in tiles]
    ox, oy = min(dxs), min(dys)
    W = (max(dxs) - ox + 1) * px
    H = (max(dys) - oy + 1) * px
    cost = np.zeros((H, W))
    covered = np.zeros((H, W), dtype=bool)
    for (dx, dy), g in tiles.items():
        ys, xs = (dy - oy) * px, (dx - ox) * px
        cost[ys:ys + px, xs:xs + px] = g
        covered[ys:ys + px, xs:xs + px] = True
    c = cost.ravel()
    cov = covered.ravel()
    dist = np.full(H * W, np.inf)
    lab = np.full(H * W, np.int64(-1))
    if sids is None:
        n_world = (1 << Z) * px
        gx0, gy0 = (X0 + ox) * px, (Y0 + oy) * px
        sids = [(gy0 + my) * n_world + (gx0 + mx) for mx, my in pts]
    pq = []
    for (mx, my), s0 in zip(pts, sids):
        i = my * W + mx
        if cov[i] and (dist[i], lab[i] if lab[i] >= 0 else np.inf) > (0.0, s0):
            dist[i], lab[i] = 0.0, s0
            heapq.heappush(pq, (0.0, int(s0), i))
    while pq:
        d, s0, i = heapq.heappop(pq)
        if d > dist[i] or (d == dist[i] and s0 > lab[i]):
            continue
        y, x = divmod(i, W)
        for dx, dy, step in _MOVES:
            nx_, ny_ = x + dx, y + dy
            if 0 <= nx_ < W and 0 <= ny_ < H:
                j = ny_ * W + nx_
                if not cov[j]:
                    continue
                nd = d + step * (c[i] + c[j]) / 2.0
                if nd < dist[j] or (nd == dist[j] and s0 < lab[j]):
                    dist[j], lab[j] = nd, s0
                    heapq.heappush(pq, (nd, s0, j))
    return dist.reshape(H, W), lab.reshape(H, W), (ox, oy)


def _check(spark, tiles, px, pts_mosaic, **kw):
    """pts_mosaic are mosaic-local; converted to global px for the op."""
    dxs = [d for d, _ in tiles]
    dys = [d for _, d in tiles]
    ox, oy = min(dxs), min(dys)
    gx0 = (X0 + ox) * px
    gy0 = (Y0 + oy) * px
    pts_global = [(gx0 + mx, gy0 + my) for mx, my in pts_mosaic]
    df = _table(spark, tiles, px)
    want, want_lab, _ = _oracle(tiles, px, pts_mosaic)
    out = {
        (r["x"], r["y"]): r
        for r in cost_distance(
            df, _sources_df(spark, pts_global), zoom=Z, tile_px=px, **kw
        ).collect()
    }
    for (dx, dy) in tiles:
        r = out[(X0 + dx, Y0 + dy)]
        assert r["status"] == "ok"
        got = np.frombuffer(r["dist"], dtype="<f8").reshape(px, px)
        ys, xs = (dy - oy) * px, (dx - ox) * px
        np.testing.assert_array_equal(got, want[ys:ys + px, xs:xs + px])
        got_lab = np.frombuffer(r["alloc"], dtype="<i8").reshape(px, px)
        np.testing.assert_array_equal(got_lab, want_lab[ys:ys + px, xs:xs + px])
        fin = np.isfinite(got)
        assert r["reached_px"] == int(fin.sum())
        if fin.any():
            assert r["min_dist"] == float(got[fin].min())
    return out


def test_uniform_cost_single_source(spark):
    px, n = 16, 3
    tiles = {(dx, dy): np.full((px, px), 10, dtype=np.uint8)
             for dx in range(n) for dy in range(n)}
    out = _check(spark, tiles, px, [(20, 23)])
    # distance grows ~10 * chebyshev-ish metric; everything reachable
    assert all(r["reached_px"] == px * px for r in out.values())


def test_random_friction_multi_source(spark):
    px, n = 16, 3
    rng = np.random.default_rng(5)
    full = rng.integers(1, 200, size=(n * px, n * px), dtype=np.uint8)
    tiles = {
        (dx, dy): full[dy * px:(dy + 1) * px, dx * px:(dx + 1) * px]
        for dx in range(n) for dy in range(n)
    }
    _check(spark, tiles, px, [(3, 4), (40, 44), (25, 10)])


def test_wall_forces_detour_through_other_tiles(spark):
    px, n = 16, 3
    full = np.ones((n * px, n * px), dtype=np.uint8)
    # a near-total vertical wall in the middle column of tiles: the
    # cheap path from west to east must detour through the one gap,
    # re-entering tiles multiple times (wavefront revisits)
    full[:, 22:26] = 255
    full[1, 22:26] = 1  # the gap
    tiles = {
        (dx, dy): full[dy * px:(dy + 1) * px, dx * px:(dx + 1) * px]
        for dx in range(n) for dy in range(n)
    }
    out = _check(spark, tiles, px, [(2, 30)])
    # east of the wall is reached (via the gap), at much higher cost
    east = out[(X0 + 2, Y0 + 1)]
    got = np.frombuffer(east["dist"], dtype="<f8").reshape(px, px)
    assert np.isfinite(got).all()


def test_hole_blocks_travel(spark):
    px = 8
    g = np.ones((px, px), dtype=np.uint8)
    # west and east tiles, no bridge tile between them
    tiles = {(0, 0): g, (2, 0): g}
    out = _check(spark, tiles, px, [(1, 1)])  # source in the west tile
    west = out[(X0, Y0)]
    east = out[(X0 + 2, Y0)]
    assert west["reached_px"] == px * px
    assert east["reached_px"] == 0  # unreachable across the hole
    assert east["min_dist"] is None


def test_zero_cost_cells(spark):
    px = 8
    g = np.zeros((px, px), dtype=np.uint8)
    g[:, 4] = 9
    tiles = {(0, 0): g, (1, 0): g}
    out = _check(spark, tiles, px, [(0, 0)])
    got = np.frombuffer(out[(X0, Y0)]["dist"], dtype="<f8").reshape(px, px)
    assert got[0, 0] == 0.0
    assert (got[:, :4][np.isfinite(got[:, :4])] == 0.0).all()  # free region


def test_off_coverage_sources_ignored_and_validation(spark):
    px = 8
    g = np.ones((px, px), dtype=np.uint8)
    df = _table(spark, {(0, 0): g}, px)
    far = _sources_df(spark, [(0, 0)])  # world origin, not on our tile
    out = cost_distance(df, far, zoom=Z, tile_px=px).collect()
    assert out[0]["reached_px"] == 0
    with pytest.raises(ValueError, match="max_rounds"):
        cost_distance(df, far, zoom=Z, tile_px=px, max_rounds=0)
    with pytest.raises(ValueError, match="on_nonconverged"):
        cost_distance(df, far, zoom=Z, tile_px=px, on_nonconverged="x")


def test_nonconverged_partial_is_upper_bound(spark):
    px, n = 8, 4
    g = np.ones((px, px), dtype=np.uint8)
    tiles = {(dx, 0): g for dx in range(n)}
    df = _table(spark, tiles, px)
    srcs = _sources_df(spark, [((X0) * px, (Y0) * px)])  # NW corner of first tile
    with pytest.raises(RuntimeError, match="did not converge"):
        cost_distance(df, srcs, zoom=Z, tile_px=px, max_rounds=1).collect()
    part = {
        r["x"]: r
        for r in cost_distance(
            df, srcs, zoom=Z, tile_px=px, max_rounds=1, on_nonconverged="return"
        ).collect()
    }
    want, _, _ = _oracle(tiles, px, [(0, 0)])
    full = {
        r["x"]: r
        for r in cost_distance(df, srcs, zoom=Z, tile_px=px).collect()
    }
    for dx in range(n):
        p = np.frombuffer(part[X0 + dx]["dist"], dtype="<f8")
        f = np.frombuffer(full[X0 + dx]["dist"], dtype="<f8")
        assert (p >= f).all()  # partial never undercuts the true dist
        np.testing.assert_array_equal(f, want[:, dx * px:(dx + 1) * px].ravel())


def test_decode_error_surfaces(spark):
    px = 8
    g = np.ones((px, px), dtype=np.uint8)
    df = _table(spark, {(0, 0): g, (1, 0): g}, px)
    df = df.withColumn(
        "bytes",
        F.when(F.col("x") == X0 + 1, F.lit(b"bad")).otherwise(F.col("bytes")),
    )
    srcs = _sources_df(spark, [(X0 * px + 1, Y0 * px + 1)])
    out = {r["x"]: r for r in cost_distance(df, srcs, zoom=Z, tile_px=px).collect()}
    assert out[X0]["status"] == "ok"
    assert out[X0 + 1]["status"] == "decode_error"


def test_allocation_voronoi_uniform_friction(spark):
    """Uniform friction, two sources -> allocation is the octile-metric
    Voronoi split, ties to the smaller sid (explicit sid column)."""
    px, n = 16, 2
    tiles = {(dx, 0): np.full((px, px), 4, dtype=np.uint8) for dx in range(n)}
    df = _table(spark, tiles, px)
    gx0, gy0 = X0 * px, Y0 * px
    srcs = spark.createDataFrame(
        [(gx0 + 2, gy0 + 8, 7), (gx0 + 29, gy0 + 8, 3)], "gx long, gy long, sid long"
    )
    out = {r["x"]: r for r in cost_distance(df, srcs, zoom=Z, tile_px=px).collect()}
    want_d, want_l, _ = _oracle(tiles, px, [(2, 8), (29, 8)], sids=[7, 3])
    for dx in range(n):
        r = out[X0 + dx]
        got_l = np.frombuffer(r["alloc"], dtype="<i8").reshape(px, px)
        np.testing.assert_array_equal(got_l, want_l[:, dx * px:(dx + 1) * px])
    # both sources own territory; the west source owns its own cell
    west = np.frombuffer(out[X0]["alloc"], dtype="<i8").reshape(px, px)
    east = np.frombuffer(out[X0 + 1]["alloc"], dtype="<i8").reshape(px, px)
    assert west[8, 2] == 7 and east[8, 13] == 3
    assert {7, 3} <= set(west.ravel()) | set(east.ravel())


def test_allocation_tie_breaks_to_smaller_sid(spark):
    px = 9
    tiles = {(0, 0): np.full((px, px), 10, dtype=np.uint8)}
    df = _table(spark, tiles, px)
    gx0, gy0 = X0 * px, Y0 * px
    # symmetric sources around the center column -> center ties
    srcs = spark.createDataFrame(
        [(gx0 + 1, gy0 + 4, 99), (gx0 + 7, gy0 + 4, 5)], "gx long, gy long, sid long"
    )
    out = cost_distance(df, srcs, zoom=Z, tile_px=px).collect()[0]
    lab = np.frombuffer(out["alloc"], dtype="<i8").reshape(px, px)
    dist = np.frombuffer(out["dist"], dtype="<f8").reshape(px, px)
    mid = px // 2
    # the middle column is equidistant -> smaller sid (5) wins there
    assert (np.isclose(dist[:, mid - 1], dist[:, mid + 1])).all()
    assert (lab[:, mid] == 5).all()
