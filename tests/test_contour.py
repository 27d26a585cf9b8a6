"""Contour extraction: distributed (halo-exchange) == one global pass."""

import math

import numpy as np
import pytest

from tilegrab_spark.kernels.contour import marching_squares
from tilegrab_spark.kernels.png import encode_png
from tilegrab_spark.operators.contour import (
    _dp_keep_mask,
    assemble_contours,
    contour_lonlat,
    extract_contours,
    link_contours,
    simplify_contours,
)
from tilegrab_spark.operators.dedup import release_signature_caches

TS = 8  # tile size for the fixtures
Z = 4


def _field_circle(n):
    r = np.hypot(*np.meshgrid(np.arange(n) - n / 2 + 0.5, np.arange(n) - n / 2 + 0.5))
    return np.clip(np.round(r * 16), 0, 255).astype(np.uint8)


def _field_noise(n, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, n), dtype=np.uint8).astype(np.uint8)


def _tiles_df(spark, V, tx0=0, ty0=0):
    n = V.shape[0]
    rows = []
    for ty in range(n // TS):
        for tx in range(n // TS):
            patch = V[ty * TS:(ty + 1) * TS, tx * TS:(tx + 1) * TS]
            rgb = np.repeat(patch[:, :, None], 3, axis=2)
            rows.append((Z, tx0 + tx, ty0 + ty, bytearray(encode_png(rgb)), TS, TS, "png"))
    return spark.createDataFrame(
        rows, "z int, x long, y long, bytes binary, w int, h int, fmt string"
    )


def _seg_set(rows):
    return {(r.level, r.x1, r.y1, r.x2, r.y2) for r in rows}


def _oracle_set(V, levels, oy=0.0, ox=0.0):
    out = set()
    for lv in levels:
        for x1, y1, x2, y2 in marching_squares(V.astype(float), lv, origin=(oy, ox)):
            if (x1, y1) != (x2, y2):
                out.add((lv, x1, y1, x2, y2))
    return out


@pytest.mark.parametrize("field,levels", [
    ("circle", [60.5]),
    ("circle", [40.5, 80.5, 120.5]),
    ("noise", [127.5]),
])
def test_distributed_equals_global_pass(spark, field, levels):
    V = _field_circle(2 * TS) if field == "circle" else _field_noise(2 * TS)
    got = _seg_set(extract_contours(_tiles_df(spark, V), levels=levels).collect())
    assert got == _oracle_set(V, levels)


def test_offset_tiles_use_global_coords(spark):
    V = _field_circle(2 * TS)
    got = _seg_set(extract_contours(_tiles_df(spark, V, tx0=3, ty0=5), levels=[60.5]).collect())
    assert got == _oracle_set(V, [60.5], oy=5 * TS, ox=3 * TS)


def test_missing_neighbor_stops_at_boundary(spark):
    # only the top-left tile present: cells needing the absent
    # neighbors are skipped == a global pass over just that tile
    V = _field_circle(2 * TS)
    df = _tiles_df(spark, V).filter("x = 0 and y = 0")
    got = _seg_set(extract_contours(df, levels=[60.5]).collect())
    assert got == _oracle_set(V[:TS, :TS], [60.5])


def test_link_closed_circle(spark):
    V = _field_circle(2 * TS)
    segs = extract_contours(_tiles_df(spark, V), levels=[60.5])
    try:
        lab = link_contours(segs).collect()
    finally:
        release_signature_caches()
    ids = {r.contour_id for r in lab}
    assert len(ids) == 1
    assert all(r.closed for r in lab)
    # the loop crosses all four tiles
    assert {(r.x, r.y) for r in lab} == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_assemble_circle_polyline(spark):
    V = _field_circle(2 * TS)
    segs = extract_contours(_tiles_df(spark, V), levels=[60.5])
    try:
        labeled = link_contours(segs)
        n_segs = labeled.count()
        rows = assemble_contours(labeled).collect()
    finally:
        release_signature_caches()
    assert len(rows) == 1
    r = rows[0]
    assert r.closed and r.level == 60.5
    assert r.n_vertices == n_segs + 1
    assert (r.xs[0], r.ys[0]) == (r.xs[-1], r.ys[-1])
    # every consecutive vertex pair is one of the extracted segments
    got = {(min((a, b)), max((a, b))) for a, b in
           (((r.xs[i], r.ys[i]), (r.xs[i + 1], r.ys[i + 1])) for i in range(len(r.xs) - 1))}
    want = {(min(((s.x1, s.y1), (s.x2, s.y2))), max(((s.x1, s.y1), (s.x2, s.y2))))
            for s in labeled.collect()}
    release_signature_caches()
    assert got == want
    assert r.length_px == pytest.approx(
        sum(math.hypot(r.xs[i + 1] - r.xs[i], r.ys[i + 1] - r.ys[i])
            for i in range(len(r.xs) - 1)))


def test_open_contour_not_closed(spark):
    # vertical gradient band: the iso-line is an open straight cut
    V = np.tile((np.arange(2 * TS) * 8).astype(np.uint8), (2 * TS, 1))
    segs = extract_contours(_tiles_df(spark, V), levels=[59.5])
    try:
        lab = link_contours(segs).collect()
    finally:
        release_signature_caches()
    assert len({r.contour_id for r in lab}) == 1
    assert not any(r.closed for r in lab)


def test_lonlat_conversion(spark):
    V = _field_circle(2 * TS)
    segs = contour_lonlat(
        extract_contours(_tiles_df(spark, V), levels=[60.5]), tile_px=TS
    ).collect()
    n_px = (1 << Z) * TS
    for r in segs[:10]:
        assert r.lon1 == pytest.approx((r.x1 / n_px - 0.5) * 360.0, abs=1e-9)
        want_lat = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * r.y1 / n_px))))
        assert r.lat1 == pytest.approx(want_lat, abs=1e-9)


def _dp_oracle(pts, tol):
    """Recursive Douglas-Peucker (independent formulation)."""
    if len(pts) <= 2:
        return list(pts)
    (x1, y1), (x2, y2) = pts[0], pts[-1]
    dx, dy = x2 - x1, y2 - y1
    L = math.hypot(dx, dy)
    best_d, best_i = -1.0, None
    for i in range(1, len(pts) - 1):
        px, py = pts[i]
        if L == 0:
            d = math.hypot(px - x1, py - y1)
        else:
            d = abs((px - x1) * dy - (py - y1) * dx) / L
        if d > best_d + 1e-15:
            best_d, best_i = d, i
    if best_d > tol:
        left = _dp_oracle(pts[: best_i + 1], tol)
        return left[:-1] + _dp_oracle(pts[best_i:], tol)
    return [pts[0], pts[-1]]


def test_simplify_matches_dp_oracle(spark):
    rng = np.random.default_rng(2)
    walks = []
    for _ in range(5):
        steps = rng.normal(0, 1.0, size=(40, 2)).cumsum(axis=0)
        walks.append([(float(x), float(y)) for x, y in steps])
    df = spark.createDataFrame(
        [(i, Z, 1.0, False, len(w), 0.0, [p[0] for p in w], [p[1] for p in w])
         for i, w in enumerate(walks)],
        "contour_id long, z int, level double, closed boolean, "
        "n_vertices int, length_px double, xs array<double>, ys array<double>",
    )
    got = {r.contour_id: list(zip(r.xs, r.ys)) for r in
           simplify_contours(df, tolerance_px=0.8).collect()}
    for i, w in enumerate(walks):
        assert got[i] == _dp_oracle(w, 0.8)


def test_simplify_straightens_the_gradient_cut(spark):
    V = np.tile((np.arange(2 * TS) * 8).astype(np.uint8), (2 * TS, 1))
    segs = extract_contours(_tiles_df(spark, V), levels=[59.5])
    try:
        asm = assemble_contours(link_contours(segs))
        simp = simplify_contours(asm, tolerance_px=0.01).collect()
    finally:
        release_signature_caches()
    # the iso-line of a pure x-gradient is a straight vertical cut:
    # DP collapses it to its two endpoints
    assert len(simp) == 1 and simp[0].n_vertices == 2
    assert simp[0].length_px == pytest.approx(2 * TS - 1)


def test_levels_validation(spark):
    V = _field_circle(TS)
    with pytest.raises(ValueError):
        extract_contours(_tiles_df(spark, V), levels=[])


def test_geojson_export(spark):
    import json

    from tilegrab_spark.operators.contour import contours_geojson

    V = _field_circle(2 * TS)
    segs = extract_contours(_tiles_df(spark, V), levels=[60.5])
    try:
        asm = assemble_contours(link_contours(segs))
        rows = contours_geojson(asm, tile_px=TS).collect()
    finally:
        release_signature_caches()
    assert len(rows) == 1
    gj = json.loads(rows[0].geojson)
    assert gj["type"] == "Feature"
    assert gj["geometry"]["type"] == "LineString"
    assert gj["properties"]["level"] == 60.5 and gj["properties"]["closed"] is True
    coords = gj["geometry"]["coordinates"]
    assert len(coords) == rows[0].n_vertices
    n_px = (1 << Z) * TS
    # first coordinate matches the scalar conversion of the first vertex
    lon0 = (rows[0].xs[0] / n_px - 0.5) * 360.0
    lat0 = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * rows[0].ys[0] / n_px))))
    assert coords[0][0] == pytest.approx(lon0, abs=1e-9)
    assert coords[0][1] == pytest.approx(lat0, abs=1e-9)
    # closed ring round-trips
    assert coords[0] == coords[-1]
