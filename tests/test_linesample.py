"""sample_raster_along vs a python oracle replicating the station and
pixel formulas, over tiles whose pixel value is a known function of the
global pixel index."""

import math

import numpy as np
import pytest

from tilegrab_spark.kernels import png as pngk
from tilegrab_spark.kernels.geo import WGS84_RADIUS
from tilegrab_spark.operators.linesample import sample_raster_along

Z, PX = 3, 32  # big pixels: stations land far from pixel boundaries


def _val(gx, gy):
    return int((3 * gx + 5 * gy) % 251)


def _table(spark, tile_range):
    rows = []
    for tx, ty in tile_range:
        gy, gx = np.mgrid[ty * PX:(ty + 1) * PX, tx * PX:(tx + 1) * PX]
        g = ((3 * gx + 5 * gy) % 251).astype(np.uint8)
        arr = np.stack([g, g, g], axis=2)
        rows.append((f"{Z}_{tx}_{ty}", pngk.encode_png(arr), PX, PX, "png", Z, tx, ty))
    return spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, z int, x long, y long",
    )


def _merc(lon, lat):
    return (
        WGS84_RADIUS * math.radians(lon),
        WGS84_RADIUS * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2)),
    )


def _oracle(coords, spacing):
    """Stations along one line, mirroring the operator's formulas."""
    n_px = (1 << Z) * PX
    circ = 2 * math.pi * WGS84_RADIUS
    pts = [_merc(lo, la) for lo, la in coords]
    out = []
    base = 0.0
    for si in range(len(pts) - 1):
        (ax, ay), (bx, by) = pts[si], pts[si + 1]
        ln = math.hypot(bx - ax, by - ay)
        if ln == 0:
            continue
        kmin = 0 if si == 0 else math.floor(base / spacing) + 1
        kmax = math.floor((base + ln) / spacing)
        for k in range(int(kmin), int(kmax) + 1):
            m = k * spacing
            t = (m - base) / ln
            x = ax + t * (bx - ax)
            y = ay + t * (by - ay)
            gx = min(n_px - 1, max(0, math.floor((x / circ + 0.5) * n_px)))
            gy = min(n_px - 1, max(0, math.floor((0.5 - y / circ) * n_px)))
            out.append((k, m, int(gx), int(gy)))
        base += ln
    return out


def test_profile_matches_oracle_across_tiles(spark):
    # diagonal transect crossing several z=3 tiles around the equator
    coords = [[-40.0, -12.0], [10.0, 9.0], [55.0, 30.0]]
    lines = spark.createDataFrame(
        [("t1", coords)], "line_id string, coords array<array<double>>"
    )
    tiles = [(tx, ty) for tx in range(8) for ty in range(8)]
    df = _table(spark, tiles)
    spacing = 500_000.0
    got = {
        r["station"]: r
        for r in sample_raster_along(
            lines, df, zoom=Z, spacing_m=spacing, tile_px=PX
        ).collect()
    }
    want = _oracle(coords, spacing)
    assert len(got) == len(want)
    for (k, m, gx, gy) in want:
        r = got[k]
        assert r["status"] == "ok"
        assert (r["gx"], r["gy"]) == (gx, gy)
        assert r["measure_m"] == m
        assert r["value"] == _val(gx, gy)
    # monotone measures, station 0 at the start
    assert got[0]["measure_m"] == 0.0


def test_missing_tiles_surface_no_tile(spark):
    coords = [[-40.0, -12.0], [55.0, 30.0]]
    lines = spark.createDataFrame(
        [("t1", coords)], "line_id string, coords array<array<double>>"
    )
    df = _table(spark, [(3, 3)])  # only one tile present
    rows = sample_raster_along(lines, df, zoom=Z, spacing_m=800_000.0, tile_px=PX).collect()
    statuses = {r["status"] for r in rows}
    assert "no_tile" in statuses
    for r in rows:
        if r["status"] == "ok":
            assert r["value"] == _val(r["gx"], r["gy"])
        else:
            assert r["value"] is None


def test_multiple_lines_and_validation(spark):
    lines = spark.createDataFrame(
        [("a", [[0.0, 0.0], [20.0, 0.0]]), ("b", [[0.0, 10.0], [0.0, 30.0]])],
        "line_id string, coords array<array<double>>",
    )
    df = _table(spark, [(tx, ty) for tx in range(8) for ty in range(8)])
    rows = sample_raster_along(lines, df, zoom=Z, spacing_m=400_000.0, tile_px=PX).collect()
    by_line = {}
    for r in rows:
        by_line.setdefault(r["line_id"], []).append(r)
    assert set(by_line) == {"a", "b"}
    for rs in by_line.values():
        rs.sort(key=lambda r: r["station"])
        ms = [r["measure_m"] for r in rs]
        assert ms == sorted(ms) and rs[0]["station"] == 0
    with pytest.raises(ValueError, match="spacing_m"):
        sample_raster_along(lines, df, zoom=Z, spacing_m=0.0)
