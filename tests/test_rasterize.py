"""rasterize_geometries vs an independent per-pixel even-odd oracle,
plus the raster<->vector roundtrip against polygonize."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.kernels import png as pngk
from tilegrab_spark.operators.dedup import release_signature_caches
from tilegrab_spark.operators.polygonize import polygonize
from tilegrab_spark.operators.rasterize import rasterize_geometries
from tilegrab_spark.sources.geometries import GeometrySet

Z, PX = 5, 32


def _pixel_center(z, gx, gy, tp):
    n = float(1 << z)
    lon = ((gx + 0.5) / (n * tp)) * 360.0 - 180.0
    py = (gy + 0.5) / (n * tp)
    import math

    lat = math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * py))))
    return lon, lat


def _pip(lon, lat, rings):
    """Independent scalar even-odd ray cast."""
    inside = False
    for ring in rings:
        r = np.asarray(ring, float)
        if not (r[0] == r[-1]).all():
            r = np.vstack([r, r[:1]])
        xs, ys = r[:, 0], r[:, 1]
        for i in range(len(xs) - 1):
            x1, y1, x2, y2 = xs[i], ys[i], xs[i + 1], ys[i + 1]
            if (y1 > lat) != (y2 > lat):
                xint = x1 + (lat - y1) * (x2 - x1) / (y2 - y1)
                if lon < xint:
                    inside = not inside
    return inside


def _tri():
    # a triangle spanning a few z=5 tiles near (20E, 15N)
    return GeometrySet(
        geom_id="tri",
        polygons=[[np.array([[14.0, 8.0], [30.0, 10.0], [20.0, 24.0], [14.0, 8.0]])]],
    )


def _box(lon0, lat0, lon1, lat1, gid, hole=None):
    rings = [np.array([[lon0, lat0], [lon1, lat0], [lon1, lat1], [lon0, lat1], [lon0, lat0]])]
    if hole:
        h0, j0, h1, j1 = hole
        rings.append(np.array([[h0, j0], [h1, j0], [h1, j1], [h0, j1], [h0, j0]]))
    return GeometrySet(geom_id=gid, polygons=[rings])


def test_rasterize_matches_scalar_pip_oracle(spark):
    g = _tri()
    out = rasterize_geometries(spark, g, zoom=Z, tile_px=PX).collect()
    assert out
    rng = np.random.default_rng(0)
    for r in out:
        arr = pngk.decode_png(bytes(r["bytes"]))
        lab = arr.max(axis=2)
        assert r["n_burned"] == int((lab > 0).sum()) > 0
        # spot-check 25 random pixels per tile against the scalar oracle
        for _ in range(25):
            px_, py_ = int(rng.integers(PX)), int(rng.integers(PX))
            gx = r["x"] * PX + px_
            gy = r["y"] * PX + py_
            lon, lat = _pixel_center(Z, gx, gy, PX)
            want = _pip(lon, lat, g.polygons[0])
            assert bool(lab[py_, px_] == 1) == want, (r["x"], r["y"], px_, py_)


def test_overlap_higher_label_wins_and_hole_unburned(spark):
    a = _box(0.0, 0.0, 20.0, 20.0, "a", hole=(6.0, 6.0, 12.0, 12.0))
    b = _box(10.0, 5.0, 30.0, 15.0, "b")
    out = rasterize_geometries(spark, [a, b], zoom=Z, tile_px=PX).collect()
    seen = set()
    for r in out:
        lab = pngk.decode_png(bytes(r["bytes"])).max(axis=2)
        seen |= set(np.unique(lab).tolist())
        for py_ in range(0, PX, 5):
            for px_ in range(0, PX, 5):
                lon, lat = _pixel_center(Z, r["x"] * PX + px_, r["y"] * PX + py_, PX)
                in_a = _pip(lon, lat, a.polygons[0])
                in_b = _pip(lon, lat, b.polygons[0])
                want = 2 if in_b else (1 if in_a else 0)
                assert lab[py_, px_] == want
    assert {1, 2} <= seen


def test_roundtrip_with_polygonize(spark):
    g = _tri()
    tiles = rasterize_geometries(spark, g, zoom=Z, tile_px=PX)
    burned = tiles.agg(F.sum("n_burned")).first()[0]
    rings = polygonize(tiles, zoom=Z).filter(F.col("label") == 1)
    regions = (
        rings.filter(F.col("ring_idx") == 0)
        .agg(F.sum("region_px").alias("s"), F.count("*").alias("n"))
        .first()
    )
    release_signature_caches()
    assert regions["s"] == burned  # every burned pixel vectorizes back
    assert regions["n"] == 1  # one connected triangle


def test_validation(spark):
    with pytest.raises(ValueError, match="geoms"):
        rasterize_geometries(spark, [], zoom=Z)
    with pytest.raises(ValueError, match="label"):
        rasterize_geometries(spark, _tri(), zoom=Z, labels={"tri": 0})
    with pytest.raises(ValueError, match="fmt"):
        rasterize_geometries(spark, _tri(), zoom=Z, fmt="bmp")


# ------------------------------------------------------------ line burning

from tilegrab_spark.operators.rasterize import rasterize_lines


def _gpx(lon, z, tp):
    return (lon / 360.0 + 0.5) * (1 << z) * tp


def _gpy(lat, z, tp):
    import math

    merc = math.log(math.tan(math.pi / 4 + math.radians(lat) / 2))
    return (0.5 - merc / (2 * math.pi)) * (1 << z) * tp


def test_rasterize_lines_matches_distance_oracle(spark):
    coords = [[-10.0, -5.0], [15.0, 12.0], [28.0, 8.0]]
    lines = spark.createDataFrame(
        [("road", coords)], "line_id string, coords array<array<double>>"
    )
    width = 3.0
    out = rasterize_lines(lines, zoom=Z, width_px=width, tile_px=PX).collect()
    assert out
    pts = [(_gpx(lo, Z, PX), _gpy(la, Z, PX)) for lo, la in coords]

    def d2_to_line(gx, gy):
        best = float("inf")
        for (ax, ay), (bx, by) in zip(pts[:-1], pts[1:]):
            dx, dy = bx - ax, by - ay
            L2 = dx * dx + dy * dy
            t = max(0.0, min(1.0, ((gx - ax) * dx + (gy - ay) * dy) / L2))
            best = min(best, (gx - ax - t * dx) ** 2 + (gy - ay - t * dy) ** 2)
        return best

    rng = np.random.default_rng(1)
    total = 0
    for r in out:
        lab = pngk.decode_png(bytes(r["bytes"])).max(axis=2)
        total += r["n_burned"]
        assert r["n_burned"] == int((lab > 0).sum()) > 0
        for _ in range(30):
            px_, py_ = int(rng.integers(PX)), int(rng.integers(PX))
            gx = r["x"] * PX + px_ + 0.5
            gy = r["y"] * PX + py_ + 0.5
            want = d2_to_line(gx, gy) <= (width / 2) ** 2
            assert bool(lab[py_, px_] == 1) == want
    assert total > 0


def test_rasterize_lines_validation(spark):
    lines = spark.createDataFrame(
        [("a", [[0.0, 0.0], [1.0, 1.0]])], "line_id string, coords array<array<double>>"
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="width_px"):
        rasterize_lines(lines, zoom=Z, width_px=0)
    with _pt.raises(ValueError, match="label"):
        rasterize_lines(lines, zoom=Z, label=300)
    with _pt.raises(Exception, match="tiles"):
        rasterize_lines(lines, zoom=Z, max_tiles_per_segment=1).collect()
