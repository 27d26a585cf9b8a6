"""Zonal statistics (operators/zonal.py) — brute-force numpy oracle,
interior/boundary planning, tile-granular mode, multi-zone."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.kernels.png import synth_tile_pixels
from tilegrab_spark.operators.image_join import join_images
from tilegrab_spark.operators.tiles import enumerate_tiles, tiles_for
from tilegrab_spark.operators.zonal import classify_tiles, zonal_stats
from tilegrab_spark.sources.geometries import GeometrySet
from tilegrab_spark.sources.images import read_image_table


def _pip_independent(lon, lat, rings):
    """Textbook even-odd ray cast, written independently of kernels.geo —
    the brute-force oracle's own PIP.  lon/lat: (N,), rings closed."""
    inside = np.zeros(lon.shape, dtype=bool)
    for ring in rings:
        x1, y1 = ring[:-1, 0], ring[:-1, 1]
        x2, y2 = ring[1:, 0], ring[1:, 1]
        for i in range(len(x1)):
            cond = (y1[i] > lat) != (y2[i] > lat)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = x1[i] + (lat - y1[i]) * (x2[i] - x1[i]) / (y2[i] - y1[i])
            inside ^= cond & (lon < xint)
    return inside


def _brute_stats(geom, zoom, tile_xy):
    """Decode-free oracle: synth pixels + independent center-in-polygon
    mask, accumulated tile by tile in plain numpy."""
    rings = []
    for poly in geom.polygons:
        for r in poly:
            r = np.asarray(r, np.float64)
            if not (r[0] == r[-1]).all():
                r = np.vstack([r, r[:1]])
            rings.append(r)
    n = float(1 << zoom)
    tot = {b: [0, 0, 256, -1] for b in range(3)}  # n, s, mn, mx
    for x, y in tile_xy:
        px = synth_tile_pixels(x, y, zoom, 0)
        lon = ((x + (np.arange(256) + 0.5) / 256.0) / n) * 360.0 - 180.0
        py = (y + (np.arange(256) + 0.5) / 256.0) / n
        lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * py))))
        lo = np.repeat(lon[None, :], 256, axis=0).ravel()
        la = np.repeat(lat[:, None], 256, axis=1).ravel()
        m = _pip_independent(lo, la, rings).reshape(256, 256)
        if not m.any():
            continue
        sel = px[m]
        for b in range(3):
            tot[b][0] += sel.shape[0]
            tot[b][1] += int(sel[:, b].sum(dtype=np.int64))
            tot[b][2] = min(tot[b][2], int(sel[:, b].min()))
            tot[b][3] = max(tot[b][3], int(sel[:, b].max()))
    return tot


@pytest.fixture(scope="module")
def t_joined(spark, t_geom, tmp_path_factory):
    """Full T z=16 bbox (16 tiles), exactly one image per tile."""
    from tilegrab_spark.sources.images import write_synthetic_image_table

    tiles = enumerate_tiles(spark, t_geom, 16)
    path = str(tmp_path_factory.mktemp("zonal") / "images")
    cells = [(16, r.x, r.y, 0) for r in tiles.select("x", "y").collect()]
    write_synthetic_image_table(spark, path, cells, n_buckets=4)
    images = read_image_table(spark, path)
    return join_images(tiles, images.drop("cell_id"))


def test_zonal_exact_vs_brute_force(spark, t_geom, t_joined):
    out = {
        (r.geom_id, r.band): r
        for r in zonal_stats(t_joined, t_geom, exact=True).collect()
    }
    xy = [(r.x, r.y) for r in t_joined.select("x", "y").distinct().collect()]
    ref = _brute_stats(t_geom, 16, xy)
    assert len(out) == 3
    for b in range(3):
        r = out[("T", b)]
        n, s, mn, mx = ref[b]
        assert (r.n_px, r.sum_v, r.min_v, r.max_v) == (n, s, mn, mx), b
        assert r.mean_v == s / n
    # masked count is a strict subset of the joined tiles' pixels
    n_tiles = len(xy)
    assert 0 < out[("T", 0)].n_px < n_tiles * 65536


def test_zonal_tile_granular_upper_bound(spark, t_geom, t_joined):
    exact = {r.band: r for r in zonal_stats(t_joined, t_geom, exact=True).collect()}
    loose = {r.band: r for r in zonal_stats(t_joined, t_geom, exact=False).collect()}
    classed = classify_tiles(t_joined, t_geom).filter("zone_class > 0")
    n_tiles = classed.count()
    for b in range(3):
        assert loose[b].n_px == n_tiles * 65536
        assert loose[b].n_px > exact[b].n_px
        assert loose[b].sum_v >= exact[b].sum_v


def test_classify_plan_matches_refine(spark, t_geom, t_joined):
    """class>0 ≡ the F2 semi-join's intersect set (same box/ring kernels,
    different composition); interior tiles exist and pay no mask."""
    classed = classify_tiles(t_joined, t_geom)
    sel = {
        (r.x, r.y): r.zone_class for r in classed.select("x", "y", "zone_class").collect()
    }
    golden = {
        (r.x, r.y)
        for r in tiles_for(spark, t_geom, 16, by="shape", safe_limit=None).collect()
    }
    assert {xy for xy, c in sel.items() if c > 0} == golden


def test_interior_tiles_skip_the_mask(spark, t_geom, tmp_path_factory):
    """At z18 the T shape has fully-interior tiles; they contribute every
    pixel (the decode-only fast path) — parity with the brute force."""
    from tilegrab_spark.sources.images import write_synthetic_image_table

    classed = classify_tiles(enumerate_tiles(spark, t_geom, 18), t_geom)
    interior = classed.filter("zone_class = 2")
    n_int = interior.count()
    assert n_int > 0
    path = str(tmp_path_factory.mktemp("zonal18") / "images")
    cells = [(18, r.x, r.y, 0) for r in interior.select("x", "y").collect()]
    write_synthetic_image_table(spark, path, cells, n_buckets=4)
    joined = join_images(interior, read_image_table(spark, path).drop("cell_id"))
    st = {r.band: r for r in zonal_stats(joined, t_geom, exact=True).collect()}
    assert st[0].n_px == n_int * 65536
    ref = _brute_stats(t_geom, 18, [(r.x, r.y) for r in interior.select("x", "y").collect()])
    for b in range(3):
        assert (st[b].n_px, st[b].sum_v, st[b].min_v, st[b].max_v) == tuple(ref[b])


def test_zonal_multi_zone(spark, t_geom, t_joined):
    """Two zones in one pass: T and a small box inside T's bbox."""
    box = GeometrySet(
        geom_id="BOX",
        polygons=[[np.array([
            [80.594, 7.256], [80.601, 7.256],
            [80.601, 7.263], [80.594, 7.263],
        ])]],
    )
    both = t_joined.drop("geom_id").crossJoin(
        spark.createDataFrame([("T",), ("BOX",)], "geom_id string")
    )
    out = zonal_stats(both, [t_geom, box], exact=True).collect()
    by_zone = {}
    for r in out:
        by_zone.setdefault(r.geom_id, {})[r.band] = r
    assert set(by_zone) == {"T", "BOX"}
    xy = [(r.x, r.y) for r in t_joined.select("x", "y").distinct().collect()]
    ref_box = _brute_stats(box, 16, xy)
    for b in range(3):
        assert by_zone["BOX"][b].n_px == ref_box[b][0]
        assert by_zone["BOX"][b].sum_v == ref_box[b][1]
