"""Density tile rendering vs numpy binning + decoded-pixel oracles."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.kernels.geo import lonlat_to_tile
from tilegrab_spark.kernels.png import decode_png
from tilegrab_spark.operators.render import (
    FIRE_RAMP,
    _ramp_lut,
    bin_points,
    render_density_tiles,
)

EPS = 1e-14


def _world_px(lon, lat, zoom, tile_px=256):
    n_px = (1 << zoom) * tile_px
    nx = lon / 360.0 + 0.5
    s = math.sin(math.radians(lat))
    ny = 0.5 - 0.25 * math.log((1 + s) / (1 - s)) / math.pi
    wx = min(n_px - 1, max(0, math.floor((nx + EPS) * n_px)))
    wy = min(n_px - 1, max(0, math.floor((ny + EPS) * n_px)))
    return wx, wy


def _pts_df(spark, pts, extra=None):
    rows = [(i, lon, lat) + ((extra[i],) if extra else ()) for i, (lon, lat) in enumerate(pts)]
    schema = "point_id long, lon double, lat double" + (", wgt double" if extra else "")
    return spark.createDataFrame(rows, schema)


def test_binning_matches_numpy_and_p1(spark):
    rng = np.random.default_rng(3)
    pts = [(float(rng.uniform(-179, 179)), float(rng.uniform(-80, 80))) for _ in range(300)]
    pts += [(0.0, 85.2), (179.9999, -85.2)]  # outside Mercator band -> clamped
    zoom = 10
    got = {
        (r.x, r.y, r.px, r.py): r.weight
        for r in bin_points(_pts_df(spark, pts), zoom=zoom).collect()
    }
    want = {}
    for lon, lat in pts:
        wx, wy = _world_px(lon, lat, zoom)
        k = (wx // 256, wy // 256, wx % 256, wy % 256)
        want[k] = want.get(k, 0.0) + 1.0
    assert got == want
    # tile part agrees with the P1 kernel encode for in-band points
    for lon, lat in pts[:50]:
        wx, wy = _world_px(lon, lat, zoom)
        tx, ty = lonlat_to_tile(np.array([lon]), np.array([lat]), zoom)
        assert (wx // 256, wy // 256) == (int(tx[0]), int(ty[0]))


def test_rendered_pixels_linear_scale(spark):
    zoom = 5
    # all points inside tile (16, 10) at z=5 — cluster pixel counts 1/2/4
    base_lon, base_lat = 5.0, 20.0
    pts = [(base_lon, base_lat)]
    pts += [(base_lon + 0.3, base_lat + 0.3)] * 2
    pts += [(base_lon + 0.6, base_lat - 0.4)] * 4
    df = _pts_df(spark, pts)
    rows = render_density_tiles(
        df, zoom=zoom, log_scale=False, vmax=4.0
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    wx, wy = _world_px(base_lon, base_lat, zoom)
    assert r.image_id == f"{zoom}_{wx // 256}_{wy // 256}_9"
    assert (r.w, r.h, r.fmt, r.zoom) == (256, 256, "png", zoom)
    rgb = decode_png(bytes(r.bytes))
    lut = _ramp_lut(FIRE_RAMP)
    counts = np.zeros((256, 256))
    for lon, lat in pts:
        px, py = _world_px(lon, lat, zoom)
        counts[py % 256, px % 256] += 1
    idx = np.clip(np.round(counts / 4.0 * 255.0), 0, 255).astype(np.uint8)
    assert np.array_equal(rgb, lut[idx])
    assert tuple(rgb[0, 0]) == (0, 0, 0)  # untouched pixel = ramp zero


def test_log_scale_per_tile_max(spark):
    zoom = 5
    pts = [(5.0, 20.0)] * 9 + [(5.3, 20.3)]
    rows = render_density_tiles(_pts_df(spark, pts), zoom=zoom).collect()
    rgb = decode_png(bytes(rows[0].bytes))
    lut = _ramp_lut(FIRE_RAMP)
    p9 = _world_px(5.0, 20.0, zoom)
    p1 = _world_px(5.3, 20.3, zoom)
    assert tuple(rgb[p9[1] % 256, p9[0] % 256]) == tuple(lut[255])
    want1 = int(np.clip(round(math.log1p(1) / math.log1p(9) * 255), 0, 255))
    assert tuple(rgb[p1[1] % 256, p1[0] % 256]) == tuple(lut[want1])


def test_weighted_binning(spark):
    pts = [(5.0, 20.0), (5.0, 20.0), (7.0, 22.0)]
    df = _pts_df(spark, pts, extra=[2.5, 1.5, 3.0])
    got = {(r.x, r.y, r.px, r.py): r.weight
           for r in bin_points(df, zoom=5, weight_col="wgt").collect()}
    assert sorted(got.values()) == [3.0, 4.0]


def test_deterministic_bytes_across_partitionings(spark):
    rng = np.random.default_rng(9)
    pts = [(float(rng.uniform(4, 12)), float(rng.uniform(18, 26))) for _ in range(400)]
    def digest(df):
        return {
            r.image_id: hashlib.md5(bytes(r.bytes)).hexdigest()
            for r in render_density_tiles(df, zoom=7).collect()
        }
    a = digest(_pts_df(spark, pts))
    b = digest(_pts_df(spark, pts).repartition(13))
    assert a == b and len(a) >= 4


def test_feeds_mosaic_unchanged(spark):
    from tilegrab_spark.operators.mosaic import mosaic

    zoom = 6
    # one point at each center of a 2x2 tile block, plus scattered fill
    tx = _world_px(10.0, 30.0, zoom)[0] // 256
    ty = _world_px(10.0, 30.0, zoom)[1] // 256
    n = 1 << zoom

    def center(X, Y):
        lon = (X + 0.5) / n * 360.0 - 180.0
        lat = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * (Y + 0.5) / n))))
        return lon, lat

    pts = [center(tx + i, ty + j) for i in (0, 1) for j in (0, 1)]
    rng = np.random.default_rng(4)
    for _ in range(200):
        lon = float(rng.uniform(8.0, 18.0))
        lat = float(rng.uniform(24.0, 33.0))
        wx, wy = _world_px(lon, lat, zoom)
        if wx // 256 in (tx, tx + 1) and wy // 256 in (ty, ty + 1):
            pts.append((lon, lat))
    tiles = render_density_tiles(_pts_df(spark, pts), zoom=zoom)
    joined = tiles.select(
        F.lit("density").alias("geom_id"),
        F.lit(zoom).alias("z"),
        F.regexp_extract("image_id", r"^(\d+)_(\d+)_(\d+)", 2).cast("long").alias("x"),
        F.regexp_extract("image_id", r"^(\d+)_(\d+)_(\d+)", 3).cast("long").alias("y"),
        "image_id", "bytes", "w", "h", "fmt",
    )
    m = mosaic(joined).collect()
    assert len(m) == 1
    assert (m[0].w, m[0].h) == (512, 512)
    assert m[0].n_tiles == 4


def test_validation(spark):
    df = _pts_df(spark, [(0.0, 0.0)])
    with pytest.raises(ValueError):
        bin_points(df, zoom=30)
    with pytest.raises(ValueError):
        bin_points(df, zoom=5, tile_px=300)
    with pytest.raises(ValueError):
        render_density_tiles(df, zoom=5, vmax=0.0)
