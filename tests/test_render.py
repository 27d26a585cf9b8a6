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
    interpolate_idw_tiles,
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


def _idw_oracle(samples, zoom, vmin, vmax, radius, power, tiles, tp):
    """Direct per-tile IDW field + quantization (independent loop)."""
    out = {}
    for tx, ty in tiles:
        field = np.full((tp, tp), np.nan)
        for r in range(tp):
            for c in range(tp):
                cx, cy = tx * tp + c + 0.5, ty * tp + r + 0.5
                num = den = 0.0
                exact = []
                for lon, lat, v in samples:
                    wx = (lon / 360.0 + 0.5) * (1 << zoom) * tp
                    s = math.sin(math.radians(lat))
                    wy = (0.5 - 0.25 * math.log((1 + s) / (1 - s)) / math.pi) * (1 << zoom) * tp
                    d2 = (wx - cx) ** 2 + (wy - cy) ** 2
                    if d2 > radius * radius:
                        continue
                    if d2 == 0.0:
                        exact.append(v)
                    else:
                        w = d2 ** (-power / 2.0)
                        num += w * v
                        den += w
                if exact:
                    field[r, c] = sum(exact) / len(exact)
                elif den > 0:
                    field[r, c] = num / den
        idx = np.zeros((tp, tp), dtype=np.uint8)
        ok = ~np.isnan(field)
        idx[ok] = np.clip(np.round((field[ok] - vmin) / (vmax - vmin) * 255), 0, 255).astype(np.uint8)
        out[(tx, ty)] = idx
    return out


def test_idw_matches_oracle(spark):
    zoom = 3
    rng = np.random.default_rng(6)
    samples = [
        (float(rng.uniform(0.0, 30.0)), float(rng.uniform(20.0, 45.0)), float(rng.uniform(0, 100)))
        for _ in range(6)
    ]
    df = spark.createDataFrame(samples, "lon double, lat double, val double")
    rows = interpolate_idw_tiles(
        df, zoom=zoom, value_col="val", vmin=0.0, vmax=100.0, radius_px=12.0,
        tile_px=32,
    ).collect()
    got = {}
    for r in rows:
        tx, ty = (int(v) for v in r.image_id.split("_")[1:3])
        got[(tx, ty)] = decode_png(bytes(r.bytes))[:, :, 0]
    want = _idw_oracle(samples, zoom, 0.0, 100.0, 12.0, 2.0, got.keys(), 32)
    # only compare tiles the oracle says have coverage; distributed
    # must produce exactly the touched-tile set
    covered = {t for t, a in want.items() if a.any()}
    assert covered <= set(got)
    for t in got:
        assert np.array_equal(got[t], want[t]), t


def test_idw_exact_sample_pins_pixel(spark):
    zoom = 3
    # a sample exactly on a pixel center: world px (100.5, 80.5)
    n_px = (1 << zoom) * 256
    lon = (100.5 / n_px - 0.5) * 360.0
    lat = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * 80.5 / n_px))))
    df = spark.createDataFrame([(lon, lat, 50.0)], "lon double, lat double, val double")
    rows = interpolate_idw_tiles(
        df, zoom=zoom, value_col="val", vmin=0.0, vmax=100.0, radius_px=10.0
    ).collect()
    img = {tuple(int(v) for v in r.image_id.split("_")[1:3]): decode_png(bytes(r.bytes))
           for r in rows}[(0, 0)]
    assert img[80, 100, 0] == 128  # round(50/100*255)
    assert img[0, 0, 0] == 0  # out of radius -> nodata


def test_idw_deterministic_across_partitionings(spark):
    zoom = 4
    rng = np.random.default_rng(8)
    samples = [
        (float(rng.uniform(0, 40)), float(rng.uniform(10, 50)), float(rng.uniform(0, 9)))
        for _ in range(60)
    ]
    df = spark.createDataFrame(samples, "lon double, lat double, val double")

    def digest(d):
        return {r.image_id: hashlib.md5(bytes(r.bytes)).hexdigest()
                for r in interpolate_idw_tiles(
                    d, zoom=zoom, value_col="val", vmin=0.0, vmax=9.0,
                    radius_px=100.0).collect()}
    assert digest(df) == digest(df.repartition(11))


def test_idw_validation(spark):
    df = spark.createDataFrame([(0.0, 0.0, 1.0)], "lon double, lat double, val double")
    with pytest.raises(ValueError):
        interpolate_idw_tiles(df, zoom=3, value_col="val", vmin=1.0, vmax=1.0)
    with pytest.raises(ValueError):
        interpolate_idw_tiles(df, zoom=3, value_col="val", vmin=0.0, vmax=1.0, radius_px=0)


def test_validation(spark):
    df = _pts_df(spark, [(0.0, 0.0)])
    with pytest.raises(ValueError):
        bin_points(df, zoom=30)
    with pytest.raises(ValueError):
        bin_points(df, zoom=5, tile_px=300)
    with pytest.raises(ValueError):
        render_density_tiles(df, zoom=5, vmax=0.0)
