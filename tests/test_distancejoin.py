"""within_distance_join vs a DuckDB brute-force haversine oracle —
exactness of the blocked join (including antimeridian wrap and
high-latitude disk inflation), plus the self-pair variant."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.distancejoin import (
    auto_block_zoom,
    within_distance_join,
    within_distance_pairs,
)

_HAV = (
    "2 * 6371008.8 * asin(sqrt("
    "sin(radians(({lat2} - {lat1}) / 2)) ^ 2 + "
    "cos(radians({lat1})) * cos(radians({lat2})) * "
    "sin(radians(({lon2} - {lon1}) / 2)) ^ 2))"
)


def _oracle_pairs(left, right, d):
    con = duckdb.connect()
    con.execute("CREATE TABLE l(id INT, lon DOUBLE, lat DOUBLE)")
    con.execute("CREATE TABLE r(id INT, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", left)
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", right)
    hav = _HAV.format(lon1="l.lon", lat1="l.lat", lon2="r.lon", lat2="r.lat")
    return sorted(
        tuple(row)
        for row in con.execute(
            f"SELECT l.id, r.id FROM l, r WHERE {hav} <= {d}"
        ).fetchall()
    )


def _pts(seed, n, lon0, lat0, spread):
    out = []
    s = seed
    for i in range(n):
        s = (s * 1103515245 + 12345) % (1 << 31)
        u = s / float(1 << 31)
        s = (s * 1103515245 + 12345) % (1 << 31)
        v = s / float(1 << 31)
        out.append((i, lon0 + (u - 0.5) * spread, lat0 + (v - 0.5) * spread))
    return out


@pytest.mark.parametrize(
    "lon0,lat0,d",
    [(11.5, 48.1, 2000.0), (0.0, 0.0, 5000.0), (20.0, 78.0, 3000.0)],
)
def test_matches_bruteforce_oracle(spark, lon0, lat0, d):
    left = _pts(7, 60, lon0, lat0, 0.12)
    right = _pts(91, 80, lon0, lat0, 0.12)
    L = spark.createDataFrame(left, "id int, lon double, lat double")
    R = spark.createDataFrame(right, "id int, lon double, lat double")
    got = set(
        (r.id_l, r.id_r)
        for r in within_distance_join(L, R, d).select("id_l", "id_r").collect()
    )
    # last-ulp tolerance at the distance boundary (the two engines group
    # the haversine arithmetic differently): sandwich between d(1 -+ eps)
    inner = set(_oracle_pairs(left, right, d * (1 - 1e-9)))
    outer = set(_oracle_pairs(left, right, d * (1 + 1e-9)))
    assert inner <= got <= outer
    assert len(got) > 0


def test_antimeridian_wrap(spark):
    left = [(0, 179.999, -10.0), (1, 179.99, 30.0)]
    right = [(0, -179.999, -10.0), (1, -179.999, 30.0), (2, 178.0, -10.0)]
    L = spark.createDataFrame(left, "id int, lon double, lat double")
    R = spark.createDataFrame(right, "id int, lon double, lat double")
    got = sorted(
        (r.id_l, r.id_r)
        for r in within_distance_join(L, R, 2000.0).select("id_l", "id_r").collect()
    )
    # id 0 pairs across the dateline (~440 m apart); id 1 is ~1.9 km
    # west of -179.999 at lat 30 -> also within 2 km
    assert (0, 0) in got
    hav_pairs = _oracle_pairs(left, right, 2000.0)
    # DuckDB brute force uses the raw Δλ — wrap-safe via sin², same set
    assert got == hav_pairs


def test_dist_column_exact(spark):
    L = spark.createDataFrame([(0, 11.5, 48.1)], "id int, lon double, lat double")
    R = spark.createDataFrame([(0, 11.51, 48.1)], "id int, lon double, lat double")
    row = within_distance_join(L, R, 2000.0).collect()[0]
    import math

    want = (
        2 * 6371008.8
        * math.asin(
            math.sqrt(
                math.cos(math.radians(48.1)) ** 2
                * math.sin(math.radians(0.005)) ** 2
            )
        )
    )
    assert abs(row.dist_m - want) < 1e-6


def test_self_pairs_once(spark):
    pts = _pts(3, 50, 2.0, 41.0, 0.05)
    df = spark.createDataFrame(pts, "id int, lon double, lat double")
    got = sorted(
        (r.id_a, r.id_b)
        for r in within_distance_pairs(df, 1500.0).select("id_a", "id_b").collect()
    )
    inner = {(a, b) for a, b in _oracle_pairs(pts, pts, 1500.0 * (1 - 1e-9)) if a < b}
    outer = {(a, b) for a, b in _oracle_pairs(pts, pts, 1500.0 * (1 + 1e-9)) if a < b}
    assert inner <= set(got) <= outer
    assert len(got) == len(set(got))  # emitted exactly once


def test_auto_zoom_and_validation(spark):
    assert auto_block_zoom(1000.0) in range(14, 17)
    assert auto_block_zoom(1e9) == 0
    with pytest.raises(ValueError):
        auto_block_zoom(0)
    df = spark.createDataFrame([(0, 0.0, 0.0)], "id int, lon double, lat double")
    with pytest.raises(ValueError):
        within_distance_join(df, df, -5.0)
    with pytest.raises(ValueError):
        within_distance_join(df, df, 10.0, suffixes=("_x", "_x"))
