"""Mann-Kendall / Sen's slope vs a DuckDB pair-join oracle, and
emerging hot spots vs a compositional oracle (per-bucket public Gi*
fed back through mann_kendall)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.emerging import emerging_hotspots, mann_kendall
from tilegrab_spark.operators.spatialstats import getis_ord_gi

MK_ORACLE = """
WITH pairs AS (
  SELECT a.key AS key, SIGN(b.v - a.v) AS sgn,
         (b.v - a.v) / (b.t - a.t) AS slope
  FROM series a JOIN series b ON a.key = b.key AND b.t > a.t
),
agg AS (
  SELECT key, COALESCE(SUM(sgn), 0) AS s, MEDIAN(slope) AS sen
  FROM pairs GROUP BY key
),
ties AS (
  SELECT key, SUM(c * (c - 1) * (2 * c + 5)) AS tie
  FROM (SELECT key, v, COUNT(*) AS c FROM series GROUP BY key, v)
  GROUP BY key
),
base AS (SELECT key, COUNT(*) AS n FROM series GROUP BY key)
SELECT base.key, base.n, agg.s,
       (base.n * (base.n - 1) * (2 * base.n + 5) - ties.tie) / 18.0 AS var_s,
       agg.sen
FROM base JOIN agg USING (key) JOIN ties USING (key)
"""


def _mk_z(s, var_s, n):
    if var_s <= 0 or n < 2:
        return None
    if s > 0:
        return (s - 1) / np.sqrt(var_s)
    if s < 0:
        return (s + 1) / np.sqrt(var_s)
    return 0.0


def test_mann_kendall_vs_duckdb_oracle(spark):
    rng = np.random.default_rng(11)
    rows = []
    for key in range(8):
        n = int(rng.integers(3, 12))
        ts = rng.permutation(n).astype(float)
        # integer values force ties in v for the correction term
        vs = rng.integers(0, 5, n).astype(float)
        rows += [(key, float(t), float(v)) for t, v in zip(ts, vs)]
    df = spark.createDataFrame(rows, "key long, t double, v double")
    got = {r.key: r for r in mann_kendall(df, key_cols="key", t_col="t", value_col="v").collect()}

    con = duckdb.connect()
    con.register("series", pd.DataFrame(rows, columns=["key", "t", "v"]))
    for o in con.execute(MK_ORACLE).df().itertuples(index=False):
        r = got[o.key]
        assert r.n == o.n and r.s == o.s
        assert r.var_s == pytest.approx(o.var_s, rel=1e-12)
        want_z = _mk_z(o.s, o.var_s, o.n)
        if want_z is None:
            assert r.mk_z is None
        else:
            assert r.mk_z == pytest.approx(want_z, rel=1e-12)
        if o.sen is None or (isinstance(o.sen, float) and np.isnan(o.sen)):
            assert r.sens_slope is None
        else:
            assert r.sens_slope == pytest.approx(o.sen, rel=1e-12)


def test_monotone_series_labels(spark):
    rows = [(1, float(t), float(t) * 2.0) for t in range(6)]
    rows += [(2, float(t), -3.0 * t) for t in range(6)]
    rows += [(3, float(t), 7.0) for t in range(6)]  # all tied -> var 0
    df = spark.createDataFrame(rows, "key long, t double, v double")
    got = {r.key: r for r in mann_kendall(df, key_cols="key", t_col="t", value_col="v").collect()}
    assert got[1].s == 15 and got[1].trend == "increasing"
    assert got[1].sens_slope == pytest.approx(2.0)
    assert got[2].s == -15 and got[2].trend == "decreasing"
    assert got[2].sens_slope == pytest.approx(-3.0)
    assert got[3].mk_z is None and got[3].trend == "ns"


def test_equal_time_pairs_excluded(spark):
    # two rows share t=1: their mutual pair contributes nothing
    rows = [(1, 0.0, 0.0), (1, 1.0, 5.0), (1, 1.0, 9.0), (1, 2.0, 10.0)]
    df = spark.createDataFrame(rows, "key long, t double, v double")
    [r] = mann_kendall(df, key_cols="key", t_col="t", value_col="v").collect()
    # pairs: (0,5)+, (0,9)+, (0,10)+, (5,10)+, (9,10)+ -> S = 5
    assert r.s == 5 and r.n == 4


def test_multi_key_and_partition_invariance(spark):
    rng = np.random.default_rng(12)
    rows = [
        (k, g, float(t), float(rng.normal()))
        for k in range(3)
        for g in ("a", "b")
        for t in range(7)
    ]
    df = spark.createDataFrame(rows, "k long, grp string, t double, v double")
    one = {
        (r.k, r.grp): (r.s, r.mk_z)
        for r in mann_kendall(df, key_cols=["k", "grp"], t_col="t", value_col="v").collect()
    }
    two = {
        (r.k, r.grp): (r.s, r.mk_z)
        for r in mann_kendall(
            df.repartition(13), key_cols=["k", "grp"], t_col="t", value_col="v"
        ).collect()
    }
    assert one == two and len(one) == 6


def _cube(spark, n_buckets=6, edge=6, zoom=10):
    """Dense cube: flat background with a LATE-emerging cluster at
    (2,2) — hot only in the last two buckets, so the cell is hot in
    <50% of the series with a latest-bucket hot: the "new" shape."""
    rng = np.random.default_rng(13)
    rows = []
    for t in range(n_buckets):
        for x in range(edge):
            for y in range(edge):
                v = float(rng.uniform(0.5, 1.5))
                if (x, y) in ((2, 2), (2, 3), (3, 2), (3, 3)):
                    v += 6.0 * max(0, t - 3)
                rows.append((zoom, x, y, float(t), v))
    return spark.createDataFrame(rows, "z int, x int, y int, t_bucket double, v double")


def test_emerging_hotspots_vs_compositional_oracle(spark):
    cube = _cube(spark)
    got = {(r.x, r.y): r for r in emerging_hotspots(cube, "v").collect()}
    assert len(got) == 36

    # oracle: run the PUBLIC per-bucket Gi* slice by slice, then feed
    # the gi_z series through mann_kendall
    slices = []
    for t in sorted(r.t_bucket for r in cube.select("t_bucket").distinct().collect()):
        sl = cube.filter(F.col("t_bucket") == t).select("z", "x", "y", "v")
        for r in getis_ord_gi(sl, "v").collect():
            slices.append((r.x, r.y, float(t), r.gi_z))
    series = [s for s in slices if s[3] is not None]
    sdf = spark.createDataFrame(series, "x int, y int, t double, gi double")
    mk = {
        (r.x, r.y): r
        for r in mann_kendall(sdf, key_cols=["x", "y"], t_col="t", value_col="gi").collect()
    }
    by_cell: dict = {}
    for x, y, t, gi in slices:
        by_cell.setdefault((x, y), []).append((t, gi))
    for cell, rows in by_cell.items():
        rows.sort()
        hots = [1 if (gi is not None and gi >= 1.96) else 0 for _, gi in rows]
        r = got[cell]
        assert r.n_buckets == len(rows)
        assert r.hot_frac == pytest.approx(sum(hots) / len(hots))
        assert r.latest_hot == hots[-1]
        o = mk.get(cell)
        if o is not None and o.mk_z is not None:
            assert r.mk_z == pytest.approx(o.mk_z, rel=1e-9)
            assert r.trend == o.trend

    # the injected ramp cluster must surface as an emerging category
    assert got[(2, 2)].category in ("new", "intensifying")
    # far corner stays unremarkable
    assert got[(5, 5)].category in ("none", "sporadic")


def test_validation(spark):
    df = spark.createDataFrame([], "key long, t double, v double")
    with pytest.raises(ValueError, match="key_cols"):
        mann_kendall(df, key_cols=[], t_col="t", value_col="v")
