"""adaptive_cover vs a DuckDB oracle that re-derives the quadtree leaf
rule (same encode formula, same shift arithmetic), plus the partition
invariants: leaves disjoint, exact coverage, threshold respected."""

import duckdb
import pytest

from tilegrab_spark.operators.cover import adaptive_cover

EPS = 1e-14  # EPSILON from kernels/geo.py, baked into cell_encode_cols

_ORACLE = """
WITH enc AS (
  SELECT lon / 360.0 + 0.5 AS xf,
    0.5 - 0.25 * ln((1.0 + sin(radians(lat))) / (1.0 - sin(radians(lat)))) / pi() AS yf
  FROM pts
),
base AS (
  SELECT
    CASE WHEN xf <= 0 THEN 0 WHEN xf >= 1 THEN (1::BIGINT << {maxz}) - 1
         ELSE CAST(floor((xf + {eps}) * (1::BIGINT << {maxz})) AS BIGINT) END AS x,
    CASE WHEN yf <= 0 THEN 0 WHEN yf >= 1 THEN (1::BIGINT << {maxz}) - 1
         ELSE CAST(floor((yf + {eps}) * (1::BIGINT << {maxz})) AS BIGINT) END AS y,
    count(*)::BIGINT AS cnt
  FROM enc GROUP BY 1, 2
),
counts AS (
  SELECT r.range::INT AS z, x >> ({maxz} - r.range::INT) AS x,
         y >> ({maxz} - r.range::INT) AS y, sum(cnt)::BIGINT AS n_points
  FROM base CROSS JOIN range({minz}, {maxz} + 1) r
  GROUP BY 1, 2, 3
)
SELECT c.z, c.x, c.y, c.n_points
FROM counts c LEFT JOIN counts p
  ON p.z = c.z - 1 AND p.x = c.x >> 1 AND p.y = c.y >> 1
WHERE (c.z = {minz} OR p.n_points > {t})
  AND (c.n_points <= {t} OR c.z = {maxz})
ORDER BY c.z, c.x, c.y
"""


def _pts(seed, n, lon0, lat0, spread):
    out, s = [], seed
    for _ in range(n):
        s = (s * 1103515245 + 12345) % (1 << 31)
        u = s / float(1 << 31)
        s = (s * 1103515245 + 12345) % (1 << 31)
        v = s / float(1 << 31)
        # quadratic pull toward the center -> genuinely non-uniform density
        out.append((lon0 + (u - 0.5) ** 3 * spread * 4, lat0 + (v - 0.5) ** 3 * spread * 4))
    return out


def _oracle(pts, t, minz, maxz):
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    return con.execute(
        _ORACLE.format(t=t, minz=minz, maxz=maxz, eps=EPS)
    ).fetchall()


@pytest.mark.parametrize("t,minz,maxz", [(16, 0, 12), (4, 6, 14), (50, 2, 10)])
def test_matches_duckdb_oracle(spark, t, minz, maxz):
    pts = _pts(11, 800, 11.5, 48.1, 0.8)
    df = spark.createDataFrame(pts, "lon double, lat double")
    got = sorted(
        (r.z, r.x, r.y, r.n_points)
        for r in adaptive_cover(df, threshold=t, min_zoom=minz, max_zoom=maxz).collect()
    )
    assert got == _oracle(pts, t, minz, maxz)
    assert len(got) > 1


def test_invariants(spark):
    pts = _pts(5, 1200, -73.98, 40.75, 0.5)
    df = spark.createDataFrame(pts, "lon double, lat double")
    t, maxz = 32, 15
    leaves = adaptive_cover(df, threshold=t, max_zoom=maxz).collect()
    # exact coverage: every point in exactly one leaf
    assert sum(r.n_points for r in leaves) == len(pts)
    # threshold respected except forced max-zoom leaves
    for r in leaves:
        assert r.n_points <= t or r.z == maxz
    # disjoint: no leaf is an ancestor of another
    keys = {(r.z, r.x, r.y) for r in leaves}
    for z, x, y in keys:
        for za in range(0, z):
            assert (za, x >> (z - za), y >> (z - za)) not in keys


def test_dense_cell_forces_max_zoom_leaf(spark):
    pts = [(11.5, 48.1)] * 100 + [(12.5, 49.1)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    leaves = adaptive_cover(df, threshold=10, max_zoom=8).collect()
    dense = [r for r in leaves if r.n_points == 100]
    assert len(dense) == 1 and dense[0].z == 8
    assert sum(r.n_points for r in leaves) == 101


def test_uniform_under_threshold_single_root(spark):
    pts = _pts(9, 30, 0.0, 0.0, 0.1)
    df = spark.createDataFrame(pts, "lon double, lat double")
    leaves = adaptive_cover(df, threshold=1000, max_zoom=10).collect()
    assert len(leaves) == 1 and leaves[0].z == 0 and leaves[0].n_points == 30


def test_validation(spark):
    df = spark.createDataFrame([(0.0, 0.0)], "lon double, lat double")
    with pytest.raises(ValueError):
        adaptive_cover(df, threshold=0, max_zoom=10)
    with pytest.raises(ValueError):
        adaptive_cover(df, threshold=5, max_zoom=10, min_zoom=11)
