"""Trajectory similarity join — brute-force + DuckDB-lambda oracles.

Oracles are independent implementations: all-pairs (no blocking)
symmetric Hausdorff in scalar python, the Eiter–Mannila Fréchet DP in
plain dict-DP python, and a DuckDB ``list_transform`` lambda SQL that
re-derives the Hausdorff join end-to-end.
"""

import math

import duckdb
import numpy as np
import pytest

from tilegrab_spark.operators.tracksim import (
    track_candidate_pairs,
    track_point_arrays,
    track_similarity_join,
)

R = 6371008.8


def hav(lon1, lat1, lon2, lat2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    a = (
        math.sin((p2 - p1) / 2) ** 2
        + math.cos(p1)
        * math.cos(p2)
        * math.sin((math.radians(lon2) - math.radians(lon1)) / 2) ** 2
    )
    return 2 * R * math.asin(math.sqrt(min(1.0, a)))


def sym_hausdorff(A, B):
    d_ab = max(min(hav(*p, *q) for q in B) for p in A)
    d_ba = max(min(hav(*p, *q) for q in A) for p in B)
    return max(d_ab, d_ba)


def frechet_ref(A, B):
    n, m = len(A), len(B)
    d = [[hav(*A[i], *B[j]) for j in range(m)] for i in range(n)]
    ca = [[None] * m for _ in range(n)]
    for i in range(n):
        for j in range(m):
            if i == 0 and j == 0:
                ca[i][j] = d[0][0]
            elif i == 0:
                ca[i][j] = max(ca[0][j - 1], d[0][j])
            elif j == 0:
                ca[i][j] = max(ca[i - 1][0], d[i][0])
            else:
                ca[i][j] = max(min(ca[i - 1][j], ca[i - 1][j - 1], ca[i][j - 1]), d[i][j])
    return ca[n - 1][m - 1]


def make_tracks():
    """Deterministic fleet: three jittered copies of a base route (all
    within ~80 m of each other), the SAME route reversed, one far-away
    route, and an antimeridian-straddling pair within ~60 m."""
    rng = np.random.default_rng(7)
    base = [(10.0 + 0.001 * i, 45.0 + 0.0006 * i) for i in range(12)]
    rows = []

    def add(track, pts):
        for k, (lon, lat) in enumerate(pts):
            rows.append((track, float(k * 30), float(lon), float(lat)))

    add("a0", base)
    for j in range(1, 3):
        jit = [
            (lon + float(rng.normal(0, 2e-4)), lat + float(rng.normal(0, 1.4e-4)))
            for lon, lat in base
        ]
        add(f"a{j}", jit)
    add("rev", list(reversed(base)))
    add("far", [(11.5 + 0.001 * i, 44.0) for i in range(12)])
    am1 = [(179.9995 + 0.0002 * i, 10.0) for i in range(8)]  # crosses antimeridian
    am2 = [((lon + 0.0004 + 180) % 360 - 180, lat + 2e-4) for lon, lat in am1]
    add("am1", [((lon + 180) % 360 - 180, lat) for lon, lat in am1])
    add("am2", am2)
    return rows


def tracks_df(spark):
    return spark.createDataFrame(
        make_tracks(), "track_id string, ts double, lon double, lat double"
    )


def by_track(rows):
    out = {}
    for t, ts, lon, lat in rows:
        out.setdefault(t, []).append((ts, lon, lat))
    return {
        t: [(lon, lat) for _, lon, lat in sorted(pts)] for t, pts in out.items()
    }


def oracle_pairs(rows, d, metric="hausdorff"):
    pts = by_track(rows)
    names = sorted(pts)
    fn = sym_hausdorff if metric == "hausdorff" else frechet_ref
    out = {}
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            v = fn(pts[a], pts[b])
            if v <= d:
                out[(a, b)] = v
    return out


D = 120.0


def test_hausdorff_join_matches_bruteforce(spark):
    df = tracks_df(spark)
    got = {
        (r["track_a"], r["track_b"]): r["dist_m"]
        for r in track_similarity_join(df, D).collect()
    }
    want = oracle_pairs(make_tracks(), D)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)
    # the three jittered copies pair up; the far route pairs with nobody
    assert ("a0", "a1") in got and ("a0", "a2") in got and ("a1", "a2") in got
    assert not any("far" in k for pair in got for k in pair)


def test_reversed_track_is_hausdorff_close_but_frechet_far(spark):
    df = tracks_df(spark)
    h = {
        (r["track_a"], r["track_b"]): r["dist_m"]
        for r in track_similarity_join(df, D).collect()
    }
    f = {
        (r["track_a"], r["track_b"]): r["dist_m"]
        for r in track_similarity_join(df, D, metric="frechet").collect()
    }
    assert ("a0", "rev") in h  # same geometry
    assert ("a0", "rev") not in f  # opposite traversal: leash spans the route
    want = oracle_pairs(make_tracks(), D, metric="frechet")
    assert set(f) == set(want)
    for k in want:
        assert f[k] == pytest.approx(want[k], abs=1e-6)


def test_frechet_ge_hausdorff_and_candidates_never_loss(spark):
    df = tracks_df(spark)
    pts = by_track(make_tracks())
    names = sorted(pts)
    cands = {
        (r["track_a"], r["track_b"])
        for r in track_candidate_pairs(df, D).collect()
    }
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            h = sym_hausdorff(pts[a], pts[b])
            assert frechet_ref(pts[a], pts[b]) >= h - 1e-9
            if h <= D:
                assert (a, b) in cands  # blocking may over-generate, never lose


def test_catalyst_refine_matches_arrow(spark):
    df = tracks_df(spark)
    arrow = {
        (r["track_a"], r["track_b"]): r["dist_m"]
        for r in track_similarity_join(df, D).collect()
    }
    catalyst = {
        (r["track_a"], r["track_b"]): r["dist_m"]
        for r in track_similarity_join(df, D, refine="catalyst").collect()
    }
    assert set(arrow) == set(catalyst)
    for k in arrow:
        assert arrow[k] == pytest.approx(catalyst[k], abs=1e-9)
    with pytest.raises(ValueError, match="refine"):
        track_similarity_join(df, D, refine="python")
    with pytest.raises(ValueError, match="catalyst"):
        track_similarity_join(df, D, metric="frechet", refine="catalyst")


def test_antimeridian_pair_found(spark):
    got = {
        (r["track_a"], r["track_b"])
        for r in track_similarity_join(tracks_df(spark), D).collect()
    }
    assert ("am1", "am2") in got


def test_duckdb_lambda_sql_oracle(spark):
    """Contract-style: the full Hausdorff join re-derived in DuckDB
    list-lambda SQL over the same rows."""
    df = tracks_df(spark)
    got = (
        track_similarity_join(df, D)
        .toPandas()
        .sort_values(["track_a", "track_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE fixes(track_id VARCHAR, ts DOUBLE, lon DOUBLE, lat DOUBLE)"
    )
    con.executemany("INSERT INTO fixes VALUES (?,?,?,?)", make_tracks())
    hav_sql = (
        "2*{R}*asin(sqrt(least(1.0, sin(radians(q.lat-p.lat)/2)^2 + "
        "cos(radians(p.lat))*cos(radians(q.lat))*sin(radians(q.lon-p.lon)/2)^2)))"
    ).format(R=R)
    oracle = con.execute(
        f"""
        WITH tr AS (
          SELECT track_id, list(struct_pack(lon := lon, lat := lat) ORDER BY ts, lon, lat) pts
          FROM fixes GROUP BY track_id
        ),
        pairs AS (
          SELECT a.track_id track_a, b.track_id track_b,
                 greatest(
                   list_max(list_transform(a.pts, p -> list_min(list_transform(b.pts, q -> {hav_sql})))),
                   list_max(list_transform(b.pts, p -> list_min(list_transform(a.pts, q -> {hav_sql}))))
                 ) dist_m
          FROM tr a JOIN tr b ON a.track_id < b.track_id
        )
        SELECT * FROM pairs WHERE dist_m <= {D}
        ORDER BY track_a, track_b
        """
    ).df()
    assert list(got["track_a"]) == list(oracle["track_a"])
    assert list(got["track_b"]) == list(oracle["track_b"])
    np.testing.assert_allclose(got["dist_m"], oracle["dist_m"], rtol=0, atol=1e-6)


def test_point_arrays_ordered_and_validation(spark):
    df = tracks_df(spark)
    arr = {r["track"]: r["pts"] for r in track_point_arrays(df).collect()}
    want = by_track(make_tracks())
    assert {t: [(p["lon"], p["lat"]) for p in pts] for t, pts in arr.items()} == want
    with pytest.raises(ValueError, match="max_dist_m"):
        track_similarity_join(df, 0.0)
    with pytest.raises(ValueError, match="metric"):
        track_similarity_join(df, 10.0, metric="dtw")
    with pytest.raises(ValueError, match="zoom"):
        track_candidate_pairs(df, 10.0, zoom=31)
