"""Convex-hull aggregate suite — oracled by an independent gift-wrapping
(Jarvis march) implementation, plus degenerate and invariance cases."""

from __future__ import annotations

import math

import numpy as np
import pytest

from tilegrab_spark.operators.hull import convex_hull, monotone_chain


def jarvis_hull(pts):
    """Independent gift-wrapping oracle: CCW hull, collinear excluded,
    starting from the lexicographically smallest point."""
    pts = [tuple(p) for p in {tuple(q) for q in pts}]
    pts.sort()
    if len(pts) <= 2:
        return pts
    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])
    start = pts[0]
    hull = [start]
    cur = start
    while True:
        cand = None
        for p in pts:
            if p == cur:
                continue
            if cand is None:
                cand = p
                continue
            c = cross(cur, cand, p)
            if c < 0 or (
                c == 0
                and (p[0] - cur[0]) ** 2 + (p[1] - cur[1]) ** 2
                > (cand[0] - cur[0]) ** 2 + (cand[1] - cur[1]) ** 2
            ):
                cand = p
        if cand == start:
            break
        hull.append(cand)
        cur = cand
        if len(hull) > len(pts) + 1:
            raise RuntimeError("jarvis did not terminate")
    # jarvis as written walks CLOCKWISE when candidates are kept on
    # cross<0; normalize to CCW from lex-min
    if len(hull) >= 3:
        area2 = sum(
            hull[i][0] * hull[(i + 1) % len(hull)][1]
            - hull[(i + 1) % len(hull)][0] * hull[i][1]
            for i in range(len(hull))
        )
        if area2 < 0:
            hull = [hull[0]] + hull[1:][::-1]
    return hull


class TestKernel:
    def test_matches_jarvis_on_random_clouds(self):
        rng = np.random.default_rng(5)
        for n in (3, 4, 10, 50, 500):
            pts = rng.uniform(-10, 10, (n, 2)).round(3)
            got = [tuple(p) for p in monotone_chain(pts)]
            want = jarvis_hull(pts.tolist())
            assert got == want, f"n={n}"

    def test_degenerate(self):
        assert monotone_chain(np.array([[1.0, 2.0]])).tolist() == [[1.0, 2.0]]
        two = monotone_chain(np.array([[3.0, 1.0], [1.0, 2.0], [3.0, 1.0]]))
        assert two.tolist() == [[1.0, 2.0], [3.0, 1.0]]
        col = monotone_chain(np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0], [3.0, 3.0]]))
        assert col.tolist() == [[0.0, 0.0], [3.0, 3.0]]

    def test_duplicates_and_interior_ignored(self):
        sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
        noise = np.array([[2, 2], [1, 3], [0, 0], [4, 4], [2, 0]], dtype=float)
        hull = monotone_chain(np.vstack([sq, noise, sq]))
        assert hull.tolist() == [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]]


class TestSpark:
    @pytest.fixture(scope="class")
    def points(self, spark):
        rng = np.random.default_rng(17)
        rows = []
        for g in range(6):
            n = int(rng.integers(1, 400))
            cx, cy = rng.uniform(-50, 50, 2)
            pts = rng.normal((cx, cy), 2.0, (n, 2)).round(4)
            rows += [(f"g{g}", float(x), float(y)) for x, y in pts]
        return rows

    def test_matches_oracle_per_group(self, spark, points):
        df = spark.createDataFrame(points, "track string, lon double, lat double")
        got = {
            r["track"]: [tuple(p) for p in r["hull"]]
            for r in convex_hull(df, group_col="track").collect()
        }
        by_g: dict = {}
        for g, x, y in points:
            by_g.setdefault(g, []).append((x, y))
        for g, pts in by_g.items():
            assert got[g] == jarvis_hull(pts), g

    def test_partition_invariance_and_stats(self, spark, points):
        df1 = spark.createDataFrame(points, "track string, lon double, lat double")
        a = {r["track"]: r for r in convex_hull(df1, group_col="track").collect()}
        b = {
            r["track"]: r
            for r in convex_hull(df1.repartition(11), group_col="track").collect()
        }
        for g in a:
            assert [tuple(p) for p in a[g]["hull"]] == [tuple(p) for p in b[g]["hull"]]
            assert a[g]["hull_area"] == b[g]["hull_area"]

    def test_square_golden_stats(self, spark):
        sq = [("s", 0.0, 0.0), ("s", 2.0, 0.0), ("s", 2.0, 2.0), ("s", 0.0, 2.0),
              ("s", 1.0, 1.0)]
        r = convex_hull(
            spark.createDataFrame(sq, "g string, lon double, lat double"),
            group_col="g",
        ).first()
        assert r["n_vertices"] == 4
        assert r["hull_area"] == pytest.approx(4.0)
        assert r["hull_perimeter"] == pytest.approx(8.0)

    def test_degenerate_groups(self, spark):
        rows = [("one", 5.0, 5.0), ("two", 0.0, 0.0), ("two", 3.0, 4.0)]
        got = {
            r["g"]: r
            for r in convex_hull(
                spark.createDataFrame(rows, "g string, lon double, lat double"),
                group_col="g",
            ).collect()
        }
        assert got["one"]["n_vertices"] == 1
        assert got["one"]["hull_area"] == 0.0
        assert got["two"]["n_vertices"] == 2
        assert got["two"]["hull_perimeter"] == pytest.approx(10.0)  # 2 * 5
