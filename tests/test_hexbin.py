"""Hexbin suite — python lattice oracle (same rounding convention as
Spark's HALF_UP), nearest-center property, binning counts, neighbors."""

from __future__ import annotations

import math

import numpy as np
import pytest

from tilegrab_spark.operators.hexbin import hex_neighbors, hexbin, with_hex_cell

R_E = 6378137.0
SQRT3 = math.sqrt(3.0)


def merc(lon, lat):
    return (
        R_E * math.radians(lon),
        R_E * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2)),
    )


def round_half_away(v):
    return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)


def axial_of(lon, lat, s):
    x, y = merc(lon, lat)
    fq = (SQRT3 / 3.0 * x - y / 3.0) / s
    fr = (2.0 / 3.0 * y) / s
    fs = -fq - fr
    rq, rr, rs = round_half_away(fq), round_half_away(fr), round_half_away(fs)
    dq, dr, ds = abs(rq - fq), abs(rr - fr), abs(rs - fs)
    if dq > dr and dq > ds:
        rq = -rr - rs
    elif dr > ds:
        rr = -rq - rs
    return int(rq), int(rr)


def center_of(q, r, s):
    return (s * (SQRT3 * q + SQRT3 / 2.0 * r), s * 1.5 * r)


SIZE = 500.0  # meters


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(31)
    lons = rng.uniform(8.50, 8.56, 400)
    lats = rng.uniform(47.20, 47.24, 400)
    return [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lons, lats))]


class TestAssignment:
    def test_matches_python_lattice(self, spark, cloud):
        df = spark.createDataFrame(cloud, "pid long, lon double, lat double")
        rows = with_hex_cell(df, size_m=SIZE).collect()
        for r in rows:
            pid = r["pid"]
            want = axial_of(cloud[pid][1], cloud[pid][2], SIZE)
            assert (r["hex_q"], r["hex_r"]) == want, pid
            cx, cy = center_of(r["hex_q"], r["hex_r"], SIZE)
            gx, gy = merc(r["hex_lon"], r["hex_lat"])
            assert gx == pytest.approx(cx, abs=1e-6)
            assert gy == pytest.approx(cy, abs=1e-6)

    def test_assigned_center_is_nearest(self, spark, cloud):
        df = spark.createDataFrame(cloud[:100], "pid long, lon double, lat double")
        rows = with_hex_cell(df, size_m=SIZE).collect()
        for r in rows:
            px, py = merc(cloud[r["pid"]][1], cloud[r["pid"]][2])
            q0, r0 = r["hex_q"], r["hex_r"]
            cx, cy = center_of(q0, r0, SIZE)
            d0 = math.hypot(px - cx, py - cy)
            # circumradius bound + strictly nearest among the 5x5 block
            assert d0 <= SIZE + 1e-6
            for dq in range(-2, 3):
                for dr in range(-2, 3):
                    ox, oy = center_of(q0 + dq, r0 + dr, SIZE)
                    assert d0 <= math.hypot(px - ox, py - oy) + 1e-9

    def test_validation(self, spark, cloud):
        df = spark.createDataFrame(cloud[:2], "pid long, lon double, lat double")
        with pytest.raises(ValueError, match="size_m"):
            with_hex_cell(df, size_m=0)


class TestBinAndNeighbors:
    def test_hexbin_counts_and_values(self, spark, cloud):
        rows = [(p, lo, la, float(p % 7)) for p, lo, la in cloud]
        df = spark.createDataFrame(rows, "pid long, lon double, lat double, v double")
        got = {
            (r["hex_q"], r["hex_r"]): r
            for r in hexbin(df, size_m=SIZE, value_col="v").collect()
        }
        want: dict = {}
        for p, lo, la, v in rows:
            want.setdefault(axial_of(lo, la, SIZE), []).append(v)
        assert set(got) == set(want)
        assert sum(r["n_points"] for r in got.values()) == len(rows)
        for k, vs in want.items():
            assert got[k]["n_points"] == len(vs)
            assert got[k]["value_sum"] == pytest.approx(sum(vs))
            assert got[k]["value_mean"] == pytest.approx(sum(vs) / len(vs))
        # hex_id is unique per (q, r)
        ids = [r["hex_id"] for r in got.values()]
        assert len(set(ids)) == len(ids)

    def test_neighbors_ring(self, spark):
        df = spark.createDataFrame([(5, -3)], "hex_q long, hex_r long")
        nb = {(r["nb_q"], r["nb_r"]) for r in hex_neighbors(df).collect()}
        assert nb == {(6, -3), (6, -4), (5, -4), (4, -3), (4, -2), (5, -2)}
        # all six neighbor centers are exactly sqrt(3)*R from the center
        cx, cy = center_of(5, -3, SIZE)
        for q, r in nb:
            ox, oy = center_of(q, r, SIZE)
            assert math.hypot(ox - cx, oy - cy) == pytest.approx(SQRT3 * SIZE, rel=1e-12)


class TestHotspots:
    def test_gi_star_matches_python_oracle(self, spark, cloud):
        from tilegrab_spark.operators.hexbin import hex_hotspots

        # a dense injected cluster on top of the uniform cloud
        clustered = list(cloud) + [
            (10_000 + i, 8.531 + (i % 5) * 1e-4, 47.221 + (i // 5) * 1e-4)
            for i in range(60)
        ]
        df = spark.createDataFrame(clustered, "pid long, lon double, lat double")
        got = {
            (r["hex_q"], r["hex_r"]): r
            for r in hex_hotspots(df, size_m=SIZE).collect()
        }

        # python oracle: bin, 6-neighbor lag over occupied hexes, Gi*
        counts: dict = {}
        for _, lo, la in clustered:
            k = axial_of(lo, la, SIZE)
            counts[k] = counts.get(k, 0) + 1
        n = len(counts)
        sx = sum(counts.values())
        sxx = sum(v * v for v in counts.values())
        mean = sx / n
        var = sxx / n - mean * mean
        offs = ((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))
        assert set(got) == set(counts)
        hottest = max(counts, key=counts.get)
        for k, v in counts.items():
            nbrs = [(k[0] + a, k[1] + b) for a, b in offs]
            w = sum(1 for nb in nbrs if nb in counts) + 1
            nbr_sum = sum(counts.get(nb, 0) for nb in nbrs) + v
            denom_inner = (n * w - w * w) / (n - 1)
            z = (nbr_sum - mean * w) / math.sqrt(var * denom_inner)
            assert got[k]["gi_z"] == pytest.approx(z, rel=1e-9), k
        # the injected cluster is the top hot spot at 99% confidence;
        # the arg-max z hex is the hottest hex or one of its 6 neighbors
        # (Gi* scores neighborhood sums, not single-cell counts)
        assert got[hottest]["spot"] == "hot99"
        top = max(got, key=lambda k: got[k]["gi_z"])
        assert top == hottest or (
            top[0] - hottest[0], top[1] - hottest[1]
        ) in offs

    def test_plain_gi_and_value_weighting(self, spark, cloud):
        from tilegrab_spark.operators.hexbin import hex_hotspots

        rows = [(p, lo, la, float(1 + p % 3)) for p, lo, la in cloud]
        df = spark.createDataFrame(rows, "pid long, lon double, lat double, v double")
        out = hex_hotspots(df, size_m=SIZE, value_col="v", star=False).collect()
        # v carries value_sum, not the point count
        want: dict = {}
        for p, lo, la, v in rows:
            k = axial_of(lo, la, SIZE)
            want[k] = want.get(k, 0.0) + v
        for r in out:
            assert r["v"] == pytest.approx(want[(r["hex_q"], r["hex_r"])])
        # isolated-or-degenerate cells surface as NULL, never NaN
        for r in out:
            assert r["gi_z"] is None or r["gi_z"] == r["gi_z"]
