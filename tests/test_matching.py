"""HMM map matching (operators/matching.py): exact Viterbi parity vs
an independent brute-force path enumeration, the parallel-roads
coherence property, gap/break handling, and partition invariance."""

import math

import numpy as np
import pytest

from tilegrab_spark.kernels.geo import WGS84_RADIUS
from tilegrab_spark.operators.matching import match_tracks

R = WGS84_RADIUS


def _merc(lon, lat):
    return (R * math.radians(lon),
            R * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2)))


def _seg_snap(px, py, a, b):
    ax, ay = _merc(*a)
    bx, by = _merc(*b)
    dx, dy = bx - ax, by - ay
    L2 = dx * dx + dy * dy
    t = 0.0 if L2 <= 0 else max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / L2))
    sx, sy = ax + t * dx, ay + t * dy
    return (px - sx) ** 2 + (py - sy) ** 2, t, sx, sy


def _brute_candidates(fix, lines, radius):
    """All (line, seg, d2, sx, sy) within radius — plain loops,
    independent of the blocked join."""
    px, py = _merc(*fix)
    out = {}
    for lid, coords in lines:
        best = None
        for si in range(len(coords) - 1):
            d2, t, sx, sy = _seg_snap(px, py, coords[si], coords[si + 1])
            if best is None or (d2, si) < (best[0], best[1]):
                best = (d2, si, t, sx, sy)
        if best is not None and best[0] <= radius * radius:
            out[lid] = best
    return out, (px, py)


def _brute_viterbi(fixes, lines, radius, sigma, beta, max_candidates=8):
    """Enumerate EVERY candidate path of one unbroken chain and pick
    the max joint log-prob (ties -> nearest-first order)."""
    import itertools
    cands = []
    ps = []
    for f in fixes:
        c, p = _brute_candidates(f, lines, radius)
        ordered = sorted(c.items(), key=lambda kv: (kv[1][0], kv[0]))
        cands.append(ordered[:max_candidates])
        ps.append(p)
    assert all(cands), "oracle expects an unbroken chain"
    best_lp, best_path = -np.inf, None
    for path in itertools.product(*[range(len(c)) for c in cands]):
        lp = 0.0
        for t, ci in enumerate(path):
            d2 = cands[t][ci][1][0]
            lp += -d2 / (2 * sigma * sigma)
            if t:
                pj = cands[t - 1][path[t - 1]][1]
                cj = cands[t][ci][1]
                route = math.hypot(cj[3] - pj[3], cj[4] - pj[4])
                gc = math.hypot(ps[t][0] - ps[t - 1][0], ps[t][1] - ps[t - 1][1])
                lp += -abs(route - gc) / beta
        if lp > best_lp + 1e-12:
            best_lp, best_path = lp, path
    return [cands[t][ci][0] for t, ci in enumerate(best_path)]


LINES = [
    ("A", [[0.0, 0.0], [0.01, 0.0]]),
    ("B", [[0.0, 0.00036], [0.01, 0.00036]]),  # ~40 m north of A
    ("C", [[0.004, -0.002], [0.004, 0.002]]),  # crossing road
]


def _lines_df(spark):
    return spark.createDataFrame(
        LINES, "line_id string, coords array<array<double>>")


class TestViterbiOracle:
    def test_exact_path_parity(self, spark):
        """The distributed match equals brute-force enumeration over
        every candidate path, for several noise draws."""
        radius, sigma, beta = 80.0, 20.0, 40.0
        for seed in (1, 7, 23):
            rng = np.random.default_rng(seed)
            lons = np.linspace(0.001, 0.009, 7)
            lats = rng.normal(0.00012, 0.00016, 7)  # between A and B
            fixes = [(float(lons[i]), float(lats[i])) for i in range(7)]
            expect = _brute_viterbi(fixes, LINES, radius, sigma, beta)
            df = spark.createDataFrame(
                [("t", i, lo, la) for i, (lo, la) in enumerate(fixes)],
                "track_id string, seq long, lon double, lat double")
            got = match_tracks(df, _lines_df(spark), radius_m=radius,
                               sigma_m=sigma, beta_m=beta).collect()
            path = [r.line_id for r in sorted(got, key=lambda r: r.seq)]
            assert path == expect, (seed, path, expect)

    def test_hmm_beats_nearest_on_parallel_roads(self, spark):
        """Noisy fixes along road A (a parallel road ~80 m north):
        independent nearest-snap flips to the other road on outlier
        fixes, the HMM path stays on A throughout."""
        from tilegrab_spark.operators.snap import snap_points_to_lines
        lines = spark.createDataFrame(
            [("A", [[0.0, 0.0], [0.01, 0.0]]),
             ("B", [[0.0, 0.00072], [0.01, 0.00072]])],
            "line_id string, coords array<array<double>>")
        n = 20
        lons = np.linspace(0.0005, 0.0095, n)
        lats = np.full(n, 0.00002)
        # moderate outliers just past the halfway line (0.52-0.55 of
        # the 80 m separation): nearest-snap flips on every one; the
        # HMM's transition term absorbs them.  (Extreme outliers WOULD
        # flip the HMM too — the no-router route approximation can't
        # distinguish a big noise spike from really driving to B; the
        # module docstring documents that limitation.)
        for i, f in ((7, 0.55), (12, 0.54), (16, 0.52)):
            lats[i] = f * 0.00072
        fixes = spark.createDataFrame(
            [("t", i, float(lons[i]), float(lats[i])) for i in range(n)],
            "track_id string, seq long, lon double, lat double")
        naive = snap_points_to_lines(
            fixes.withColumnRenamed("seq", "point_id").drop("track_id"),
            lines, radius_m=120.0).collect()
        naive_lines = [r.line_id for r in sorted(naive, key=lambda r: r.point_id)]
        assert [i for i, l in enumerate(naive_lines) if l == "B"] == [7, 12, 16]
        got = sorted(match_tracks(fixes, lines, radius_m=120.0).collect(),
                     key=lambda r: r.seq)
        assert [r.line_id for r in got] == ["A"] * n
        assert all(r.matched for r in got)

    def test_gap_breaks_chain(self, spark):
        """A fix far from every line surfaces matched=false and the
        chains on either side still match independently."""
        rows = [("t", 0, 0.002, 0.00002), ("t", 1, 0.003, 0.00002),
                ("t", 2, 0.5, 0.5),  # nowhere near any line
                ("t", 3, 0.006, 0.00034), ("t", 4, 0.007, 0.00034)]
        fixes = spark.createDataFrame(
            rows, "track_id string, seq long, lon double, lat double")
        got = {r.seq: r for r in match_tracks(
            fixes, _lines_df(spark), radius_m=50.0).collect()}
        assert len(got) == 5
        assert not got[2].matched and got[2].line_id is None
        assert got[0].matched and got[0].line_id == "A"
        assert got[3].matched and got[3].line_id == "B"

    def test_partition_invariance_and_snap_columns(self, spark):
        rng = np.random.default_rng(11)
        lons = np.linspace(0.001, 0.009, 16)
        lats = rng.normal(0.0, 0.0001, 16)
        rows = [("t%d" % (i % 3), i // 3, float(lons[i]), float(lats[i]))
                for i in range(16)]
        fixes = spark.createDataFrame(
            rows, "track_id string, seq long, lon double, lat double")
        a = match_tracks(fixes, _lines_df(spark), radius_m=80.0)
        b = match_tracks(fixes.repartition(7), _lines_df(spark), radius_m=80.0)
        ka = sorted(map(tuple, a.collect()))
        kb = sorted(map(tuple, b.collect()))
        assert ka == kb
        for r in a.collect():
            if r.matched:
                # snapped point lies on the matched line's latitude
                lat_expect = 0.0 if r.line_id == "A" else 0.00036
                if r.line_id in ("A", "B"):
                    assert r.snap_lat == pytest.approx(lat_expect, abs=1e-9)
                assert 0.0 <= r.seg_t <= 1.0 and r.dist_m >= 0.0

    def test_validation(self, spark):
        fixes = spark.createDataFrame(
            [("t", 0, 0.0, 0.0)],
            "track_id string, seq long, lon double, lat double")
        with pytest.raises(ValueError, match="positive"):
            match_tracks(fixes, _lines_df(spark), radius_m=50.0, sigma_m=0.0)
        with pytest.raises(ValueError, match="max_candidates"):
            match_tracks(fixes, _lines_df(spark), radius_m=50.0,
                         max_candidates=0)


class TestNetworkRoute:
    """route='network' (round 5): transition distances over the local
    line graph — the paper's actual model, closing the documented
    planar simplification."""

    def test_router_unit_distances(self):
        import json as _json

        from tilegrab_spark.operators.matching import _LocalRouter
        import pandas as pd

        # L-shaped connected pair sharing the corner vertex exactly
        D = [[0.0, 0.0], [0.001, 0.0]]
        E = [[0.001, 0.0], [0.001, 0.001]]
        B = [[0.0, 0.00036], [0.01, 0.00036]]  # disconnected road
        r = _LocalRouter({
            "D": _json.dumps(D), "E": _json.dumps(E), "B": _json.dumps(B),
        })
        lenD = math.hypot(*(np.subtract(_merc(*D[1]), _merc(*D[0]))))
        lenE = math.hypot(*(np.subtract(_merc(*E[1]), _merc(*E[0]))))
        g = lambda rows: pd.DataFrame(rows, columns=["line_id", "seg_idx", "seg_t"])
        # snap at 30% along D -> snap at 40% along E: via the corner
        d = r.pairwise(g([("D", 0, 0.3)]), g([("E", 0, 0.4)]), "line_id")
        assert abs(d[0, 0] - (0.7 * lenD + 0.4 * lenE)) < 1e-6
        # same segment: direct along-segment distance, not via endpoints
        d = r.pairwise(g([("D", 0, 0.2)]), g([("D", 0, 0.9)]), "line_id")
        assert abs(d[0, 0] - 0.7 * lenD) < 1e-6
        # disconnected: no path
        d = r.pairwise(g([("D", 0, 0.5)]), g([("B", 0, 0.5)]), "line_id")
        assert math.isinf(d[0, 0])

    def test_rejects_disconnected_shortcut_planar_does_not(self, spark):
        """The classic wrong-shortcut: a noisy fix sits nearer the
        PARALLEL DISCONNECTED road B; planar transition cost cannot
        see the disconnection and hops to B, network mode stays on A."""
        pts = [(i, 0.0009 * (i + 1), 0.0) for i in range(6)]
        pts[3] = (3, 0.0009 * 4, 0.00030)  # ~33 m north: 7 m from B
        fixes = spark.createDataFrame(
            [("t", s, lon, lat) for s, lon, lat in pts],
            "track_id string, seq long, lon double, lat double",
        )
        planar = {r.seq: r.line_id for r in match_tracks(
            fixes, _lines_df(spark), radius_m=60.0).collect()}
        network = {r.seq: r.line_id for r in match_tracks(
            fixes, _lines_df(spark), radius_m=60.0, route="network").collect()}
        assert planar[3] == "B"  # the distinction is real
        assert all(network[s] == "A" for s in range(6)), network

    def test_network_parity_on_single_line(self, spark):
        """Fixes on one road: both modes must produce identical rows
        (routes along one line ARE the planar along-line distances)."""
        # lons stay >150 m away from crossing road C (whose unnoded
        # crossing is a legit mode difference, not a parity case)
        fixes = spark.createDataFrame(
            [("t", i, 0.0005 * (i + 1), 1e-05) for i in range(5)],
            "track_id string, seq long, lon double, lat double",
        )
        cols = ["seq", "line_id", "seg_idx", "seg_t", "snap_lon", "snap_lat"]
        a = sorted(tuple(r[c] for c in cols) for r in match_tracks(
            fixes, _lines_df(spark), radius_m=50.0).collect())
        b = sorted(tuple(r[c] for c in cols) for r in match_tracks(
            fixes, _lines_df(spark), radius_m=50.0, route="network").collect())
        assert a == b

    def test_validation(self, spark):
        fixes = spark.createDataFrame(
            [("t", 0, 0.001, 0.0)],
            "track_id string, seq long, lon double, lat double",
        )
        with pytest.raises(ValueError, match="route"):
            match_tracks(fixes, _lines_df(spark), radius_m=50.0, route="dijkstra")
