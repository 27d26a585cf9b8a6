"""snap_points_to_lines suite — brute-force numpy nearest-segment
oracle in independent scalar Mercator math."""

from __future__ import annotations

import math

import numpy as np
import pytest

from tilegrab_spark.operators.snap import explode_segments, snap_points_to_lines

R = 6378137.0


def merc(lon, lat):
    return (
        R * math.radians(lon),
        R * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2)),
    )


def brute_nearest(px, py, lines, radius):
    """lines: {line_id: [(lon,lat), ...]} -> (line_id, seg_idx, dist, t)
    of the globally nearest segment within radius, ties by
    (dist, line_id, seg_idx)."""
    best = None
    for lid, coords in lines.items():
        m = [merc(*c) for c in coords]
        for i in range(len(m) - 1):
            (ax, ay), (bx, by) = m[i], m[i + 1]
            dx, dy = bx - ax, by - ay
            l2 = dx * dx + dy * dy
            t = 0.0 if l2 == 0 else max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / l2))
            sx, sy = ax + t * dx, ay + t * dy
            d = math.hypot(px - sx, py - sy)
            if d <= radius:
                key = (d, lid, i)
                if best is None or key < best[:3]:
                    best = (d, lid, i, t)
    return best


@pytest.fixture(scope="module")
def road_scene(spark):
    rng = np.random.default_rng(23)
    # three roads near (8.5E, 47.2N): a horizontal, a diagonal, an L
    lines = {
        "road_h": [(8.50, 47.20), (8.52, 47.20), (8.54, 47.20)],
        "road_d": [(8.50, 47.19), (8.54, 47.23)],
        "road_l": [(8.51, 47.21), (8.51, 47.23), (8.53, 47.23)],
    }
    pts = []
    for i in range(120):
        lon = float(rng.uniform(8.495, 8.545))
        lat = float(rng.uniform(47.185, 47.235))
        pts.append((i, lon, lat))
    lines_df = spark.createDataFrame(
        [(k, [[float(a), float(b)] for a, b in v]) for k, v in lines.items()],
        "line_id string, coords array<array<double>>",
    )
    pts_df = spark.createDataFrame(pts, "point_id long, lon double, lat double")
    return lines, pts, lines_df, pts_df


class TestSnap:
    def test_segments_explode(self, spark, road_scene):
        lines, _, lines_df, _ = road_scene
        rows = explode_segments(lines_df).collect()
        want = sum(len(v) - 1 for v in lines.values())
        assert len(rows) == want
        r0 = {(r["line_id"], r["seg_idx"]) for r in rows}
        assert ("road_h", 0) in r0 and ("road_h", 1) in r0 and ("road_d", 0) in r0

    @pytest.mark.parametrize("radius", [150.0, 900.0])
    def test_matches_bruteforce(self, spark, road_scene, radius):
        lines, pts, lines_df, pts_df = road_scene
        got = {
            r["point_id"]: r
            for r in snap_points_to_lines(
                pts_df, lines_df, radius_m=radius
            ).collect()
        }
        n_matched = 0
        for pid, lon, lat in pts:
            px, py = merc(lon, lat)
            want = brute_nearest(px, py, lines, radius)
            r = got[pid]
            if want is None:
                assert r["line_id"] is None, pid
                continue
            n_matched += 1
            d, lid, si, t = want
            assert r["line_id"] == lid, pid
            assert r["seg_idx"] == si, pid
            assert r["dist_m"] == pytest.approx(d, rel=1e-9, abs=1e-9)
            assert r["seg_t"] == pytest.approx(t, rel=1e-9, abs=1e-9)
        assert n_matched > 0

    def test_snapped_point_on_segment(self, spark, road_scene):
        lines, _, lines_df, pts_df = road_scene
        rows = snap_points_to_lines(
            pts_df, lines_df, radius_m=900.0, how="inner"
        ).collect()
        assert rows
        for r in rows:
            coords = lines[r["line_id"]]
            (alon, alat), (blon, blat) = coords[r["seg_idx"]], coords[r["seg_idx"] + 1]
            ax, ay = merc(alon, alat)
            bx, by = merc(blon, blat)
            sx, sy = merc(r["snap_lon"], r["snap_lat"])
            t = r["seg_t"]
            assert sx == pytest.approx(ax + t * (bx - ax), abs=1e-6)
            assert sy == pytest.approx(ay + t * (by - ay), abs=1e-6)

    def test_inner_vs_left_and_partition_invariance(self, spark, road_scene):
        _, pts, lines_df, pts_df = road_scene
        left = snap_points_to_lines(pts_df, lines_df, radius_m=150.0)
        assert left.count() == len(pts)
        inner = snap_points_to_lines(pts_df, lines_df, radius_m=150.0, how="inner")
        assert inner.count() == left.filter("line_id IS NOT NULL").count()
        a = sorted(
            (r["point_id"], r["line_id"], r["seg_idx"])
            for r in inner.collect()
        )
        b = sorted(
            (r["point_id"], r["line_id"], r["seg_idx"])
            for r in snap_points_to_lines(
                pts_df.repartition(9), lines_df.repartition(3),
                radius_m=150.0, how="inner",
            ).collect()
        )
        assert a == b

    def test_guard_and_validation(self, spark, road_scene):
        _, _, lines_df, pts_df = road_scene
        with pytest.raises(ValueError, match="radius_m"):
            snap_points_to_lines(pts_df, lines_df, radius_m=0)
        with pytest.raises(Exception, match="max_chunks_per_segment"):
            snap_points_to_lines(
                pts_df, lines_df, radius_m=5.0, max_chunks_per_segment=100
            ).collect()
