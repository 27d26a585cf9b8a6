"""Trajectory operators vs scalar oracles."""

import math

import numpy as np
import pytest

from tilegrab_spark.operators.trajectory import (
    _EARTH_R,
    stay_points,
    track_stats,
    with_legs,
)


def _hav(lon1, lat1, lon2, lat2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    a = (
        math.sin((p2 - p1) / 2) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin((math.radians(lon2) - math.radians(lon1)) / 2) ** 2
    )
    return 2 * _EARTH_R * math.asin(math.sqrt(min(1.0, a)))


def _fixes_df(spark, rows):
    return spark.createDataFrame(rows, "track_id string, ts double, lon double, lat double")


def test_haversine_golden_paris_london(spark):
    # Paris (2.3522, 48.8566) -> London (-0.1276, 51.5072): ~343-344 km
    df = _fixes_df(spark, [("t", 0.0, 2.3522, 48.8566), ("t", 3600.0, -0.1276, 51.5072)])
    legs = with_legs(df).collect()
    d = [r.leg_m for r in legs if r.leg_m is not None][0]
    assert d == pytest.approx(343_900, rel=0.005)
    assert d == pytest.approx(_hav(2.3522, 48.8566, -0.1276, 51.5072), abs=1e-6)


def test_track_stats_vs_manual(spark):
    rng = np.random.default_rng(31)
    rows = []
    for t in ("a", "b"):
        lon, lat = 10.0, 45.0
        for i in range(20):
            lon += float(rng.normal(0, 0.01))
            lat += float(rng.normal(0, 0.01))
            rows.append((t, float(i * 60), lon, lat))
    got = {r.track_id: r for r in track_stats(_fixes_df(spark, rows)).collect()}
    for t in ("a", "b"):
        pts = [(ts, lon, lat) for tt, ts, lon, lat in rows if tt == t]
        total = sum(
            _hav(pts[i][1], pts[i][2], pts[i + 1][1], pts[i + 1][2])
            for i in range(len(pts) - 1)
        )
        speeds = [
            _hav(pts[i][1], pts[i][2], pts[i + 1][1], pts[i + 1][2]) / 60.0
            for i in range(len(pts) - 1)
        ]
        r = got[t]
        assert r.n_fixes == 20
        assert r.total_m == pytest.approx(total, rel=1e-9)
        assert r.duration_s == pytest.approx(19 * 60)
        assert r.avg_speed_mps == pytest.approx(total / (19 * 60), rel=1e-9)
        assert r.max_speed_mps == pytest.approx(max(speeds), rel=1e-9)
        assert r.min_lon == pytest.approx(min(p[1] for p in pts))


def test_first_fix_has_null_leg(spark):
    df = _fixes_df(spark, [("t", 0.0, 0.0, 0.0), ("t", 1.0, 0.001, 0.0)])
    legs = sorted(with_legs(df).collect(), key=lambda r: r.ts)
    assert legs[0].leg_m is None and legs[0].speed_mps is None
    assert legs[1].leg_m > 0


def _oracle_stays(pts, radius, dmin):
    ts = [p[0] for p in pts]; lons = [p[1] for p in pts]; lats = [p[2] for p in pts]
    out, i, n = [], 0, len(pts)
    while i < n:
        j = i
        while j < n and _hav(lons[i], lats[i], lons[j], lats[j]) <= radius:
            j += 1
        if j - i >= 2 and ts[j - 1] - ts[i] >= dmin:
            out.append((
                len(out), j - i,
                sum(lons[i:j]) / (j - i), sum(lats[i:j]) / (j - i),
                ts[i], ts[j - 1], ts[j - 1] - ts[i],
            ))
            i = j
        else:
            i += 1
    return out


def test_stay_points_vs_oracle(spark):
    rng = np.random.default_rng(33)
    pts, t = [], 0.0
    for cx, cy, dwell in [(10.0, 45.0, 900.0), (10.5, 45.2, 120.0), (11.0, 45.5, 1200.0)]:
        for _ in range(int(dwell // 60)):
            pts.append((t, cx + float(rng.normal(0, 0.0004)), cy + float(rng.normal(0, 0.0004))))
            t += 60.0
        # transit leg: fast, far apart
        for k in range(3):
            pts.append((t, cx + 0.1 + 0.1 * k, cy + 0.05 + 0.05 * k))
            t += 60.0
    df = _fixes_df(spark, [("v", ts, lon, lat) for ts, lon, lat in pts])
    got = [
        (r.stay_idx, r.n_fixes, r.lon, r.lat, r.ts_in, r.ts_out, r.dwell_s)
        for r in sorted(stay_points(df, radius_m=200.0, min_duration_s=600.0).collect(),
                        key=lambda r: r.stay_idx)
    ]
    want = _oracle_stays(pts, 200.0, 600.0)
    assert len(got) == len(want) == 2  # the 120 s cluster is below min dwell
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        for a, b in zip(g[2:], w[2:]):
            assert a == pytest.approx(b, rel=1e-9)


def test_stay_points_partition_invariance(spark):
    rng = np.random.default_rng(34)
    rows = []
    for v in range(4):
        t = 0.0
        for _ in range(30):
            rows.append((f"v{v}", t, 10.0 + float(rng.normal(0, 0.0005)),
                         45.0 + float(rng.normal(0, 0.0005))))
            t += 60.0
    a = sorted(map(tuple, stay_points(_fixes_df(spark, rows), radius_m=300.0,
                                      min_duration_s=300.0).collect()))
    b = sorted(map(tuple, stay_points(_fixes_df(spark, rows).repartition(7),
                                      radius_m=300.0, min_duration_s=300.0).collect()))
    assert a == b and len(a) == 4


def test_stay_points_validation(spark):
    df = _fixes_df(spark, [("t", 0.0, 0.0, 0.0)])
    with pytest.raises(ValueError):
        stay_points(df, radius_m=0.0, min_duration_s=1.0)
