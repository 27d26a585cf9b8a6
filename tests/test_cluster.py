"""grid_dbscan vs a brute-force numpy DBSCAN oracle."""

import math

import numpy as np
import pytest

from tilegrab_spark.operators.cluster import cluster_summary, grid_dbscan
from tilegrab_spark.operators.dedup import release_signature_caches

R = 6378137.0


def _merc(lon, lat):
    return (
        R * math.radians(lon),
        R * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2)),
    )


def _oracle(points, eps, min_pts):
    """Brute-force DBSCAN with the engine's stated conventions:
    neighborhood includes self; cluster label = min core id of the
    core-graph component; border -> min cluster among core neighbors."""
    ids = sorted(points)
    xy = np.array([_merc(*points[i]) for i in ids])
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    nbr = d2 <= eps * eps
    cnt = nbr.sum(1)
    core = cnt >= min_pts

    parent = list(range(len(ids)))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if core[i] and core[j] and nbr[i, j]:
                parent[find(i)] = find(j)
    comp_label = {}
    for i in range(len(ids)):
        if core[i]:
            r = find(i)
            comp_label[r] = min(comp_label.get(r, ids[i]), ids[i])
    out = {}
    for i in range(len(ids)):
        if core[i]:
            out[ids[i]] = (True, comp_label[find(i)])
        else:
            labs = [comp_label[find(j)] for j in range(len(ids)) if core[j] and nbr[i, j]]
            out[ids[i]] = (False, min(labs) if labs else None)
    return out


def _points_two_clumps():
    rng = np.random.default_rng(11)
    pts = {}
    pid = 0
    for cx, cy in [(10.0, 45.0), (10.6, 45.3)]:
        for _ in range(25):
            pts[pid] = (cx + rng.normal(0, 0.02), cy + rng.normal(0, 0.02))
            pid += 1
    for _ in range(12):  # scattered noise
        pts[pid] = (float(rng.uniform(8, 12)), float(rng.uniform(43, 47)))
        pid += 1
    return pts


def _run(spark, pts, eps, min_pts):
    df = spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat) in pts.items()],
        "point_id long, lon double, lat double",
    )
    try:
        got = grid_dbscan(df, eps_m=eps, min_pts=min_pts).collect()
    finally:
        release_signature_caches()
    return {r.point_id: (r.is_core, r.cluster) for r in got}


@pytest.mark.parametrize("min_pts", [1, 4, 8])
def test_dbscan_vs_oracle(spark, min_pts):
    pts = _points_two_clumps()
    eps = 12000.0  # ~0.1 deg lon at the equator, mercator meters
    assert _run(spark, pts, eps, min_pts) == _oracle(pts, eps, min_pts)


def test_two_clumps_are_two_clusters(spark):
    pts = _points_two_clumps()
    got = _run(spark, pts, 12000.0, 4)
    clusters = {c for _, c in got.values() if c is not None}
    # the two clumps are ~60 km apart at eps 12 km -> distinct labels
    assert len(clusters) >= 2
    lab0 = {i: c for i, (_, c) in got.items() if i < 25}
    lab1 = {i: c for i, (_, c) in got.items() if 25 <= i < 50}
    assert len(set(lab0.values())) == 1 and len(set(lab1.values())) == 1
    assert set(lab0.values()) != set(lab1.values())


def test_all_noise_when_minpts_high(spark):
    pts = {i: (float(i), 0.0) for i in range(6)}  # 1 degree apart
    got = _run(spark, pts, 1000.0, 2)
    assert all(c is None and not core for core, c in got.values())


def test_chain_links_into_one_cluster(spark):
    # points spaced 0.9*eps in a line: interior points core (3 nbrs),
    # ends border -> a single cluster labeled by the min id
    step_m = 9000.0
    step_deg = math.degrees(step_m / R)
    pts = {i: (i * step_deg, 0.0) for i in range(8)}
    got = _run(spark, pts, 10000.0, 3)
    assert got == _oracle(pts, 10000.0, 3)
    # one cluster; its label is the MIN CORE id (1 — the ends are border)
    assert {c for _, c in got.values()} == {1}


def test_duplicate_coordinates(spark):
    pts = {0: (10.0, 45.0), 1: (10.0, 45.0), 2: (10.0, 45.0), 3: (11.5, 45.0)}
    got = _run(spark, pts, 5000.0, 3)
    assert got == _oracle(pts, 5000.0, 3)
    assert got[0] == (True, 0) and got[3] == (False, None)


def test_partition_invariance(spark):
    pts = _points_two_clumps()
    df = spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat) in pts.items()],
        "point_id long, lon double, lat double",
    ).repartition(7)
    try:
        got = {
            r.point_id: (r.is_core, r.cluster)
            for r in grid_dbscan(df, eps_m=12000.0, min_pts=4).collect()
        }
    finally:
        release_signature_caches()
    assert got == _oracle(pts, 12000.0, 4)


def test_cluster_summary(spark):
    pts = _points_two_clumps()
    df = spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat) in pts.items()],
        "point_id long, lon double, lat double",
    )
    try:
        labeled = grid_dbscan(df, eps_m=12000.0, min_pts=4)
        rows = {r.cluster: r for r in cluster_summary(labeled).collect()}
    finally:
        release_signature_caches()
    want = _oracle(pts, 12000.0, 4)
    for cl, r in rows.items():
        members = [i for i, (_, c) in want.items() if c == cl]
        assert r.n_points == len(members)
        assert r.n_core == sum(1 for i in members if want[i][0])
        assert r.min_lon == pytest.approx(min(pts[i][0] for i in members))
        assert r.max_lat == pytest.approx(max(pts[i][1] for i in members))


def test_validation(spark):
    df = spark.createDataFrame([(0, 0.0, 0.0)], "point_id long, lon double, lat double")
    with pytest.raises(ValueError):
        grid_dbscan(df, eps_m=0.0, min_pts=1)
    with pytest.raises(ValueError):
        grid_dbscan(df, eps_m=1.0, min_pts=0)


# ---------------------------------------------------------------- ST-DBSCAN

def _oracle_st(points, eps, min_pts, eps_t):
    """Brute force with the spatiotemporal predicate: spatial dist <=
    eps AND |dt| <= eps_t. points: id -> (lon, lat, t)."""
    ids = sorted(points)
    xy = np.array([_merc(points[i][0], points[i][1]) for i in ids])
    t = np.array([points[i][2] for i in ids])
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    nbr = (d2 <= eps * eps) & (np.abs(t[:, None] - t[None, :]) <= eps_t)
    cnt = nbr.sum(1)
    core = cnt >= min_pts
    parent = list(range(len(ids)))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if core[i] and core[j] and nbr[i, j]:
                parent[find(i)] = find(j)
    comp_label = {}
    for i in range(len(ids)):
        if core[i]:
            r = find(i)
            comp_label[r] = min(comp_label.get(r, ids[i]), ids[i])
    out = {}
    for i in range(len(ids)):
        if core[i]:
            out[ids[i]] = (True, comp_label[find(i)])
        else:
            labs = [comp_label[find(j)] for j in range(len(ids)) if core[j] and nbr[i, j]]
            out[ids[i]] = (False, min(labs) if labs else None)
    return out


def _weekly_market():
    """One square, three weekly episodes + drifting noise: spatially a
    single clump, temporally three."""
    rng = np.random.default_rng(5)
    pts = {}
    pid = 0
    for week, t0 in enumerate([0.0, 7 * 86400.0, 14 * 86400.0]):
        for _ in range(15):
            pts[pid] = (
                10.0 + rng.normal(0, 0.01),
                45.0 + rng.normal(0, 0.01),
                t0 + float(rng.uniform(0, 14400)),
            )
            pid += 1
    for k in range(10):
        pts[pid] = (
            float(rng.uniform(9.5, 10.5)),
            float(rng.uniform(44.5, 45.5)),
            float(rng.uniform(0, 15 * 86400)),
        )
        pid += 1
    return pts


def _run_st(spark, pts, eps, min_pts, eps_t):
    df = spark.createDataFrame(
        [(i, lon, lat, t) for i, (lon, lat, t) in pts.items()],
        "point_id long, lon double, lat double, ts double",
    )
    try:
        got = grid_dbscan(
            df, eps_m=eps, min_pts=min_pts, ts_col="ts", eps_t=eps_t
        ).collect()
    finally:
        release_signature_caches()
    return {r.point_id: (r.is_core, r.cluster) for r in got}


@pytest.mark.parametrize("min_pts", [1, 4, 8])
def test_st_dbscan_vs_oracle(spark, min_pts):
    pts = _weekly_market()
    got = _run_st(spark, pts, 6000.0, min_pts, 86400.0)
    assert got == _oracle_st(pts, 6000.0, min_pts, 86400.0)


def test_weekly_market_splits_into_episodes(spark):
    pts = _weekly_market()
    st = _run_st(spark, pts, 6000.0, 5, 86400.0)
    episodes = {c for _, c in st.values() if c is not None}
    assert len(episodes) == 3  # one cluster per week
    # purely spatial on the same rows: one smeared cluster
    flat = {i: (lon, lat) for i, (lon, lat, _) in pts.items()}
    sp = _run(spark, flat, 6000.0, 5)
    assert len({c for _, c in sp.values() if c is not None}) == 1


def test_st_validation(spark):
    df = spark.createDataFrame([(0, 10.0, 45.0, 0.0)], "point_id long, lon double, lat double, ts double")
    with pytest.raises(ValueError, match="together"):
        grid_dbscan(df, eps_m=10.0, min_pts=2, ts_col="ts")
    with pytest.raises(ValueError, match="together"):
        grid_dbscan(df, eps_m=10.0, min_pts=2, eps_t=60.0)
    with pytest.raises(ValueError, match="eps_t"):
        grid_dbscan(df, eps_m=10.0, min_pts=2, ts_col="ts", eps_t=0.0)
