"""PQ/ADC search: numpy-oracle exactness of the ADC math, recall vs the
exact cosine baseline on clustered data, re-rank restoration, codebook
round-trip, and the candidate-sized-exchange contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.quantization import (
    encode_pq,
    load_codebooks,
    pq_topk,
    rerank_exact,
    save_codebooks,
    train_pq,
)
from tilegrab_spark.operators.similarity import cosine_topk


def _clustered(n_per: int, n_clusters: int, d: int, seed: int = 7):
    """Unit-norm vectors in well-separated clusters."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)) * 5.0
    rows = []
    for c in range(n_clusters):
        pts = centers[c] + rng.normal(size=(n_per, d))
        for i, p in enumerate(pts):
            rows.append((c * n_per + i, [float(x) for x in p], c))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    rows = _clustered(40, 8, 32)
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int").persist()


def test_adc_matches_numpy_oracle(spark, corpus):
    """pq_topk's distances must equal the straight numpy ADC recompute
    (same codebooks, same codes) — the kernel math, not just ranking."""
    books = train_pq(corpus, m=4, nbits=4, sample=320, iters=6)
    codes = encode_pq(corpus, books)
    q_rows = [(0, corpus.filter(F.col("vec_id") == 5).first()["embedding"])]
    queries = spark.createDataFrame(q_rows, "query_id long, embedding array<float>")
    got = {
        r["vec_id"]: r["adc_dist"]
        for r in pq_topk(queries, codes, books, k=10).collect()
    }
    # oracle
    cpdf = codes.toPandas().set_index("vec_id")
    q = np.asarray(q_rows[0][1], dtype=np.float64)
    q = q / np.linalg.norm(q)
    m, _, dsub = books.shape
    for vid, dist in got.items():
        code = np.asarray(cpdf.loc[vid, "pq_code"])
        want = sum(
            ((q[j * dsub : (j + 1) * dsub] - books[j][code[j]]) ** 2).sum()
            for j in range(m)
        )
        assert abs(dist - want) < 1e-9


def test_recall_vs_exact_on_clusters(spark, corpus):
    books = train_pq(corpus, m=8, nbits=6, sample=320, iters=8)
    codes = encode_pq(corpus, books)
    q_rows = [
        (i, r["embedding"])
        for i, r in enumerate(corpus.orderBy("vec_id").limit(12).collect())
    ]
    queries = spark.createDataFrame(q_rows, "query_id long, embedding array<float>")
    exact = cosine_topk(queries, corpus, k=10)
    approx = pq_topk(queries, codes, books, k=10)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # raw ADC recall on NEAR-IDENTICAL within-cluster neighbors is the
    # hard case (fine ordering below the quantization noise floor) —
    # the re-rank test below shows how full accuracy is restored
    assert recall >= 0.5, f"recall@10 {recall}"
    # the structurally meaningful bar: every ADC hit must land in the
    # query's own (well-separated) cluster
    labels = {r["vec_id"]: r["label"] for r in corpus.collect()}
    qlab = {i: labels[r[0]] for i, r in enumerate(
        [(row["vec_id"],) for row in corpus.orderBy("vec_id").limit(12).collect()]
    )}
    for r in approx.collect():
        assert labels[r["vec_id"]] == qlab[r["query_id"]]
    # self-match: each query IS a corpus vector -> its own id must rank 1
    top1 = {
        r["query_id"]: r["vec_id"]
        for r in approx.filter(F.col("rank") == 1).collect()
    }
    self_hits = sum(1 for q, v in top1.items() if q == v)
    assert self_hits >= 10


def test_rerank_restores_exact_topk(spark, corpus):
    books = train_pq(corpus, m=4, nbits=6, sample=320, iters=8)
    codes = encode_pq(corpus, books)
    q_rows = [(i, r["embedding"]) for i, r in enumerate(corpus.limit(6).collect())]
    queries = spark.createDataFrame(q_rows, "query_id long, embedding array<float>")
    cand = pq_topk(queries, codes, books, k=50)  # wide candidate set
    rer = rerank_exact(cand, queries, corpus, k=5)
    exact = cosine_topk(queries, corpus, k=5)
    e = {(r["query_id"], r["vec_id"], r["rank"]) for r in exact.collect()}
    g = {(r["query_id"], r["vec_id"], r["rank"]) for r in rer.collect()}
    # with candidates this wide on 320 rows, re-rank == exact
    assert len(e & g) / len(e) >= 0.95


def test_codebook_roundtrip(spark, corpus, tmp_path):
    books = train_pq(corpus, m=4, nbits=4, sample=160, iters=3)
    save_codebooks(spark, books, str(tmp_path / "cb"))
    back = load_codebooks(spark, str(tmp_path / "cb"))
    assert back.shape == books.shape
    assert np.allclose(back, books)


def test_encode_deterministic_across_partitioning(spark, corpus):
    books = train_pq(corpus, m=4, nbits=4, sample=160, iters=3)
    a = {r["vec_id"]: list(r["pq_code"]) for r in encode_pq(corpus, books).collect()}
    b = {
        r["vec_id"]: list(r["pq_code"])
        for r in encode_pq(corpus.repartition(17), books).collect()
    }
    assert a == b


def test_real_embeddings_table_smoke(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = train_pq(emb, m=8, nbits=5, sample=256, iters=4)
    codes = encode_pq(emb, books)
    assert codes.first()["pq_code"] is not None and len(codes.first()["pq_code"]) == 8
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq_topk(queries, codes, books, k=5)
    rows = out.collect()
    assert len(rows) == 15
    top1 = {r["query_id"]: r["vec_id"] for r in rows if r["rank"] == 1}
    assert sum(1 for q, v in top1.items() if q == v) >= 2


def test_validation(spark, corpus):
    with pytest.raises(ValueError):
        train_pq(corpus, m=0)
    with pytest.raises(ValueError):
        train_pq(corpus, m=4, nbits=13)
    with pytest.raises(ValueError):
        train_pq(corpus, m=5)  # 32 % 5 != 0
    books = train_pq(corpus, m=4, nbits=4, sample=64, iters=2)
    with pytest.raises(ValueError):
        pq_topk(
            spark.createDataFrame([], "query_id long, embedding array<float>"),
            encode_pq(corpus, books),
            books,
        )


def test_ivfpq_index_end_to_end(spark, corpus, tmp_path):
    from tilegrab_spark.operators.quantization import (
        build_ivfpq_index,
        search_ivfpq_index,
    )

    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(
        corpus, path, n_centroids=8, m=8, nbits=6, sample=320, iters=6
    )
    q_rows = [(i, r["embedding"]) for i, r in enumerate(corpus.limit(6).collect())]
    queries = spark.createDataFrame(q_rows, "query_id long, embedding array<float>")
    # partition pruning reaches the scan
    out = search_ivfpq_index(spark, path, queries, k=5, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    rows = out.collect()
    assert len(rows) == 30
    top1 = {r["query_id"]: r["vec_id"] for r in rows if r["rank"] == 1}
    assert sum(1 for q, v in top1.items() if q == v) >= 5
    # re-ranked search returns exact-cosine ordering within candidates
    rer = search_ivfpq_index(spark, path, queries, k=5, n_probe=4, rerank=40)
    assert {r["query_id"] for r in rer.collect()} == set(range(6))
    assert "cosine" in rer.columns


def test_ivfpq_rerank_requires_vectors(spark, corpus, tmp_path):
    from tilegrab_spark.operators.quantization import (
        build_ivfpq_index,
        search_ivfpq_index,
    )

    path = str(tmp_path / "ivfpq_novec")
    build_ivfpq_index(
        corpus, path, n_centroids=4, m=4, nbits=4, sample=160, iters=3,
        keep_vectors=False,
    )
    q_rows = [(0, corpus.first()["embedding"])]
    queries = spark.createDataFrame(q_rows, "query_id long, embedding array<float>")
    assert search_ivfpq_index(spark, path, queries, k=3, n_probe=2).count() == 3
    with pytest.raises(ValueError, match="keep_vectors"):
        search_ivfpq_index(spark, path, queries, k=3, n_probe=2, rerank=10)
