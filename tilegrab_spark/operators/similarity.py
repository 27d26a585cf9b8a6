"""Similarity search over an embedding column (`array<float>`).

- ``cosine_topk``: exact brute-force top-k — broadcast the (small) query
  side against the corpus, dot products as native higher-order functions
  (``zip_with`` + ``aggregate``: JVM-side, no Python), ``row_number``
  window for the top-k. The baseline and the correctness oracle.
- ``ann_topk_ivf``: the scale path — IVF-style coarse quantization.
  Centroids come from a deterministic k-means (a few distributed
  Arrow-UDF Lloyd iterations); corpus rows are assigned to their nearest
  centroid (inverted lists = a partitioning of the table); a query only
  scans its ``n_probe`` nearest lists. At 10^12 rows the inverted lists
  are the pruned partitions of the embedding table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _normalized(df: DataFrame, id_col: str, vec_col: str, out_id: str) -> DataFrame:
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, v: a + v * v))
    return df.select(
        F.col(id_col).alias(out_id),
        F.transform(vec_col, lambda v: v / norm).alias(f"{out_id}_v"),
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 10,
    q_id: str = "query_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank<=k).

    Broadcast-nested-loop join of normalized queries x corpus with the
    dot product as a native expression; Catalyst keeps it in codegen.
    """
    q = _normalized(queries, q_id, q_vec, "query_id")
    c = _normalized(corpus, c_id, c_vec, "vec_id")
    dot = F.aggregate(
        F.zip_with("query_id_v", "vec_id_v", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = F.broadcast(q).crossJoin(c).withColumn("cosine", dot)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------

def _probe_lists_udf(centroids: np.ndarray, n_probe: int, session=None):
    """Arrow kernel: vector -> its n_probe nearest centroid (list) ids.
    Shared by the per-query probe in ann_topk_ivf and the distributed
    probe-set derivation in search_ivf_index.  ``session`` should be the
    caller's (e.g. ``queries.sparkSession``) — getActiveSession() can be
    None in worker threads (round-3 review finding)."""
    from pyspark.sql import SparkSession

    session = session or SparkSession.getActiveSession()
    bc = session.sparkContext.broadcast(centroids)

    @F.pandas_udf("array<int>")
    def probe_lists(vecs: pd.Series) -> pd.Series:
        C = bc.value
        X = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(X @ C.T), axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    return probe_lists

def train_centroids(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 5,
    seed: int = 42,
    sample: int = 4096,
) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (centroid count
    is tiny; training on a bounded sample is the standard IVF recipe —
    the full corpus is only ever *assigned*, never iterated).

    The sample is an ordered hash-top-k (``TakeOrderedAndProject``: each
    partition keeps its best ``sample`` rows by xxhash64 of the vector,
    the driver merges) — deterministic across partition layouts, unlike a
    bare ``limit`` whose row choice depends on partition order."""
    pdf = (
        corpus.select(F.col(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col("_v").cast("array<float>")))
        .limit(sample)
        .toPandas()
        .rename(columns={"_v": vec_col})
    )
    X = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        sim = X @ cent.T
        assign = sim.argmax(axis=1)
        for j in range(len(cent)):
            m = assign == j
            if m.any():
                v = X[m].mean(axis=0)
                cent[j] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def kmeans_refine(
    corpus: DataFrame,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    iters: int = 3,
) -> np.ndarray:
    """Distributed Lloyd refinement of ``centroids`` over the FULL
    corpus (spherical k-means: centroids re-normalized each round).

    The 100 TB shape: per iteration the centroid table BROADCASTs into
    one Arrow pass that emits, per Arrow batch, the k partial
    (sum-vector, count) pairs — so the one exchange per round carries
    at most ``k × n_partition_batches`` rows of width d, never the
    corpus. No vector ever shuffles; the driver reduces k rows.

    Complements :func:`train_centroids` (sample-based init, the
    standard IVF recipe): refine when assignment quality matters beyond
    what a 4k-row sample pins down, e.g. SemDeDup-style cluster-scoped
    dedup where cluster boundaries decide candidate scope.  Returns the
    refined (k, d) unit-norm array; empty clusters keep their previous
    centroid (the deterministic convention the oracle test mirrors)."""
    k, d = centroids.shape
    cent = centroids.astype(np.float64).copy()
    sess = corpus.sparkSession
    vecs_only = corpus.select(F.col(vec_col).alias("_v")).where(
        F.col("_v").isNotNull()
    )

    out_schema = (
        "list_id int, n long, s array<double>"
    )

    for _ in range(iters):
        bc = sess.sparkContext.broadcast(cent)

        def partials(batches, _bc=bc):
            import pandas as _pd

            C = _bc.value
            for pdf in batches:
                X = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
                )
                if len(X) == 0:
                    continue
                Xn = X / np.maximum(
                    np.linalg.norm(X, axis=1, keepdims=True), 1e-12
                )
                assign = (Xn @ C.T).argmax(axis=1)
                ids, inv = np.unique(assign, return_inverse=True)
                sums = np.zeros((len(ids), Xn.shape[1]))
                np.add.at(sums, inv, Xn)
                cnt = np.bincount(inv, minlength=len(ids))
                yield _pd.DataFrame(
                    {
                        "list_id": ids.astype(np.int32),
                        "n": cnt.astype(np.int64),
                        "s": list(sums),
                    }
                )

        part = vecs_only.mapInPandas(partials, out_schema)
        # element-wise sum via posexplode -> (list_id, pos) keys: the
        # expression count stays constant in d, and the partial_sum
        # combines map-side so the exchange carries <= k*d rows total
        sums = (
            part.select(
                "list_id", "n", F.posexplode("s").alias("pos", "val")
            )
            .groupBy("list_id", "pos")
            .agg(
                F.sum("val").alias("sv"),
                # n repeats once per pos; divide back out after explode
                F.sum("n").alias("nn"),
            )
            .collect()
        )
        new = cent.copy()
        acc = np.zeros((k, d))
        cnt = np.zeros(k, dtype=np.int64)
        for r in sums:
            acc[r["list_id"], r["pos"]] = r["sv"]
            cnt[r["list_id"]] = max(cnt[r["list_id"]], r["nn"])
        for j in range(k):
            if cnt[j] > 0:
                new[j] = acc[j] / max(np.linalg.norm(acc[j]), 1e-12)
        cent = new
    return cent


def assign_lists(
    corpus: DataFrame, centroids: np.ndarray, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Add ``list_id`` = nearest centroid — one vectorized Arrow pass."""
    bc = corpus.sparkSession.sparkContext.broadcast(centroids)

    @F.pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        C = bc.value
        X = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series((X @ C.T).argmax(axis=1).astype(np.int32))

    return corpus.withColumn("list_id", nearest(F.col(vec_col)))


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    *,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **train_kw,
) -> np.ndarray:
    """Materialize the IVF index as a ``list_id``-partitioned parquet
    table (+ a `_centroids` side table). At 10^12 rows the inverted lists
    ARE the physical partitions — a query's n_probe lists prune to
    n_probe/n_centroids of the data on disk."""
    cents = train_centroids(corpus, vec_col=vec_col, n_centroids=n_centroids, **train_kw)
    assigned = assign_lists(corpus, cents, id_col=id_col, vec_col=vec_col)
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(f"{path}/lists")
    spark = corpus.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(cents)],
        "list_id int, centroid array<double>",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(f"{path}/_centroids")
    return cents


def load_ivf_centroids(spark, path: str) -> np.ndarray:
    pdf = spark.read.parquet(f"{path}/_centroids").orderBy("list_id").toPandas()
    return np.array([np.asarray(v, dtype=np.float64) for v in pdf["centroid"]])


def append_to_ivf_index(
    batch: DataFrame,
    path: str,
    batch_id: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incremental index maintenance — fold a new embedding batch into
    the on-disk IVF index WITHOUT rebuilding (the 10^12-row table grows
    daily; re-clustering the corpus per day is the naive cost this
    avoids). Centroids stay FROZEN from the initial build, so
    assignment is a pure function of the vector and the appended index
    is bit-identical to a from-scratch ``assign_lists`` over the union
    with the same centroids (the rebuild-equality oracle in tests).

    Deltas land in ``lists_delta`` partitioned by
    ``(ingest_batch, list_id)`` with DYNAMIC partition overwrite —
    re-running a batch id overwrites exactly its own partitions, so
    foreachBatch re-delivery is idempotent with no side store.
    ``search_ivf_index`` unions base + deltas; the ``list_id``
    partition level keeps probe pruning intact in both. Returns the
    number of rows appended.

    Frozen centroids drift as the distribution shifts — watch
    ``ivf_list_stats`` for imbalance and rebuild (or
    ``kmeans_refine``) when a list runs hot.
    """
    cents = load_ivf_centroids(batch.sparkSession, path)
    assigned = assign_lists(batch, cents, id_col=id_col, vec_col=vec_col)
    n = assigned.count()
    (
        assigned.withColumn("ingest_batch", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch", "list_id")
        .parquet(f"{path}/lists_delta")
    )
    return n


def _read_index_lists(spark, path: str) -> DataFrame:
    """Base lists + any appended deltas (columns equalized; ``list_id``
    is a partition column in both reads, so probe filters prune)."""
    base = spark.read.parquet(f"{path}/lists")
    import os

    delta_dir = f"{path}/lists_delta"
    if os.path.isdir(delta_dir):
        delta = spark.read.parquet(delta_dir).drop("ingest_batch")
        base = base.unionByName(delta.select(*base.columns))
    return base


def ivf_list_stats(spark, path: str) -> DataFrame:
    """Per-list row counts over base + deltas — the balance report that
    tells you when frozen centroids have drifted (a hot list = slow
    probes) and a re-cluster is due. One map-side-combinable agg."""
    return _read_index_lists(spark, path).groupBy("list_id").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )


def search_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    *,
    k: int = 10,
    n_probe: int = 4,
    q_id: str = "query_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Search the on-disk index: the union of all probed lists for this
    query batch becomes a partition filter (`list_id IN (...)`) — the
    scan touches only those directories.

    The probe set is derived DISTRIBUTIVELY: the same ``probe_lists``
    kernel that ann_topk_ivf applies per query runs as a distributed
    aggregate here, and only the distinct list ids (≤ n_centroids ints)
    come back to the driver — never the query embeddings themselves, so
    a large query batch doesn't round-trip its vectors."""
    cents = load_ivf_centroids(spark, path)
    probed_rows = (
        queries.select(
            F.explode(
                _probe_lists_udf(cents, n_probe, queries.sparkSession)(F.col(q_vec))
            ).alias("list_id")
        )
        .agg(F.collect_set("list_id").alias("_lists"))
        .collect()
    )
    probed = sorted(int(v) for v in (probed_rows[0]["_lists"] if probed_rows else []))
    lists = _read_index_lists(spark, path).filter(
        F.col("list_id").isin(probed)  # -> parquet PartitionFilters
    )
    return ann_topk_ivf(
        queries, lists, cents, k=k, n_probe=n_probe,
        q_id=q_id, q_vec=q_vec, c_id=c_id, c_vec=c_vec,
    )


def ann_topk_ivf(
    queries: DataFrame,
    corpus_with_lists: DataFrame,
    centroids: np.ndarray,
    *,
    k: int = 10,
    n_probe: int = 4,
    q_id: str = "query_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: each query scans only its n_probe nearest
    inverted lists. corpus_with_lists = assign_lists(corpus, centroids)
    (persist/write it once, reuse across query batches)."""
    probe_lists = _probe_lists_udf(centroids, n_probe, queries.sparkSession)

    q = _normalized(queries, q_id, q_vec, "query_id").withColumn(
        "list_id",
        F.explode(probe_lists(F.col("query_id_v").cast("array<float>"))),
    )
    cnorm = F.sqrt(F.aggregate(c_vec, F.lit(0.0), lambda a, v: a + v * v))
    c = corpus_with_lists.select(
        F.col(c_id).alias("vec_id"),
        F.transform(c_vec, lambda v: v / cnorm).alias("vec_id_v"),
        "list_id",
    )
    dot = F.aggregate(
        F.zip_with("query_id_v", "vec_id_v", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = F.broadcast(q).join(c, on="list_id").withColumn("cosine", dot)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
