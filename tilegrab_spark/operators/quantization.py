"""Product quantization (PQ) for embedding search at corpus scale.

IVF (``operators/similarity.py``) prunes WHICH rows a query scans; PQ
compresses WHAT each scanned row costs. A d=128 float32 embedding is
512 bytes; its PQ code is ``m`` bytes (64x smaller at m=8): at 10^12
rows the full code table is ~8 TB — scannable — where the raw vectors
(~0.5 PB) are not. This is the standard IVF-PQ recipe (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

How it maps to Spark:

- **train** (``train_pq``): split the vector into ``m`` subspaces, run
  k-means per subspace on a bounded DETERMINISTIC driver-side sample
  (ordered hash-top-k, same recipe as ``similarity.train_centroids``;
  codebooks are tiny — m x 2^nbits x d/m floats). The corpus is only
  ever ENCODED, never iterated.
- **encode** (``encode_pq``): one vectorized Arrow pass; each vector
  becomes ``array<smallint>`` of length m (subspace centroid ids).
  Persist the code table once; it replaces the vectors for search.
- **search** (``pq_topk``): asymmetric distance computation (ADC). Each
  query precomputes an m x 2^nbits lookup table of exact
  query-subvector -> centroid distances (driver-side numpy: queries are
  the small side, LUTs are Q x m x 2^nbits floats, broadcast). The
  corpus pass is then pure table lookups + adds over the code columns —
  ``mapInPandas`` with per-batch partial top-k, so the exchange carries
  ``partitions x Q x k`` candidate rows, never the corpus. A final
  window takes the global top-k.
- **re-rank** (``rerank_exact``): the standard accuracy restorer — take
  the PQ top-R candidate ids (output-sized), join back to the raw
  vectors (a pointed lookup, broadcast-able), score exactly, keep k.

Distances are squared L2 over L2-NORMALIZED vectors, so ranking is
equivalent to cosine ranking (||a-b||^2 = 2 - 2cos on the unit sphere)
and results are directly comparable to ``cosine_topk`` — which is what
``tests/test_quantization.py`` measures recall against.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F, types as T

__all__ = [
    "train_pq",
    "encode_pq",
    "pq_topk",
    "rerank_exact",
    "save_codebooks",
    "load_codebooks",
    "build_ivfpq_index",
    "search_ivfpq_index",
]


def _sample_matrix(corpus: DataFrame, vec_col: str, sample: int) -> np.ndarray:
    """Deterministic bounded sample as an (n, d) unit-norm matrix —
    ordered hash-top-k, stable across partition layouts."""
    pdf = (
        corpus.select(F.col(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col("_v").cast("array<float>")))
        .limit(sample)
        .toPandas()
    )
    X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def train_pq(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 8,
    iters: int = 10,
    seed: int = 42,
    sample: int = 4096,
) -> np.ndarray:
    """Codebooks of shape ``(m, 2^nbits, d/m)`` — per-subspace k-means
    on the deterministic sample. ``d`` must be divisible by ``m``;
    ``nbits <= 12`` keeps the ADC LUT cache-resident."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    if not 1 <= nbits <= 12:
        raise ValueError(f"nbits must be in [1, 12], got {nbits}")
    X = _sample_matrix(corpus, vec_col, sample)
    d = X.shape[1]
    if d % m != 0:
        raise ValueError(f"vector dim {d} not divisible by m={m}")
    dsub, ncent = d // m, 1 << nbits
    rng = np.random.default_rng(seed)
    books = np.empty((m, ncent, dsub))
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        cent = S[rng.choice(len(S), min(ncent, len(S)), replace=False)]
        if len(cent) < ncent:  # tiny sample: pad by repeating
            cent = cent[rng.integers(0, len(cent), ncent)]
        for _ in range(iters):
            d2 = ((S[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ncent):
                mask = assign == c
                if mask.any():
                    cent[c] = S[mask].mean(axis=0)
        books[j] = cent
    return books


def encode_pq(
    df: DataFrame,
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple = (),
) -> DataFrame:
    """``[id_col, *keep_cols, pq_code]`` — each vector L2-normalized and
    mapped to its per-subspace nearest centroid ids (one Arrow pass).
    The code column is the m-byte representation the search scans."""
    from tilegrab_spark.operators.dedup import _with_min_parallelism

    df = _with_min_parallelism(df)  # single-file scan -> serial encode otherwise
    m, _, dsub = codebooks.shape
    bc = df.sparkSession.sparkContext.broadcast(codebooks)

    @F.pandas_udf("array<smallint>")
    def encode(vecs: pd.Series) -> pd.Series:
        B = bc.value
        X = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(X), m), dtype=np.int16)
        for j in range(m):
            S = X[:, j * dsub : (j + 1) * dsub]
            # ||s-c||^2 = ||s||^2 - 2 s.c + ||c||^2; argmin drops ||s||^2
            d2 = (B[j] ** 2).sum(axis=1)[None, :] - 2.0 * (S @ B[j].T)
            codes[:, j] = d2.argmin(axis=1).astype(np.int16)
        return pd.Series(list(codes))

    return df.select(id_col, *keep_cols, encode(F.col(vec_col)).alias("pq_code"))


def _query_luts(queries_pdf: pd.DataFrame, q_vec: str, codebooks: np.ndarray) -> np.ndarray:
    """(Q, m, 2^nbits) exact squared-L2 tables: LUT[q, j, c] =
    ||query_subvec - codebook[j, c]||^2 on normalized queries."""
    m, ncent, dsub = codebooks.shape
    Xq = np.array([np.asarray(v, dtype=np.float64) for v in queries_pdf[q_vec]])
    Xq = Xq / np.maximum(np.linalg.norm(Xq, axis=1, keepdims=True), 1e-12)
    luts = np.empty((len(Xq), m, ncent))
    for j in range(m):
        S = Xq[:, j * dsub : (j + 1) * dsub]
        luts[:, j, :] = ((S[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
    return luts


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: np.ndarray,
    *,
    k: int = 10,
    q_id: str = "query_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
) -> DataFrame:
    """ADC top-k over the code table: ``[query_id, vec_id, adc_dist,
    rank]`` (ascending distance; ties broken by vec_id — deterministic).
    Queries are the broadcast side (their LUTs, Q x m x 2^nbits
    doubles); the code-table pass emits only per-partition top-k rows,
    so the single exchange is candidate-sized."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from tilegrab_spark.operators.dedup import _with_min_parallelism

    codes = _with_min_parallelism(codes)  # single-file scan -> serial ADC otherwise
    qpdf = queries.select(q_id, q_vec).toPandas()
    if qpdf.empty:
        raise ValueError("queries is empty")
    luts = _query_luts(qpdf, q_vec, codebooks)
    qids = qpdf[q_id].to_numpy()
    m = codebooks.shape[0]
    bc = codes.sparkSession.sparkContext.broadcast((qids, luts))

    id_field = codes.schema[c_id]
    out_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[q_id].dataType, True),
            T.StructField("vec_id", id_field.dataType, True),
            T.StructField("adc_dist", T.DoubleType(), False),
        ]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, L = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.stack(pdf["pq_code"].to_numpy()).astype(np.int64)  # (B, m)
            acc = np.zeros((len(ids), len(C)))
            for j in range(m):
                acc += L[:, j, :][:, C[:, j]]
            top = min(k, acc.shape[1])
            idx = np.argpartition(acc, top - 1, axis=1)[:, :top]  # (Q, top)
            rows = {
                "query_id": np.repeat(ids, top),
                "vec_id": pdf[c_id].to_numpy()[idx.ravel()],
                "adc_dist": np.take_along_axis(acc, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    cand = codes.select(c_id, "pq_code").mapInPandas(scan, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_dist", "rank")
    )


def rerank_exact(
    pq_candidates: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 10,
    q_id: str = "query_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact-cosine re-rank of a PQ candidate list (run ``pq_topk`` with
    a larger k=R first): candidates join back to the raw vectors — a
    broadcast pointed lookup, the candidate list is output-sized — and
    the exact scores pick the final top-k. Standard IVF-PQ + re-rank."""
    from tilegrab_spark.operators.similarity import _normalized

    qn = _normalized(queries, q_id, q_vec, "query_id")
    cn = _normalized(corpus, c_id, c_vec, "vec_id")
    cand = pq_candidates.select("query_id", "vec_id")
    vecs = cn.join(F.broadcast(cand.select("vec_id").distinct()), "vec_id")
    dot = F.aggregate(
        F.zip_with("query_id_v", "vec_id_v", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        cand.join(F.broadcast(qn), "query_id")
        .join(vecs, "vec_id")
        .withColumn("cosine", dot)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def save_codebooks(spark, codebooks: np.ndarray, path: str) -> None:
    m, ncent, dsub = codebooks.shape
    rows = [
        (j, c, [float(x) for x in codebooks[j, c]])
        for j in range(m)
        for c in range(ncent)
    ]
    spark.createDataFrame(
        rows, "subspace int, centroid_id int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_codebooks(spark, path: str) -> np.ndarray:
    pdf = spark.read.parquet(path).orderBy("subspace", "centroid_id").toPandas()
    m = int(pdf["subspace"].max()) + 1
    ncent = int(pdf["centroid_id"].max()) + 1
    dsub = len(pdf["centroid"].iloc[0])
    out = np.empty((m, ncent, dsub))
    for r in pdf.itertuples(index=False):
        out[r.subspace, r.centroid_id] = np.asarray(r.centroid)
    return out


# ---------------------------------------------------------------------------
# Composed IVF-PQ index: coarse lists prune WHICH rows, PQ compresses WHAT
# each scanned row costs. The persisted layout at 10^12 rows:
#   path/codes      — (vec_id, pq_code[, embedding]) partitioned by list_id
#   path/_centroids — the coarse quantizer (similarity.py format)
#   path/_codebooks — the PQ codebooks (save_codebooks format)
# A query batch prunes to its probed list directories (parquet
# PartitionFilters), ADC-scans only those codes, and (optionally)
# re-ranks its candidate ids against the raw vectors stored alongside —
# a pointed lookup into the same pruned partitions.
# ---------------------------------------------------------------------------


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    *,
    n_centroids: int = 16,
    m: int = 8,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vectors: bool = True,
    **train_kw,
) -> tuple:
    """Train coarse centroids + PQ codebooks, encode, and persist the
    list-partitioned code table. ``keep_vectors=True`` stores the raw
    vector next to its code so re-rank is a pruned-partition lookup (at
    10^12 rows set False and serve re-ranks from the primary store).
    Returns (centroids, codebooks)."""
    from tilegrab_spark.operators.similarity import assign_lists, train_centroids

    spark = corpus.sparkSession
    cents = train_centroids(
        corpus, vec_col=vec_col, n_centroids=n_centroids, **train_kw
    )
    books = train_pq(corpus, vec_col=vec_col, m=m, nbits=nbits, **train_kw)
    assigned = assign_lists(corpus, cents, id_col=id_col, vec_col=vec_col)
    keep = ("list_id", vec_col) if keep_vectors else ("list_id",)
    codes = encode_pq(assigned, books, id_col=id_col, vec_col=vec_col, keep_cols=keep)
    codes.write.mode("overwrite").partitionBy("list_id").parquet(f"{path}/codes")
    cdf = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(cents)],
        "list_id int, centroid array<double>",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(f"{path}/_centroids")
    save_codebooks(spark, books, f"{path}/_codebooks")
    return cents, books


def search_ivfpq_index(
    spark,
    path: str,
    queries: DataFrame,
    *,
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 0,
    q_id: str = "query_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Search the on-disk IVF-PQ index. The batch's probed-list union
    becomes a partition filter (only those directories are scanned);
    ADC scores the pruned codes; with ``rerank=R > 0`` the PQ top-R
    candidates per query are re-scored exactly against the stored
    vectors and the exact top-k is returned (requires
    ``keep_vectors=True`` at build).

    Scoping note: ADC scores every query against the UNION of the
    batch's probed lists (out-of-list candidates can only improve a
    query's top-k — PQ distance ranks them out if they're far). This
    keeps the scan one pass; per-query list scoping would re-shuffle
    the codes.
    """
    from tilegrab_spark.operators.similarity import (
        _probe_lists_udf,
        load_ivf_centroids,
    )

    cents = load_ivf_centroids(spark, path)
    books = load_codebooks(spark, f"{path}/_codebooks")
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
    codes = spark.read.parquet(f"{path}/codes").filter(
        F.col("list_id").isin(probed)  # -> parquet PartitionFilters
    )
    if rerank <= 0:
        return pq_topk(queries, codes, books, k=k, q_id=q_id, q_vec=q_vec, c_id=c_id)
    if c_vec not in codes.columns:
        raise ValueError(
            "rerank needs stored vectors — build with keep_vectors=True"
        )
    cand = pq_topk(
        queries, codes, books, k=max(k, rerank), q_id=q_id, q_vec=q_vec, c_id=c_id
    )
    return rerank_exact(
        cand,
        queries,
        codes.select(F.col(c_id), F.col(c_vec)),
        k=k,
        q_id=q_id,
        q_vec=q_vec,
        c_id=c_id,
        c_vec=c_vec,
    )
