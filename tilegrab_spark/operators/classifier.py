"""Hashed-linear quality classifier — the learned document filter
(fastText-style, Joulin et al. 2016; the CCNet / FineWeb quality-model
stage) expressed Spark-first.

A document is a bag of hashed tokens: ``idx = md5_60(token||salt) %
n_features`` (the engine-independent md5 contract shared with
``sampling.sample_hash``, so an external engine can re-derive every
feature index).  The model is one weight per feature plus a bias; the
margin is ``bias + sum_t count(t) * w[idx(t)]`` over the document's
token counts, and the score is the logistic of the margin.

Shape notes for scale (the 100 TB argument):
- **Scoring is pure Catalyst**: explode tokens -> md5 index -> join the
  n_features-row weight table (broadcast — even 2^20 weights is a few
  MB) -> groupBy(doc).  Token rows collapse MAP-SIDE (partial sum
  before the exchange), so the one shuffle carries one row per
  document per partition — document-sized, never token-sized.  No
  Python anywhere in the scoring path.
- **Training is the same machinery run in reverse**: each iteration
  scores the corpus with the current weights (broadcast), computes
  per-document logistic error JVM-side, and aggregates the gradient by
  feature index — map-side-combined, so the exchange is bounded by
  n_features rows, and the driver collects exactly one dense weight
  vector (n_features floats) per iteration, never data.  Iteration
  count is fixed by the caller — no data-dependent driver loops.
- Determinism: feature indexing and integer-weight margins are exact
  (pure integer arithmetic — the contract row pins them bit-for-bit
  against DuckDB).  Float training sums depend on partition reduce
  order like every distributed float reduction; tests pin training
  behaviorally (loss decreases, held-out separation) and scoring
  exactly.

The reference has no learned filtering; part of the training-data
operator suite from the driver brief.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from tilegrab_spark.operators.sampling import sample_hash

__all__ = [
    "hashed_token_features",
    "score_documents",
    "train_quality_classifier",
]

_TOKEN_SPLIT = r"\s+"


def _tokens(text_col: str):
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT),
        lambda t: t != "",
    )


def hashed_token_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1 << 18,
    salt: str = "qc",
) -> DataFrame:
    """``[id_col, idx, cnt]`` sparse hashed bag-of-words: one row per
    (document, feature index) with the token count.  Tokenization is
    the suite's standard lowercase-whitespace split; ``idx`` is the
    md5-60 contract hash of ``token || salt`` mod ``n_features``."""
    if n_features < 1:
        raise ValueError(f"n_features must be >= 1, got {n_features}")
    from tilegrab_spark.operators.dedup import _with_min_parallelism

    tok = _with_min_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(_tokens(text_col)).alias("_tok"),
    )
    idx = (sample_hash(F.col("_tok"), salt) % n_features).alias("idx")
    return (
        tok.select(id_col, idx)
        .groupBy(id_col, "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _weights_df(spark, weights: np.ndarray, int_weights: bool):
    """Arrow-path conversion (one batchful of columns, no per-row Python
    serialization — a 2^18-weight table ships in milliseconds)."""
    import pandas as pd

    n = int(weights.shape[0])
    pdf = pd.DataFrame(
        {
            "idx": np.arange(n, dtype=np.int64),
            "w": weights.astype(np.int64 if int_weights else np.float64),
        }
    )
    return spark.createDataFrame(pdf), n


def score_documents(
    df: DataFrame,
    weights: np.ndarray,
    *,
    bias: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "qc",
    keep_cols: tuple = (),
) -> DataFrame:
    """``[id_col, *keep_cols, margin, score]`` — linear margin and
    logistic score per document.  ``weights`` is the dense weight
    vector (its length IS ``n_features``).  Integer-dtype weights keep
    the margin in exact int64 arithmetic (the oracle contract);
    float weights produce a double margin.  Empty documents score at
    the bias.  Pure Catalyst: one broadcast join, one document-sized
    exchange (see module docstring)."""
    weights = np.asarray(weights)
    if weights.ndim != 1:
        raise ValueError(f"weights must be 1-D, got shape {weights.shape}")
    int_weights = np.issubdtype(weights.dtype, np.integer)
    wdf, n_features = _weights_df(df.sparkSession, weights, int_weights)
    margin_t = "long" if int_weights else "double"
    # token INSTANCES join the broadcast weight table directly (no
    # intermediate (doc, idx) count shuffle); the groupBy(doc) partial
    # sum collapses map-side, so the one exchange is document-sized.
    # The min-parallelism guard repartitions only when the scan arrives
    # with fewer splits than cores (toy single-file inputs — a serial
    # explode otherwise); a real table's scan makes it a no-op.
    from tilegrab_spark.operators.dedup import _with_min_parallelism

    tok = _with_min_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("_tok")
    )
    sums = (
        tok.select(
            id_col, (sample_hash(F.col("_tok"), salt) % n_features).alias("idx")
        )
        .join(F.broadcast(wdf), "idx")
        .groupBy(id_col)
        .agg(F.sum("w").cast(margin_t).alias("_dot"))
    )
    base = df.select(id_col, *keep_cols)
    out = base.join(sums, id_col, "left").withColumn(
        "margin",
        (F.coalesce(F.col("_dot"), F.lit(0).cast(margin_t)) + F.lit(bias)).cast(
            margin_t
        ),
    )
    return out.select(
        id_col,
        *keep_cols,
        "margin",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin").cast("double")))).alias(
            "score"
        ),
    )


def train_quality_classifier(
    df: DataFrame,
    *,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1 << 16,
    salt: str = "qc",
    iters: int = 10,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> tuple[np.ndarray, float]:
    """Logistic regression by full-batch gradient descent over the
    hashed features; returns ``(weights, bias)`` for
    ``score_documents``.  ``label_col`` is 0/1.  Each iteration runs
    one distributed pass: per-document margins (broadcast weights),
    JVM-side logistic error, gradient grouped by feature index
    (map-side combine; the exchange and the driver collect are both
    bounded by n_features — never by data).  Features are mean-scaled
    per document (count / n_tokens) so learning rates transfer across
    document lengths."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    labels = df.select(
        id_col, F.col(label_col).cast("double").alias("_y")
    ).persist()
    feats = (
        hashed_token_features(
            df, id_col=id_col, text_col=text_col,
            n_features=n_features, salt=salt,
        )
        .withColumn(
            "_x",
            F.col("cnt").cast("double")
            / F.sum("cnt").over(Window.partitionBy(id_col)),
        )
        .persist()
    )
    n_docs = labels.count() or 1
    spark = df.sparkSession
    w = np.zeros(n_features, dtype=np.float64)
    bias = 0.0
    try:
        for _ in range(iters):
            wdf, _ = _weights_df(spark, w, int_weights=False)
            sums = (
                feats.join(F.broadcast(wdf), "idx")
                .groupBy(id_col)
                .agg(F.sum(F.col("_x") * F.col("w")).alias("_m"))
            )
            # left join keeps token-less documents in the bias gradient
            margins = labels.join(sums, id_col, "left").select(
                id_col,
                (
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(
                            -(F.coalesce(F.col("_m"), F.lit(0.0)) + F.lit(bias))
                        )
                    )
                    - F.col("_y")
                ).alias("_err"),
            )
            grad_rows = (
                feats.join(margins, id_col)
                .groupBy("idx")
                .agg(F.sum(F.col("_x") * F.col("_err")).alias("_g"))
                .collect()
            )
            bias_err = (
                margins.agg(F.sum("_err").alias("s")).collect()[0]["s"] or 0.0
            )
            grad = np.zeros(n_features, dtype=np.float64)
            for r in grad_rows:
                grad[r["idx"]] = r["_g"]
            w -= lr * (grad / n_docs + l2 * w)
            bias -= lr * bias_err / n_docs
    finally:
        feats.unpersist()
        labels.unpersist()
    return w, bias
