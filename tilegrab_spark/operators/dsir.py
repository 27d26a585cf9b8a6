"""Data Selection via Importance Resampling (DSIR — Xie et al. 2023,
arXiv:2302.03169).

The pretraining-mixture question "which raw-web documents look most
like my high-quality target set?" answered the DSIR way: fit hashed
n-gram bag models of the TARGET and the RAW corpus, weight every raw
document by its log importance ratio

    log w(doc) = Σ_buckets c_doc[b] · (log p̂_target[b] − log p̂_raw[b])

and resample with Gumbel-top-k. Everything is the engine's standard
shapes:

- features: hashed word {1,2}-grams under the md5-60 ``sample_hash``
  contract (same as classifier.py / sampling.py — an external engine
  can re-derive every bucket id); one explode + map-side-combinable
  groupBy per doc;
- profiles: ONE aggregation each (the exchange is ≤ n_buckets rows,
  never corpus-sized), Laplace-smoothed so unseen buckets get the
  floor instead of −inf;
- weights: the per-bucket log-ratio table (≤ n_buckets rows)
  BROADCASTs; the one real exchange is the per-doc sum — document-
  sized, the classifier-scoring shape;
- resampling: Gumbel noise derived from the SAME hash contract
  (u = (h + 0.5) / 2^60, g = −log(−log u)), so the selected set is a
  pure function of (corpus, target, salt) — re-runs and resumed
  exports pick identical documents. Top-k is a TakeOrdered, k-bounded.

The raw profile defaults to the corpus being scored (the paper's
setting); pass ``raw`` to score against a different background.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from tilegrab_spark.operators.classifier import _tokens
from tilegrab_spark.operators.sampling import _HASH_SPACE, sample_hash

__all__ = [
    "hashed_ngram_features",
    "ngram_profile",
    "dsir_log_weights",
    "dsir_topk_sample",
]


def _grams(text_col: str, orders) -> Column:
    """Array of word n-grams (space-joined) for the requested orders —
    pure Catalyst over the standard lowercase-whitespace tokens."""
    toks = _tokens(text_col)
    parts = []
    for k in sorted(set(int(o) for o in orders)):
        if k < 1:
            raise ValueError(f"ngram orders must be >= 1, got {k}")
        if k == 1:
            parts.append(toks)
        else:
            n = F.size(toks)
            shifted = [F.slice(toks, i + 1, n - (k - 1)) for i in range(k)]
            g = shifted[0]
            for s in shifted[1:]:
                g = F.zip_with(g, s, lambda a, b: F.concat_ws(" ", a, b))
            parts.append(F.when(n >= k, g).otherwise(F.array()))
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def hashed_ngram_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 14,
    ngrams=(1, 2),
    salt: str = "dsir",
) -> DataFrame:
    """``[id_col, bucket, cnt]`` sparse hashed n-gram counts per
    document. ``bucket`` = md5-60 contract hash of ``gram || salt``
    mod ``n_buckets``."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from tilegrab_spark.operators.dedup import _with_min_parallelism

    # single-split scans serialize the gram explode + hashing (the
    # suite-wide guard; a no-op on any real multi-split table)
    docs = _with_min_parallelism(df.select(F.col(id_col), F.col(text_col)))
    g = docs.select(
        F.col(id_col), F.explode(_grams(text_col, ngrams)).alias("_g")
    )
    return (
        g.select(id_col, (sample_hash(F.col("_g"), salt) % n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ngram_profile(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_buckets: int = 1 << 14,
    ngrams=(1, 2),
    salt: str = "dsir",
    alpha: float = 1.0,
) -> DataFrame:
    """Laplace-smoothed hashed n-gram distribution of a corpus:
    ``[bucket, log_prob]`` with ``p[b] = (c[b] + alpha) /
    (total + alpha·n_buckets)``. Buckets with zero count are OMITTED —
    consumers apply the shared floor ``log(alpha / (total +
    alpha·n_buckets))``, carried on every row as ``log_floor`` plus the
    smoothing denominator, so the tiny table stays sparse."""
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    from tilegrab_spark.operators.dedup import _with_min_parallelism

    # same single-split guard as hashed_ngram_features: the profile's
    # gram explode is the map-heavy stage, don't let one input split
    # serialize it (no-op on any real multi-split table)
    counts = (
        _with_min_parallelism(df.select(F.col(text_col)))
        .select(F.explode(_grams(text_col, ngrams)).alias("_g"))
        .select((sample_hash(F.col("_g"), salt) % n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = counts.agg(F.sum("cnt").alias("_tot"))
    denom = F.col("_tot") + F.lit(float(alpha) * n_buckets)
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.log((F.col("cnt") + F.lit(float(alpha))) / denom).alias("log_prob"),
            F.log(F.lit(float(alpha)) / denom).alias("log_floor"),
        )
    )


def dsir_log_weights(
    corpus: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 14,
    ngrams=(1, 2),
    salt: str = "dsir",
    alpha: float = 1.0,
    raw: DataFrame | None = None,
) -> DataFrame:
    """Corpus rows + ``dsir_logw`` (the per-document log importance
    ratio; 0.0 for token-less documents). ``raw`` defaults to the
    corpus itself."""
    kw = dict(text_col=text_col, n_buckets=n_buckets, ngrams=ngrams,
              salt=salt, alpha=alpha)
    p_t = ngram_profile(target, **kw).select(
        "bucket",
        F.col("log_prob").alias("_lt"),
        F.col("log_floor").alias("_ft"),
    )
    p_r = ngram_profile(raw if raw is not None else corpus, **kw).select(
        "bucket",
        F.col("log_prob").alias("_lr"),
        F.col("log_floor").alias("_fr"),
    )
    # per-bucket log ratio with the smoothing floor on either absent
    # side; each profile's floor is a constant — reduce it to a one-row
    # broadcast frame (profiles are <= n_buckets rows to begin with)
    ft = p_t.agg(F.max("_ft").alias("_ftc"))
    fr = p_r.agg(F.max("_fr").alias("_frc"))
    ratio = (
        p_t.drop("_ft")
        .join(p_r.drop("_fr"), "bucket", "full_outer")
        .crossJoin(F.broadcast(ft))
        .crossJoin(F.broadcast(fr))
        .select(
            "bucket",
            (
                F.coalesce("_lt", "_ftc") - F.coalesce("_lr", "_frc")
            ).alias("_logr"),
        )
    )
    feats = hashed_ngram_features(
        corpus, id_col=id_col, text_col=text_col, n_buckets=n_buckets,
        ngrams=ngrams, salt=salt,
    )
    logw = (
        feats.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("_logr")).alias("dsir_logw"))
    )
    return corpus.join(logw, id_col, "left").withColumn(
        "dsir_logw", F.coalesce("dsir_logw", F.lit(0.0))
    )


def dsir_topk_sample(
    scored: DataFrame,
    *,
    k: int,
    id_col: str = "doc_id",
    logw_col: str = "dsir_logw",
    temperature: float = 1.0,
    salt: str = "dsir-gumbel",
) -> DataFrame:
    """Gumbel-top-k resampling: rows with the ``k`` largest
    ``logw/temperature + Gumbel(hash(id))`` keys — equivalent to
    sampling k documents WITHOUT replacement with probability
    ∝ exp(logw/temperature), but fully deterministic (the Gumbel noise
    derives from the md5 contract hash of the id). Adds ``dsir_key``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    u = (sample_hash(F.col(id_col), salt).cast("double") + F.lit(0.5)) / F.lit(
        float(_HASH_SPACE)
    )
    g = -F.log(-F.log(u))
    key = F.col(logw_col) / F.lit(float(temperature)) + g
    return (
        scored.withColumn("dsir_key", key)
        .orderBy(F.desc("dsir_key"), F.asc(id_col))
        .limit(int(k))
    )
