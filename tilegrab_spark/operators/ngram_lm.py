"""N-gram language-model perplexity — the CCNet-style learned quality
signal (Wenzek et al. 2020 score documents against a KenLM model and
keep the low-perplexity tail; this is that stage with the model itself
trained relationally).

Model: an interpolated bigram LM with add-k smoothing over the suite's
standard lowercase-whitespace tokens,

  p(w | v) = (c(v, w) + k) / (c(v) + k * V)

with ``V`` = vocabulary size + 1 (the unseen token), trained by two
aggregations (unigram + bigram counts) over the corpus.  Scoring
computes mean log-prob per document and perplexity ``exp(-mean)``.
Documents with no bigrams (0 or 1 token) score NULL.

Shape notes for scale (the 100 TB argument):
- **Training is two map-side-combinable counts** over one token
  projection: the exchanges carry (token) and (token-pair) partial
  counts — vocabulary-sized, not corpus-sized.  The model is a table,
  not a driver object: nothing is collected.
- **Scoring is one broadcast join** (the bigram table with its
  precomputed log-probs broadcasts at typical vocab sizes; pass
  ``broadcast_model=False`` to shuffle-join a huge model) + a
  document-keyed aggregation with map-side partial sums — the same
  document-sized-exchange shape as classifier scoring.
- Everything before the final log is exact integer counts; tests pin
  the counts exactly and the log-prob math against an independent
  pure-Python reference.

The reference has no LM analogue; part of the training-data operator
suite from the driver brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["train_bigram_lm", "perplexity_score"]


def _tokens(text_col: str):
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != "",
    )


def train_bigram_lm(
    docs: DataFrame,
    *,
    text_col: str = "text",
) -> DataFrame:
    """``[v, w, c_vw, c_v, vocab]`` — bigram counts with the context's
    unigram count and the corpus vocabulary size denormalized on (the
    scoring join then needs ONE table).  Pure Catalyst: a token
    projection, one bigram count, one unigram count (both combine
    map-side), a broadcast join of the unigram counts onto the bigram
    table and a vocab-size scalar cross-joined on (1 row)."""
    from tilegrab_spark.operators.dedup import _with_min_parallelism

    toks = _with_min_parallelism(docs.select(text_col)).select(
        _tokens(text_col).alias("_t")
    )
    bigrams = (
        toks.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                    F.slice(
                        F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))
                    ),
                    lambda a, b: F.struct(a.alias("v"), b.alias("w")),
                )
            ).alias("p")
        )
        .select("p.v", "p.w")
        .groupBy("v", "w")
        .agg(F.count(F.lit(1)).alias("c_vw"))
    )
    unigrams = (
        toks.select(F.explode("_t").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c_v"))
    )
    vocab = unigrams.agg(F.count(F.lit(1)).alias("vocab"))
    return (
        bigrams.join(F.broadcast(unigrams), "v")
        .crossJoin(F.broadcast(vocab))
        .select("v", "w", "c_vw", "c_v", "vocab")
    )


def perplexity_score(
    docs: DataFrame,
    model: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing_k: float = 1.0,
    broadcast_model: bool = True,
    keep_cols: tuple = (),
) -> DataFrame:
    """``[id_col, *keep_cols, n_bigrams, logprob_sum, perplexity]`` —
    add-k-smoothed mean bigram log-prob per document against a
    ``train_bigram_lm`` table.  Unseen bigrams of a SEEN context v use
    ``(0 + k) / (c_v + kV)``; a completely unseen context uses
    ``k / (kV) = 1/V``.  Documents with fewer than 2 tokens score
    NULL (no bigram evidence — route them to the length filters)."""
    if smoothing_k <= 0:
        raise ValueError(f"smoothing_k must be > 0, got {smoothing_k}")
    from tilegrab_spark.operators.dedup import _with_min_parallelism

    k = float(smoothing_k)
    vocab_row = model.select(F.max("vocab").alias("vocab"))
    pairs = (
        _with_min_parallelism(docs.select(id_col, text_col))
        .select(F.col(id_col), _tokens(text_col).alias("_t"))
        .select(
            id_col,
            F.explode(
                F.zip_with(
                    F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                    F.slice(
                        F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))
                    ),
                    lambda a, b: F.struct(a.alias("v"), b.alias("w")),
                )
            ).alias("p"),
        )
        .select(id_col, "p.v", "p.w")
    )
    # context counts ride separately so an unseen (v, w) of a seen v
    # still smooths against c_v; V rides as a broadcast scalar
    ctx = model.select("v", "c_v").distinct()
    mj = (F.broadcast if broadcast_model else (lambda d: d))
    joined = (
        pairs.join(mj(model.select("v", "w", "c_vw")), ["v", "w"], "left")
        .join(mj(ctx), "v", "left")
        .crossJoin(F.broadcast(vocab_row))
        .select(
            id_col,
            (
                F.log(
                    (F.coalesce(F.col("c_vw"), F.lit(0)) + F.lit(k))
                    / (
                        F.coalesce(F.col("c_v"), F.lit(0))
                        + F.lit(k) * (F.col("vocab") + 1)
                    )
                )
            ).alias("_lp"),
        )
    )
    sums = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("_lp").alias("logprob_sum"),
    )
    base = docs.select(id_col, *keep_cols)
    return base.join(sums, id_col, "left").select(
        id_col,
        *keep_cols,
        "n_bigrams",
        "logprob_sum",
        F.exp(-(F.col("logprob_sum") / F.col("n_bigrams"))).alias("perplexity"),
    )
