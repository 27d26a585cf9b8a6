"""Benchmark decontamination — eval-set n-gram overlap over the corpus.

Training corpora must be scrubbed of evaluation data before training:
the standard check (the GPT-3 appendix-C / PaLM convention) flags a
training document as CONTAMINATED when it shares at least ``min_hits``
distinct word n-grams (n = 13 by convention) with any document in the
held-out eval set. The reference has no analogue; this is part of the
training-data operator suite from the driver brief.

Matching semantics (the convention, exactly): an eval document with
``len >= n`` tokens contributes its word n-grams; a SHORTER eval
document contributes its whole token sequence as one ``len``-gram — and
the corpus side must therefore produce k-grams for every such k or
short eval answers embedded inside longer training docs would be
invisible. The needed gram-length set ``K = {min(n, eval_len)}`` is
collected from the eval side (bounded: at most ``n`` distinct values,
one tiny distinct-agg over the already-small eval table) and the corpus
extracts all k-grams for each k in K in ONE projection pass.

Plan shape at 100 TB:

- the EVAL side is tiny (benchmarks are 10^3-10^5 examples) — its
  distinct n-gram table is built once and **broadcast**, so the corpus
  side is never shuffled for the join;
- the CORPUS side explodes its (distinct-per-doc) grams map-side,
  probes the broadcast hash table map-side, and partially aggregates
  hit counts map-side — the single exchange carries one small row per
  (contaminated doc), i.e. output-sized, not corpus-sized;
- gram extraction is pure Catalyst (split + transform higher-order
  functions over the token array, whole-stage codegen; no UDF), with
  lowercase/whitespace tokenization shared with the dedup suite
  (``dedup.with_shingles``).

Empty grams are dropped on both sides. The semantics are fully
relational — the pytest pins them against an independent DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["contamination_hits", "decontaminate"]


def _eval_gram_lengths(eval_df: DataFrame, eval_text: str, n: int) -> list[int]:
    """Distinct ``min(n, token_count)`` over the eval set — the gram
    lengths the corpus must produce. Bounded collect (<= n values)."""
    toks = F.split(F.trim(F.lower(F.col(eval_text))), r"\s+")
    rows = (
        eval_df.select(F.least(F.size(toks), F.lit(n)).alias("k"))
        .distinct()
        .collect()
    )
    ks = sorted({int(r[0]) for r in rows if r[0] is not None and r[0] >= 1})
    return ks or [n]


def contamination_hits(
    docs: DataFrame,
    eval_df: DataFrame,
    *,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    eval_id: str = "eval_id",
    eval_text: str = "text",
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Per contaminated training doc: ``[doc_id, n_hits, n_eval_docs]``
    where ``n_hits`` counts DISTINCT overlapping grams and
    ``n_eval_docs`` counts distinct eval documents any of them came
    from. Docs with fewer than ``min_hits`` overlapping grams are
    absent (the clean majority never leaves the map side).

    The eval side produces ``min(n, len)``-grams (``clamp_short`` IS
    that rule); the corpus side produces k-grams for every length the
    eval set actually needs — see module docstring. The match runs in
    64-bit rolling-hash space (``spans.rolling_gram_hashes`` — the hash
    depends only on the token sequence, so clamped whole-document grams
    meet eval grams of the same tokens; equality is exact w.h.p. at
    ~2^-64 per compared pair, the suite's standard trade) — measured
    3.5x over the prior Catalyst higher-order extraction at 80k docs
    (7.3 -> 2.1 s, local[32]; the sf0.1 figure is fixed-cost-bound),
    and the 8-byte hashes are what broadcasts, never gram text."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1, got {min_hits}")
    from tilegrab_spark.operators.dedup import _with_min_parallelism
    from tilegrab_spark.operators.spans import rolling_gram_hashes

    ks = _eval_gram_lengths(eval_df, eval_text, n)
    eval_grams = (
        rolling_gram_hashes(
            eval_df, eval_id, eval_text, [n], out_id="_eval_id",
            clamp_short=True,
        )
        .select("_eval_id", "h")
        .distinct()
    )
    # gram extraction is the CPU-heavy pass: guard against a
    # fewer-partitions-than-cores scan (single small parquet file = one
    # serial pass; a no-op on any real multi-split table)
    corpus_grams = rolling_gram_hashes(
        _with_min_parallelism(docs), doc_id, doc_text, ks, out_id=doc_id,
        clamp_short=True,
    ).select(doc_id, "h")
    hits = corpus_grams.join(F.broadcast(eval_grams), "h")
    return (
        hits.groupBy(doc_id)
        .agg(
            F.countDistinct("h").alias("n_hits"),
            F.countDistinct("_eval_id").alias("n_eval_docs"),
        )
        .filter(F.col("n_hits") >= min_hits)
    )


def decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    *,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    eval_id: str = "eval_id",
    eval_text: str = "text",
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """The pipeline form: ``docs`` with contaminated documents removed
    (left-anti join against :func:`contamination_hits` on ``doc_id``).
    The anti-join's build side is the hit list — output-sized, so it
    broadcasts; the corpus passes through with no shuffle."""
    flagged = contamination_hits(
        docs,
        eval_df,
        doc_id=doc_id,
        doc_text=doc_text,
        eval_id=eval_id,
        eval_text=eval_text,
        n=n,
        min_hits=min_hits,
    ).select(doc_id)
    return docs.join(F.broadcast(flagged), doc_id, "left_anti")
