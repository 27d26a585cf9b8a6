"""Duplicated-span detection and scrubbing — the ExactSubstr-style
boilerplate dedup (Lee et al., "Deduplicating Training Data Makes
Language Models Better", ACL 2022) at k-token-gram granularity.

Document-level dedup (``operators/dedup.py``) drops whole near-copies;
it cannot touch the OTHER duplication mode of web corpora: the same
50-token licence header / nav bar / quote pasted into millions of
otherwise-distinct documents. This operator finds every k-token span
whose gram occurs at least ``min_count`` times across the corpus (or in
at least ``min_docs`` distinct documents), merges overlapping hits into
maximal intervals per document, and (optionally) rewrites the text with
those intervals removed.

Semantics vs the paper: Lee et al. build a corpus suffix array and drop
EVERY substring of length >= 50 occurring twice. A k-gram sliding window
finds exactly the same spans whenever the duplicated region is >= k
tokens (each of its length-k windows is duplicated, and the island-merge
reconstructs the maximal interval); shorter duplications are invisible —
that is the standard trade for a shuffle-based (rather than
suffix-array) formulation, and k IS the paper's minimum match length.

Plan shape at 100 TB:
- gram emission is pure Catalyst (posexplode over the token array;
  xxhash64(gram) — 8 bytes — is what shuffles, never gram text);
- ONE corpus-token-sized exchange on the gram hash with map-side
  partial counting (this cost is intrinsic to the operation — the
  suffix array Lee et al. build is the same data volume sorted once);
- duplicated hashes (output-sized) broadcast back against the
  occurrence stream, so the corpus is not shuffled a second time;
- interval merging is a per-document window (gaps-and-islands on hit
  positions, same machinery as ``operators/sessions.py``);
- hash collisions can mark a non-duplicated span at ~2^-64 per gram
  pair — the standard w.h.p. trade (same as MinHash/incremental decon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["duplicate_spans", "scrub_spans"]


def _gram_hits(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """[id, pos, h] — xxhash64 of every k-gram, with its token position.
    Documents shorter than k emit nothing (no span of length k exists)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    d = df.select(F.col(id_col).alias("_id"), toks.alias("_toks")).filter(
        F.size("_toks") >= k
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_toks") - k),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, k))),
    )
    return d.select("_id", F.posexplode(grams).alias("pos", "h"))


def duplicate_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    min_count: int = 2,
    min_docs: int = 1,
) -> DataFrame:
    """``[id_col, start_tok, end_tok, n_grams]`` — maximal token
    intervals (0-based, end exclusive) covered by k-grams occurring at
    least ``min_count`` times corpus-wide AND in at least ``min_docs``
    distinct documents. Defaults match the paper: any 50-token span
    appearing twice anywhere (including twice within one document) is
    duplicated; set ``min_docs=2`` to ignore within-document repeats."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    from tilegrab_spark.operators.dedup import _with_min_parallelism

    hits = _gram_hits(_with_min_parallelism(docs), id_col, text_col, k)
    dup = (
        hits.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.countDistinct("_id").alias("_nd"),
        )
        .filter((F.col("_n") >= min_count) & (F.col("_nd") >= min_docs))
        .select("h")
    )
    marked = hits.join(F.broadcast(dup), "h").select("_id", "pos")
    # gaps-and-islands: hit positions p cover tokens [p, p+k); adjacent
    # hits chain into one island while pos <= prev_pos + k
    w = Window.partitionBy("_id").orderBy("pos")
    islands = (
        marked.withColumn("_prev", F.lag("pos").over(w))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull() | (F.col("pos") > F.col("_prev") + k),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("_isl", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
    )
    return (
        islands.groupBy("_id", "_isl")
        .agg(
            F.min("pos").alias("start_tok"),
            (F.max("pos") + k).alias("end_tok"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(
            F.col("_id").alias(id_col), "start_tok", "end_tok", "n_grams"
        )
    )


def scrub_spans(
    docs: DataFrame,
    spans: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "scrubbed_text",
) -> DataFrame:
    """``docs`` + ``out_col`` with every span's tokens removed (same
    lowercase/whitespace tokenization the detector used; documents with
    no spans pass through verbatim). The span list is output-sized —
    it arrives as a broadcast collect_list join, and the token filter
    is a pure Catalyst higher-order expression (no Python)."""
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("start_tok", "end_tok")).alias("_spans")
    )
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    d = docs.join(F.broadcast(per_doc), id_col, "left")
    indexed = F.zip_with(
        toks,
        F.sequence(F.lit(0), F.size(toks) - 1),
        lambda t, i: F.struct(t.alias("t"), i.alias("i")),
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            F.col("_spans"),
            lambda sp: (s["i"] >= sp["start_tok"]) & (s["i"] < sp["end_tok"]),
        ),
    )
    scrubbed = F.when(
        F.col("_spans").isNull(), F.col(text_col)
    ).otherwise(F.concat_ws(" ", F.transform(kept, lambda s: s["t"])))
    return d.withColumn(out_col, scrubbed).drop("_spans")
