"""BM25 ranked retrieval over the document corpus — inverted-index
build + broadcast-query scoring, pure Catalyst end to end.

Training-data curation needs keyword retrieval constantly (domain
filtering, seed-set expansion, eval-leak triage: "find every document
mentioning these phrases, ranked"). The reference (a tile downloader,
`/root/reference/src/tilegrab/`) has no analogue; this extends the
training-data operator suite from the driver brief alongside
`decontaminate` / `dsir` / `text`.

Scoring is the standard Robertson/Lucene BM25:

    idf(t)      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(q, d) = Σ_{t ∈ distinct(q)} idf(t) · tf · (k1+1)
                  / (tf + k1·(1 − b + b·dl/avgdl))

Plan shape at 100 TB:

- **index build** is two shuffles, both keyed and output-bounded: one
  explode + partial-agg to (doc, term, tf) rows (map-side combine
  collapses repeats before the exchange), one term-keyed agg for
  document frequencies. Doc length rides the first shuffle as a
  carried FIRST — no second pass over the corpus.
- **search** never shuffles the corpus: the query term table (queries
  are small by construction) is **broadcast**, postings probe it
  map-side, and the single exchange carries only candidate
  (query, doc) partial scores — candidates-sized, not corpus-sized.
  Top-k is a window per query over that bounded table.
- **stopword skew**: terms appearing in more than ``max_df_ratio`` of
  documents contribute ~zero idf but giant postings lists; pruning
  them at index time (the standard practice) bounds the worst
  per-term candidate fan-out. Off by default so the oracle stays
  exact; turn it on at scale.
- corpus stats (N, avgdl) are two scalars computed once at index
  build — a bounded driver-side aggregate, same pattern as
  ``similarity.build_ivf_index``.

Tokenization is lowercase alphanumeric runs (``[^a-z0-9]+`` split,
empties dropped) so an independent engine can re-derive every score —
the pytest pins the full pipeline against a DuckDB SQL oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["TextIndex", "build_text_index", "bm25_topk", "bm25_search"]

_TOKEN_SPLIT = "[^a-z0-9]+"


def _tokens(col: str):
    """array<string> of lowercase alphanumeric tokens, empties dropped."""
    return F.filter(
        F.split(F.lower(F.col(col)), _TOKEN_SPLIT), lambda x: x != ""
    )


@dataclass
class TextIndex:
    """Inverted index: ``postings`` (id, term, tf, dl) and ``dfreq``
    (term, df), plus corpus scalars. Both frames should be persisted or
    written to a term-bucketed table by the caller when reused across
    many query batches."""

    postings: DataFrame
    dfreq: DataFrame
    n_docs: int
    avgdl: float
    id_col: str


def build_text_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_ratio: float | None = None,
) -> TextIndex:
    """Build the BM25 inverted index. ``max_df_ratio`` (e.g. 0.5) drops
    terms present in more than that fraction of documents — the
    stopword-skew guard; None keeps every term (exact, oracle mode)."""
    toks = docs.select(F.col(id_col), _tokens(text_col).alias("_toks"))
    exploded = toks.select(
        id_col, F.size("_toks").alias("dl"), F.explode("_toks").alias("term")
    )
    postings = exploded.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.size("_toks")).alias("avgdl")
    ).first()
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"] or 0.0)
    if max_df_ratio is not None:
        if not 0.0 < max_df_ratio <= 1.0:
            raise ValueError(f"max_df_ratio must be in (0, 1], got {max_df_ratio}")
        dfreq = dfreq.filter(F.col("df") <= F.lit(float(max_df_ratio) * n_docs))
        postings = postings.join(F.broadcast(dfreq.select("term")), "term", "left_semi")
    return TextIndex(postings, dfreq, n_docs, avgdl, id_col)


def bm25_topk(
    index: TextIndex,
    queries: DataFrame,
    *,
    k: int = 10,
    query_id: str = "query_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents per query by BM25. Repeated query terms count
    once (the Lucene convention). Output: (query_id, <id_col>, score,
    rank) — ties broken by ascending doc id for determinism."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if index.n_docs == 0 or index.avgdl <= 0.0:
        raise ValueError("empty index: n_docs=0 or avgdl=0")
    qterms = queries.select(
        F.col(query_id),
        F.explode(F.array_distinct(_tokens(text_col))).alias("term"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(index.n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_part = (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(index.avgdl))
        )
    )
    scored = (
        index.postings
        # query side is small by construction: broadcast both tiny frames
        # so the corpus-sized postings table is probed map-side
        .join(F.broadcast(qterms), "term", "inner")
        .join(F.broadcast(index.dfreq), "term", "inner")
        .groupBy(query_id, index.id_col)
        .agg(F.sum(idf * tf_part).alias("score"))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(index.id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(int(k)))
    )


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id: str = "query_id",
    query_text: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """One-shot convenience: build the index and run ``bm25_topk``."""
    idx = build_text_index(
        docs, id_col=id_col, text_col=text_col, max_df_ratio=max_df_ratio
    )
    return bm25_topk(
        idx, queries, k=k, query_id=query_id, text_col=query_text, k1=k1, b=b
    )
