"""Incremental decontamination — a growing corpus against a GROWING
eval set, without ever re-scanning history for the routine case.

The batch operator (``operators/decontaminate.py``) answers "is this
corpus clean against these benchmarks" in one pass. The production
shape is incremental in BOTH directions:

- **new documents arrive daily** — they must be checked against every
  benchmark registered so far (new-docs x all-evals);
- **new benchmarks are registered occasionally** — every document ever
  ingested must be re-checked against just the new eval docs
  (all-docs x new-evals), WITHOUT re-tokenizing the corpus: the store
  keeps a persisted **gram index** of 8-byte xxhash64 gram hashes per
  document, so the retro scan is a join against the index, never a
  re-read of raw text.

Work accounting per ingest: O(batch grams + hits) for documents,
O(index-probe + hits) for evals. Hit rows are stored at
(doc, eval, gram-hash) granularity — output-sized — so the accumulated
report (``contaminated()``) equals the one-shot batch operator over
everything ever ingested; ``tests/test_incremental_decon.py`` pins that
batch-equivalence under interleaved doc/eval arrival orders.

Gram hashing note: the index stores xxhash64(gram), not gram text —
8 bytes/gram instead of ~8x the corpus. Cross-doc hash collisions could
in principle flag a false hit with probability ~2^-64 per compared
gram pair; this is the standard trade (the same one MinHash makes) and
is why the store's answers are "exact w.h.p." rather than exact.

K-length bookkeeping (the subtle part, same rule as the batch
operator): an eval doc shorter than ``n`` tokens matches via its
whole-sequence k-gram, so the CORPUS index must contain k-grams for
every k any eval doc needs. The store indexes documents at the k-set
known at ingest time; if a later eval batch introduces a NEW k
(a shorter-than-ever benchmark), the store re-indexes the corpus for
the missing ks only — an explicit, rare, O(corpus) event (pass the raw
corpus to ``ingest_eval``; refusal mode raises instead). Routine eval
batches whose lengths are all >= n never trigger it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tilegrab_spark.operators.decontaminate import _eval_gram_lengths
from tilegrab_spark.operators.spans import rolling_gram_hashes

__all__ = ["DeconStore"]


def _hashed_grams(
    df: DataFrame, id_col: str, text_col: str, ks: list[int], out_id: str
) -> DataFrame:
    """[out_id, k, gram_hash] — distinct rolling-hashed word k-grams per
    doc for every k in ``ks``, ONE kernel pass (spans.rolling_gram_hashes
    — the hash depends only on the token sequence, so the
    decontamination clamp rule composes across store generations).
    NOTE: the hash contract changed in round 4 from xxhash64-of-text to
    the rolling polynomial; stores persisted under the old contract must
    be rebuilt (mixed-contract tables would silently never match)."""
    g = rolling_gram_hashes(
        df, id_col, text_col, ks, out_id=out_id, clamp_short=True
    )
    return g.select(out_id, "k", F.col("h").alias("gram_hash")).distinct()


class DeconStore:
    """Persisted incremental-decontamination state under ``root``:

    - ``root/gram_index``  — (doc_id, k, gram_hash, batch_id)
    - ``root/eval_grams``  — (eval_id, gram_hash, batch_id)
    - ``root/hits``        — (doc_id, eval_id, gram_hash, batch_id)

    Single-writer (same contract as the other incremental stores:
    streaming/sketch_stream.py documents the trade); appends are
    stamped with the caller's ``batch_id`` so re-delivery after a
    failed job is diagnosable. All three tables are plain parquet
    appends — the hit table is output-sized, the eval table is
    benchmark-sized, and the gram index is the one big artifact
    (≈ tokens x 8 bytes x |ks|, the price of never re-reading text).
    """

    def __init__(self, spark: SparkSession, root: str, *, n: int = 13) -> None:
        if n < 1:
            raise ValueError(f"n must be >= 1, got {n}")
        self.spark = spark
        self.root = root.rstrip("/")
        self.n = n
        self._gram_path = f"{self.root}/gram_index"
        self._eval_path = f"{self.root}/eval_grams"
        self._hits_path = f"{self.root}/hits"

    # -- state readers -------------------------------------------------
    def _read(self, path: str) -> DataFrame | None:
        jpath = self.spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        if not fs.exists(jpath):
            return None
        return self.spark.read.parquet(path)

    def ks_indexed(self) -> list[int]:
        g = self._read(self._gram_path)
        if g is None:
            return []
        return sorted(r[0] for r in g.select("k").distinct().collect())

    def ks_needed(self) -> list[int]:
        e = self._read(self._eval_path)
        ks = {self.n}
        if e is not None:
            ks |= {int(r[0]) for r in e.select("k").distinct().collect()}
        return sorted(ks)

    # -- ingest: documents ----------------------------------------------
    def ingest_docs(
        self,
        new_docs: DataFrame,
        *,
        batch_id: int,
        doc_id: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Check a batch of NEW documents against every eval gram seen
        so far, persist their grams into the index, and append + return
        this batch's hit rows ``[doc_id, eval_id, gram_hash]``. The
        probe is a broadcast join (eval grams are benchmark-sized); the
        batch is never shuffled."""
        ks = self.ks_needed()
        # one kernel pass emits (doc, k, hash) for every k — the k
        # column is the reindex bookkeeping
        idx = _hashed_grams(new_docs, doc_id, text_col, ks, "doc_id")
        idx.withColumn("batch_id", F.lit(int(batch_id))).write.mode(
            "append"
        ).parquet(self._gram_path)
        grams = idx.select("doc_id", "gram_hash").distinct()

        ev = self._read(self._eval_path)
        if ev is None:
            # nothing to probe — do NOT write an empty hits file: its
            # placeholder eval_id type could conflict with later appends
            return grams.limit(0).select(
                "doc_id", F.lit(None).cast("long").alias("eval_id"), "gram_hash"
            )
        hits = grams.join(
            F.broadcast(ev.select("eval_id", "gram_hash").distinct()),
            "gram_hash",
        ).select("doc_id", "eval_id", "gram_hash")
        hits = hits.localCheckpoint()
        hits.withColumn("batch_id", F.lit(int(batch_id))).write.mode(
            "append"
        ).parquet(self._hits_path)
        return hits

    # -- ingest: eval docs ----------------------------------------------
    def ingest_eval(
        self,
        new_eval: DataFrame,
        *,
        batch_id: int,
        eval_id: str = "eval_id",
        text_col: str = "text",
        corpus_df: DataFrame | None = None,
        corpus_doc_id: str = "doc_id",
        corpus_text_col: str = "text",
    ) -> DataFrame:
        """Register NEW eval documents: retro-scan every document ever
        ingested against just their grams (a join against the persisted
        gram index — raw corpus text is NOT re-read), persist the eval
        grams, and append + return the new hit rows.

        If the batch introduces a k the gram index has never been built
        for (an eval doc shorter than every previous minimum), the
        corpus must be re-indexed for the missing ks: pass the raw
        ``corpus_df`` to allow it (explicit O(corpus) event, done for
        the missing ks only), else this raises ValueError."""
        new_ks = _eval_gram_lengths(new_eval, text_col, self.n)
        have = set(self.ks_indexed())
        missing = [k for k in new_ks if k not in have]
        g_index = self._read(self._gram_path)
        if missing and g_index is not None:
            if corpus_df is None:
                raise ValueError(
                    f"eval batch needs corpus {missing}-grams which were never "
                    "indexed; pass corpus_df to allow the one-off reindex"
                )
            add = _hashed_grams(
                corpus_df, corpus_doc_id, corpus_text_col, missing, "doc_id"
            )
            add.withColumn("batch_id", F.lit(int(batch_id))).write.mode(
                "append"
            ).parquet(self._gram_path)
            g_index = self._read(self._gram_path)

        # the kernel's k column is the REQUESTED k (= n); the store
        # tracks the EFFECTIVE per-eval-doc k (min(n, len)) via ev_k
        ev_grams = _hashed_grams(
            new_eval, eval_id, text_col, [self.n], "eval_id"
        ).select("eval_id", "gram_hash")
        ev_k = (
            new_eval.select(
                F.col(eval_id).alias("eval_id"),
                F.least(
                    F.size(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")),
                    F.lit(self.n),
                ).alias("k"),
            )
        )
        ev_rows = ev_grams.join(ev_k, "eval_id")
        ev_rows.withColumn("batch_id", F.lit(int(batch_id))).write.mode(
            "append"
        ).parquet(self._eval_path)

        if g_index is None:
            return ev_grams.limit(0).select(
                F.lit(None).cast("long").alias("doc_id"), "eval_id", "gram_hash"
            )
        hits = (
            g_index.select("doc_id", "gram_hash")
            .distinct()
            .join(F.broadcast(ev_grams), "gram_hash")
            .select("doc_id", "eval_id", "gram_hash")
        )
        hits = hits.localCheckpoint()
        hits.withColumn("batch_id", F.lit(int(batch_id))).write.mode(
            "append"
        ).parquet(self._hits_path)
        return hits

    # -- reports ---------------------------------------------------------
    def contaminated(self, *, min_hits: int = 1) -> DataFrame:
        """Accumulated ``[doc_id, n_hits, n_eval_docs]`` over everything
        ingested — equal (w.h.p., see module docstring) to the batch
        operator run once over the full corpus and full eval set."""
        h = self._read(self._hits_path)
        if h is None:
            g = self._read(self._gram_path)
            if g is None:
                raise ValueError("nothing ingested yet")
            return g.select("doc_id").limit(0).select(
                "doc_id",
                F.lit(0).cast("long").alias("n_hits"),
                F.lit(0).cast("long").alias("n_eval_docs"),
            )
        return (
            h.filter(F.col("doc_id").isNotNull())
            .groupBy("doc_id")
            .agg(
                F.countDistinct("gram_hash").alias("n_hits"),
                F.countDistinct("eval_id").alias("n_eval_docs"),
            )
            .filter(F.col("n_hits") >= min_hits)
        )

    def clean_ids(self, docs: DataFrame, *, doc_id: str = "doc_id", min_hits: int = 1) -> DataFrame:
        """``docs`` minus contaminated ones (broadcast anti-join on the
        output-sized flag list) — the pipeline form."""
        flagged = self.contaminated(min_hits=min_hits).select(
            F.col("doc_id").alias(doc_id)
        )
        return docs.join(F.broadcast(flagged), doc_id, "left_anti")
