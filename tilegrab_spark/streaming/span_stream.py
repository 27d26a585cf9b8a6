"""Incremental duplicated-span detection — ExactSubstr dedup (Lee et
al. ACL 2022, ``operators/spans.py``) over a GROWING corpus.

The batch operator re-hashes the whole corpus per run; a daily-ingest
pipeline can't afford that. This store keeps the 16-byte gram HIT INDEX
``(_id, pos, h)`` persisted (the decon recipe: raw text is hashed
exactly once, on arrival) and, per batch, updates exactly the span sets
that can have changed:

- only grams TOUCHED by the batch can change duplication status —
  candidate totals are one hit-index aggregation semi-joined to the
  batch's gram set;
- a gram crossing ``min_count``/``min_docs`` AT THIS BATCH
  retro-activates: historical documents containing it get their span
  sets recomputed (the join probes the hit index with the
  newly-duplicated set — output-sized — exactly like incremental
  decontamination's retro-scan);
- affected documents (batch docs hitting any now-duplicated gram +
  historical docs hitting a newly-duplicated gram) get their FULL
  maximal-interval sets re-derived through the same
  ``merge_hit_islands`` the batch operator uses and committed as a
  per-document REPLACEMENT (span sets only grow — counts are monotone
  — so latest-set-per-doc is the current truth).

``spans()`` then equals ``duplicate_spans`` over everything ingested,
for ANY arrival order (the batch-recompute oracle in
tests/test_span_stream.py), without ever re-reading or re-hashing
committed text. Per-batch cost: hash the batch + hit-index aggregations
pruned to batch-touched and affected-doc gram sets. The hit-index scans
prune further when the index layout is bucketed by the hash (the
cluster-scale path, same note as the decon gram index).

State commits through ``plans/snapshots.py::SnapshotTable`` — the span
replacement lands first, the hit-index delta (carrying the batch_id
summary) last, so a crash between the two replays the batch against
unchanged history and re-emits the identical replacement: net-effect
exactly-once without a two-table transaction. Corpus ids must be unique
across all batches (the store-family contract; distinct-doc counts add
across batches only then).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F
from pyspark.sql.streaming import StreamingQuery

from tilegrab_spark.operators.spans import merge_hit_islands, rolling_gram_hashes
from tilegrab_spark.plans.snapshots import (
    CommitConflict,
    SnapshotNotFound,
    SnapshotTable,
    _atomic_write_text,
)

__all__ = ["SpanStore", "stream_span_dedup"]


class SpanStore:
    """Persisted incremental ExactSubstr span detector (see module
    docstring). ``k``/``min_count``/``min_docs`` are the
    ``duplicate_spans`` parameters, pinned on disk as the table
    contract. ``id_type`` (Spark type name, default ``"long"``) only
    shapes the EMPTY ``spans()`` frame before the first ingest — once
    data exists every schema derives from the ingested batches, any
    orderable id type works."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = 50,
        min_count: int = 2,
        min_docs: int = 1,
        id_type: str = "long",
    ):
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        if min_count < 2:
            raise ValueError(f"min_count must be >= 2, got {min_count}")
        self.spark = spark
        self.root = root
        self.id_col = id_col
        self.text_col = text_col
        self.k = int(k)
        self.min_count = int(min_count)
        self.min_docs = int(min_docs)
        self.id_type = id_type
        self.hits = SnapshotTable(spark, os.path.join(root, "hits"))
        self.spans_table = SnapshotTable(spark, os.path.join(root, "spans"))
        self._seen: set[int] | None = None
        self._seen_seq: int = 0
        self._check_meta()

    # -- parameter contract -------------------------------------------------

    def _meta(self) -> dict:
        return {
            "id_col": self.id_col,
            "text_col": self.text_col,
            "k": self.k,
            "min_count": self.min_count,
            "min_docs": self.min_docs,
        }

    def _meta_path(self) -> str:
        return os.path.join(self.root, "_span_meta.json")

    def _check_meta(self) -> None:
        path = self._meta_path()
        if os.path.exists(path):
            with open(path) as fh:
                on_disk = json.load(fh)
            if on_disk != self._meta():
                raise ValueError(
                    f"span store at {self.root!r} was built with {on_disk}, "
                    f"opened with {self._meta()} — mixed-parameter gram "
                    "indexes never fold; rebuild or open with the original "
                    "parameters"
                )

    def _commit_meta(self) -> None:
        if not os.path.exists(self._meta_path()):
            os.makedirs(self.root, exist_ok=True)
            _atomic_write_text(self._meta_path(), json.dumps(self._meta(), indent=1))

    # -- exactly-once bookkeeping (marker = the HITS table, committed last)

    def ingested_batches(self) -> set[int]:
        seen: set[int] = set()
        try:
            snaps = self.hits.snapshots()
        except SnapshotNotFound:
            return seen
        for s in snaps:
            sm = s.get("summary", {})
            if sm.get("batch_id") is not None:
                seen.add(int(sm["batch_id"]))
            seen.update(int(b) for b in sm.get("folded_batches", []))
        return seen

    def _seen_cached(self) -> set[int]:
        head = self.hits.current_seq() or 0
        if self._seen is None or head != self._seen_seq:
            self._seen = self.ingested_batches()
            self._seen_seq = head
        return self._seen

    # -- internals ----------------------------------------------------------

    def _hist_hits(self, like: DataFrame) -> DataFrame:
        """Committed hit index, or an empty frame with the batch's
        exact hit schema before the first commit (keeps any id type
        union-compatible)."""
        try:
            return self.hits.read()
        except SnapshotNotFound:
            return self.spark.createDataFrame([], like.schema)

    def _totals(self, hits: DataFrame, gram_set: DataFrame) -> DataFrame:
        """[h, n, nd] over ``hits`` restricted to ``gram_set`` (a
        one-column ``h`` frame)."""
        return (
            hits.join(gram_set, "h")
            .groupBy("h")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("_id").alias("nd"),
            )
        )

    def _dup_pred(self, n: Column, nd: Column) -> Column:
        return (n >= self.min_count) & (nd >= self.min_docs)

    # -- writes -------------------------------------------------------------

    def ingest_batch(self, batch_df: DataFrame, batch_id: int) -> int | None:
        """Fold one batch of documents in; returns the hits-table
        snapshot seq, or None for an already-committed batch_id
        (re-delivery). See the module docstring for the crash-replay
        argument (spans first, hits last)."""
        if int(batch_id) in self._seen_cached():
            return None
        self._commit_meta()
        hits_b = rolling_gram_hashes(
            batch_df, self.id_col, self.text_col, [self.k]
        ).drop("k")
        hits_b = hits_b.persist()
        affected = None
        try:
            hist = self._hist_hits(hits_b)
            cand = hits_b.select("h").distinct()
            tot_b = hits_b.groupBy("h").agg(
                F.count(F.lit(1)).alias("n_b"),
                F.countDistinct("_id").alias("nd_b"),
            )
            tot_p = self._totals(hist, cand).withColumnRenamed(
                "n", "n_p"
            ).withColumnRenamed("nd", "nd_p")
            tot = (
                tot_b.join(tot_p, "h", "left")
                .fillna(0, subset=["n_p", "nd_p"])
                .select(
                    "h",
                    (F.col("n_b") + F.col("n_p")).alias("n"),
                    (F.col("nd_b") + F.col("nd_p")).alias("nd"),
                    "n_p",
                    "nd_p",
                )
            )
            dup_now = tot.filter(self._dup_pred(F.col("n"), F.col("nd")))
            newly = dup_now.filter(
                ~self._dup_pred(F.col("n_p"), F.col("nd_p"))
            ).select("h")
            dup_now = dup_now.select("h")
            affected = (
                hist.join(newly, "h")
                .select("_id")
                .unionByName(hits_b.join(dup_now, "h").select("_id"))
                .distinct()
                .persist()
            )
            all_hits = hist.unionByName(hits_b)
            their_hits = all_hits.join(affected, "_id")
            gram2 = their_hits.select("h").distinct()
            tot2 = self._totals(all_hits, gram2)
            dup2 = tot2.filter(self._dup_pred(F.col("n"), F.col("nd"))).select("h")
            marked = their_hits.join(dup2, "h").select("_id", "pos")
            new_sets = merge_hit_islands(marked, self.k, id_col="_id")
            # 1) span replacement sets (idempotent under batch replay)
            if not new_sets.isEmpty():
                upd = (self.spans_table.current_seq() or 0) + 1
                self.spans_table.append(
                    new_sets.withColumn("_upd", F.lit(upd).cast("long")),
                    summary={"batch_id": int(batch_id)},
                )
            # 2) hit-index delta LAST — the completion marker
            seq = None
            for _ in range(10):
                try:
                    seq = self.hits.append(
                        hits_b, summary={"batch_id": int(batch_id)}, max_retries=1
                    )
                    break
                except CommitConflict:
                    self._seen = None
                    if int(batch_id) in self._seen_cached():
                        return None
            else:
                raise CommitConflict(
                    f"batch {batch_id}: head of {self.hits.root} kept moving "
                    "across 10 commit attempts"
                )
        finally:
            if affected is not None:
                affected.unpersist()
            hits_b.unpersist()
        if self._seen is None:
            self._seen = self.ingested_batches()
        self._seen.add(int(batch_id))
        self._seen_seq = seq
        return seq

    # -- reads --------------------------------------------------------------

    def spans(self) -> DataFrame:
        """``[id_col, start_tok, end_tok, n_grams]`` — current maximal
        duplicated spans of everything ingested ≡ ``duplicate_spans``
        over the union of all batches. Latest replacement set per doc
        wins (span sets only grow). Empty frame before any batch."""
        try:
            raw = self.spans_table.read()
        except SnapshotNotFound:
            return self.spark.createDataFrame(
                [],
                f"{self.id_col} {self.id_type}, start_tok int, "
                "end_tok int, n_grams long",
            )
        w = Window.partitionBy("_id")
        return (
            raw.withColumn("_mx", F.max("_upd").over(w))
            .filter(F.col("_upd") == F.col("_mx"))
            .select(
                F.col("_id").alias(self.id_col),
                "start_tok",
                "end_tok",
                "n_grams",
            )
        )

    def compact(self) -> None:
        """Fold the span table to the current per-doc sets and the hit
        index to one delta; batch idempotence survives through
        ``folded_batches`` on the hits compaction (the marker table)."""
        sh = self.spans_table.current_seq()
        if sh:
            w = Window.partitionBy("_id")
            cur = (
                self.spans_table.read(as_of=sh)
                .withColumn("_mx", F.max("_upd").over(w))
                .filter(F.col("_upd") == F.col("_mx"))
                .drop("_mx")
            )
            self.spans_table.replace(
                cur, summary={"compaction": True}, expected_parent=sh
            )
            self.spans_table.expire_snapshots(keep_last=1)
        hh = self.hits.current_seq()
        if hh:
            seen = sorted(self.ingested_batches())
            seq = self.hits.replace(
                self.hits.read(as_of=hh),
                summary={"compaction": True, "folded_batches": seen},
                expected_parent=hh,
            )
            self.hits.expire_snapshots(keep_last=1)
            self._seen = set(seen)
            self._seen_seq = seq


def stream_span_dedup(
    stream_df: DataFrame,
    store: SpanStore,
    *,
    checkpoint: str,
    query_name: str = "span_dedup",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Attach a SpanStore to a streaming frame: every micro-batch folds
    in (idempotent under epoch re-delivery). Default trigger
    ``{"availableNow": True}`` drains and stops."""

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        store.ingest_batch(batch_df, epoch_id)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
