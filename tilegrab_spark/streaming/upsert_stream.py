"""Streaming UPSERT sink into the snapshot table — the live-ingest
counterpart of plans/epochs.py's batch epoch commit.

A tile/image feed delivers partial updates continuously (new captures,
re-captures of the same cell). The sink folds each micro-batch into the
Iceberg-shaped store as a keyed MERGE:

- **keep-last within the batch** — a micro-batch can carry several
  versions of one key; ``dedup_order_col`` picks the winner (max wins,
  deterministic tie by the full row struct); without it the batch must
  be unique per key (merge_rows' contract).
- **unchanged-row suppression** — with ``content_cols`` set, rows whose
  ``xxhash64(content)`` matches the stored row are dropped BEFORE the
  merge, so a feed that re-delivers mostly-identical snapshots rewrites
  only genuinely-changed files (epochs.py's classification, minus the
  missing-key handling that a partial feed must never do).
- **exactly-once under re-delivery** — every commit records its
  ``batch_id`` in the snapshot summary; a foreachBatch retry of an
  already-committed batch is skipped by reading those summaries back
  (state lives in the table itself — no side store to drift). The sink
  is the table's single writer, same contract as SketchStore; a
  ``CommitConflict`` re-reads the committed batch ids from disk before
  retrying, so a racing duplicate writer degrades to a no-op instead of
  a double-apply.

Work per batch: one key+hash projection scan of the CURRENT table (for
the suppression join) + a file-pruned merge of the changed slice. For
key-clustered stores the suppression scan itself prunes to the batch's
key envelope via ``read(key_ranges=...)`` when ``key_col`` stats are
maintained — pass the cluster key in ``stat_cols``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from tilegrab_spark.plans.snapshots import CommitConflict, SnapshotTable, SnapshotNotFound

__all__ = ["UpsertSink", "stream_upsert"]


class UpsertSink:
    """Serial single-writer upsert sink over one SnapshotTable root."""

    def __init__(
        self,
        table: SnapshotTable,
        *,
        key_cols: tuple,
        content_cols: tuple | None = None,
        dedup_order_col: str | None = None,
        stat_cols: tuple = (),
    ) -> None:
        if not key_cols:
            raise ValueError("key_cols must be non-empty")
        self.table = table
        self.key_cols = tuple(key_cols)
        self.content_cols = tuple(content_cols) if content_cols else None
        self.dedup_order_col = dedup_order_col
        self.stat_cols = tuple(stat_cols) or self.key_cols
        self._seen: set | None = None
        self._seen_seq: int | None = None

    # -- exactly-once bookkeeping (state = the table's own summaries) ----

    def committed_batches(self) -> set:
        try:
            snaps = self.table.snapshots()
        except SnapshotNotFound:
            return set()
        return {
            int(s["summary"]["batch_id"])
            for s in snaps
            if isinstance(s.get("summary"), dict) and "batch_id" in s["summary"]
        }

    def _seen_cached(self) -> set:
        head = self.table.current_seq() or 0
        if self._seen is None or head != self._seen_seq:
            self._seen = self.committed_batches()
            self._seen_seq = head
        return self._seen

    # -- the batch fold ---------------------------------------------------

    def _keep_last(self, df: DataFrame) -> DataFrame:
        if self.dedup_order_col is None:
            return df.dropDuplicates(list(self.key_cols))
        others = [c for c in df.columns if c not in self.key_cols]
        ordered = [self.dedup_order_col] + [
            c for c in others if c != self.dedup_order_col
        ]
        agg = df.groupBy(*self.key_cols).agg(
            F.max(F.struct(*ordered)).alias("_w")
        )
        # restore the input column ORDER — merge_rows matches schemas
        # positionally (simpleString), not by name set
        return agg.select(
            *[
                F.col(c) if c in self.key_cols else F.col(f"_w.{c}").alias(c)
                for c in df.columns
            ]
        )

    def upsert_batch(self, batch_df: DataFrame, batch_id: int) -> int | None:
        """Fold one micro-batch; returns the new snapshot seq, None when
        the batch is empty / all-unchanged / already committed."""
        if int(batch_id) in self._seen_cached():
            return None
        updates = self._keep_last(batch_df)
        if self.content_cols and self.table.current_seq() > 0:
            cur = self.table.read().select(
                *[F.col(k).alias(f"_c_{k}") for k in self.key_cols],
                F.xxhash64(*[F.col(c) for c in self.content_cols]).alias("_h_cur"),
            )
            cond = None
            for k in self.key_cols:
                c = F.col(k) == F.col(f"_c_{k}")
                cond = c if cond is None else (cond & c)
            updates = (
                updates.withColumn(
                    "_h_new", F.xxhash64(*[F.col(c) for c in self.content_cols])
                )
                .join(cur, on=cond, how="left")
                .filter(F.col("_h_cur").isNull() | (F.col("_h_new") != F.col("_h_cur")))
                .drop("_h_new", "_h_cur", *[f"_c_{k}" for k in self.key_cols])
            )
        updates = updates.localCheckpoint()
        if updates.isEmpty():
            return None
        seq = None
        for _ in range(10):
            try:
                seq = self.table.merge_rows(
                    updates, self.key_cols, stat_cols=self.stat_cols,
                    summary={"batch_id": int(batch_id), "op": "stream_upsert"},
                )
                break
            except CommitConflict:
                self._seen = None  # resync from disk; duplicate writer?
                if int(batch_id) in self._seen_cached():
                    return None
        else:
            raise CommitConflict(
                f"batch {batch_id}: head of {self.table.root} kept moving "
                "across 10 merge attempts"
            )
        if self._seen is None:
            self._seen = self.committed_batches()
        self._seen.add(int(batch_id))
        self._seen_seq = seq
        return seq


def stream_upsert(
    stream_df: DataFrame,
    sink: UpsertSink,
    *,
    checkpoint: str,
    query_name: str = "snapshot_upsert",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Attach an UpsertSink to a streaming frame: every micro-batch
    merges into the snapshot table (idempotent under re-delivery).
    ``trigger`` defaults to ``{"availableNow": True}`` (drain and stop);
    a live feed passes e.g. ``{"processingTime": "30 seconds"}``."""

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        sink.upsert_batch(batch_df, epoch_id)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
