"""Incremental / streaming sketch accounting over a snapshot table.

The daily-ingest counterpart of operators/sketches.py: a 100 TB corpus
is never re-scanned to answer "how many distinct users so far?" or "how
often has this token occurred?" — each batch contributes a fixed-size
register DELTA, and because both sketches merge relationally (HLL =
per-bucket MAX, CMS = per-counter SUM) the current state is a fold over
the deltas, not a recompute over history. Work per batch is O(batch);
query cost is O(deltas) until ``compact()`` folds them back to one.

Deltas commit through ``plans/snapshots.py::SnapshotTable``, which buys
the same guarantees the lineage store gets: a killed batch's
half-written delta is invisible (readers plan from the last committed
snapshot), `as_of=` time-travels the register state to any earlier
batch, and `ingested_batches()` makes re-delivery idempotent —
``foreachBatch`` retries of an already-committed epoch are skipped, the
same exactly-once recipe as streaming/ingest.py.

The sketch parameters are part of the table contract (same spirit as
``dedup.check_sig_version``): they are pinned in ``_sketch_meta.json``
at the root on first ingest and re-opening with different parameters
raises instead of silently folding incompatible registers.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from tilegrab_spark.operators.sketches import cms_estimate, cms_sketch, hll_registers, hll_summary
from tilegrab_spark.plans.snapshots import SnapshotTable, _atomic_write_text

__all__ = ["SketchStore", "stream_sketch_ingest"]


class SketchStore:
    """Persisted incremental sketch — ``kind`` is ``"hll"`` or ``"cms"``.

    HLL params: ``p``. CMS params: ``d``, ``w`` (and optional
    ``count_col`` weighting per batch row). ``group_cols`` key both.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        kind: str,
        key_col: str,
        group_cols: Sequence[str] = (),
        p: int = 12,
        d: int = 4,
        w: int = 1024,
        count_col: str | None = None,
    ):
        if kind not in ("hll", "cms"):
            raise ValueError(f"kind must be hll|cms, got {kind!r}")
        self.spark = spark
        self.root = root
        self.kind = kind
        self.key_col = key_col
        self.group_cols = list(group_cols)
        self.p, self.d, self.w, self.count_col = p, d, w, count_col
        self.table = SnapshotTable(spark, os.path.join(root, "deltas"))
        self._seen: set[int] | None = None
        self._check_meta()

    # -- parameter contract -------------------------------------------------

    def _meta(self) -> dict:
        m = {
            "kind": self.kind,
            "key_col": self.key_col,
            "group_cols": self.group_cols,
        }
        m.update(
            {"p": self.p} if self.kind == "hll" else {"d": self.d, "w": self.w}
        )
        return m

    def _meta_path(self) -> str:
        return os.path.join(self.root, "_sketch_meta.json")

    def _check_meta(self) -> None:
        path = self._meta_path()
        if os.path.exists(path):
            with open(path) as fh:
                on_disk = json.load(fh)
            if on_disk != self._meta():
                raise ValueError(
                    f"sketch table at {self.root!r} was built with "
                    f"{on_disk}, opened with {self._meta()} — incompatible "
                    "registers never fold; rebuild or open with the "
                    "original parameters"
                )

    def _commit_meta(self) -> None:
        if not os.path.exists(self._meta_path()):
            os.makedirs(self.root, exist_ok=True)
            _atomic_write_text(self._meta_path(), json.dumps(self._meta(), indent=1))

    # -- writes -------------------------------------------------------------

    def _batch_delta(self, batch_df: DataFrame) -> DataFrame:
        if self.kind == "hll":
            return hll_registers(
                batch_df, key_col=self.key_col, group_cols=self.group_cols, p=self.p
            )
        return cms_sketch(
            batch_df,
            key_col=self.key_col,
            count_col=self.count_col,
            group_cols=self.group_cols,
            d=self.d,
            w=self.w,
        )

    def ingested_batches(self, *, max_seq: int | None = None) -> set[int]:
        """Every batch id folded into the current state — directly
        committed or carried through a compaction's ``folded_batches``
        (so re-delivery stays a no-op even after history is expired)."""
        seen: set[int] = set()
        for s in self.table.snapshots():
            if max_seq is not None and s["seq"] > max_seq:
                continue
            sm = s.get("summary", {})
            if sm.get("batch_id") is not None:
                seen.add(int(sm["batch_id"]))
            seen.update(int(b) for b in sm.get("folded_batches", []))
        return seen

    def _seen_cached(self) -> set[int]:
        # the store is the table's single writer (the foreachBatch sink
        # runs batches serially), so the seen-set only grows through
        # this instance — scan the snapshot metadata once, then
        # maintain incrementally instead of re-reading every snapshot
        # json per batch (O(batches²) driver I/O otherwise)
        if self._seen is None:
            self._seen = self.ingested_batches()
        return self._seen

    def ingest_batch(self, batch_df: DataFrame, batch_id: int) -> int | None:
        """Commit one batch's register delta; returns the snapshot seq,
        or None when this batch_id already committed (retry/re-delivery
        — the exactly-once guard)."""
        if int(batch_id) in self._seen_cached():
            return None
        self._commit_meta()
        seq = self.table.append(
            self._batch_delta(batch_df), summary={"batch_id": int(batch_id)}
        )
        self._seen_cached().add(int(batch_id))
        return seq


    # -- reads --------------------------------------------------------------

    def registers(self, *, as_of: int | None = None) -> DataFrame:
        """Folded register state. Raises ``SnapshotNotFound`` for a
        store no batch has committed to yet (same contract as
        ``SnapshotTable.read``)."""
        deltas = self.table.read(as_of=as_of)
        if self.kind == "hll":
            return deltas.groupBy(*self.group_cols, "bucket").agg(
                F.max("rho").alias("rho")
            )
        return deltas.groupBy(*self.group_cols, "row", "bucket").agg(
            F.sum("cnt").alias("cnt")
        )

    def distinct_summary(self, *, as_of: int | None = None) -> DataFrame:
        if self.kind != "hll":
            raise ValueError("distinct_summary is for kind='hll'")
        return hll_summary(
            self.registers(as_of=as_of), group_cols=self.group_cols, p=self.p
        )

    def frequency_estimates(
        self, keys: DataFrame, *, as_of: int | None = None
    ) -> DataFrame:
        if self.kind != "cms":
            raise ValueError("frequency_estimates is for kind='cms'")
        return cms_estimate(
            self.registers(as_of=as_of),
            keys,
            key_col=self.key_col,
            group_cols=self.group_cols,
            d=self.d,
            w=self.w,
        )

    def compact(self) -> int | None:
        """Fold all committed deltas into one and REPLACE the table
        content with the fold (an append would double-count the CMS
        sums), then expire old snapshots — query cost returns to
        O(registers). Batch idempotence info survives: already-ingested
        batch ids are folded into the compaction commit's summary. The
        fold, its batch list and the replace are all pinned to ONE
        snapshot (CAS via ``expected_parent``), so a delta committed
        mid-compaction raises CommitConflict instead of being silently
        dropped."""
        head = self.table.current_seq()
        if head == 0:
            return None
        seen = sorted(self.ingested_batches(max_seq=head))
        seq = self.table.replace(
            self.registers(as_of=head),
            summary={"compaction": True, "folded_batches": seen},
            expected_parent=head,
        )
        self.table.expire_snapshots(keep_last=1)
        return seq


def stream_sketch_ingest(
    stream_df: DataFrame,
    store: SketchStore,
    *,
    checkpoint: str,
    query_name: str = "sketch_ingest",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Attach a SketchStore to a streaming frame: every micro-batch
    commits its register delta (idempotent under epoch re-delivery).

    ``trigger`` passes through to ``writeStream.trigger`` — default
    ``{"availableNow": True}`` drains what exists and stops (the
    batch-catchup shape); a long-running ingest passes e.g.
    ``{"processingTime": "30 seconds"}``.
    """

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        store.ingest_batch(batch_df, epoch_id)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
