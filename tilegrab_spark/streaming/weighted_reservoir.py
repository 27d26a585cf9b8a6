"""Incremental weighted reservoir — the always-current k-row weighted
sample of an unbounded stream.

The streaming counterpart of ``operators/sampling.py::weighted_sample``:
a training-data service wants "the current best-k quality-weighted
sample of everything ingested so far" without ever re-scanning history.
Because the A-ES race key ``-ln((hash+1)/2^60)/w`` is a PURE FUNCTION of
(id, weight, salt), bottom-k is an associative, commutative, idempotent
fold: each batch contributes its own bottom-k as a DELTA (≤ k rows —
batch rows that can't beat the batch's k-th key can never enter the
global sample), and the current reservoir is bottom-k over the committed
deltas. Work per batch is O(batch + k); query cost is O(deltas·k) until
``compact()`` folds the deltas back to one. Ingesting batches in ANY
order — or re-ingesting after a crash — lands the IDENTICAL sample a
one-shot ``weighted_sample`` over the union would pick (the
batch-recompute oracle in tests/test_weighted_reservoir.py pins this).

Deltas commit through ``plans/snapshots.py::SnapshotTable`` — same
guarantees as the sketch/upsert stores: a killed batch's half-written
delta is invisible, ``as_of=`` time-travels the reservoir to any earlier
batch, and ``ingested_batches()`` makes foreachBatch re-delivery a
no-op. The sampling parameters are part of the table contract (pinned in
``_reservoir_meta.json``; re-opening with a different k/salt/column set
raises — a fold across mismatched race keys is silently wrong).

The reference has no analogue (engine-extension operator, driver brief).
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from tilegrab_spark.operators.sampling import weighted_sample_key
from tilegrab_spark.plans.snapshots import (
    CommitConflict,
    SnapshotTable,
    _atomic_write_text,
)

__all__ = ["ReservoirStore", "stream_weighted_reservoir"]


class ReservoirStore:
    """Persisted incremental weighted sample without replacement.

    ``payload_cols`` selects what rides along with each sampled row
    (defaults to every batch column); ``id_col`` must be globally
    unique across ALL batches (the weighted_sample contract — the race
    key is drawn from it) and ``weight_col`` must be stable per id
    (the same id arriving twice with different weights would race
    under two different keys; reads resolve such duplicates
    deterministically to the SMALLEST race key — ingest-order
    independent — but the honest contract is immutable weights).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        id_col: str,
        weight_col: str,
        k: int,
        salt: str = "",
        payload_cols: Sequence[str] | None = None,
    ):
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        self.spark = spark
        self.root = root
        self.id_col = id_col
        self.weight_col = weight_col
        self.k = int(k)
        self.salt = salt
        self.payload_cols = list(payload_cols) if payload_cols is not None else None
        self.table = SnapshotTable(spark, os.path.join(root, "deltas"))
        self._seen: set[int] | None = None
        self._seen_seq: int = 0
        self._check_meta()

    # -- parameter contract -------------------------------------------------

    def _meta(self) -> dict:
        return {
            "id_col": self.id_col,
            "weight_col": self.weight_col,
            "k": self.k,
            "salt": self.salt,
            "payload_cols": self.payload_cols,
        }

    def _meta_path(self) -> str:
        return os.path.join(self.root, "_reservoir_meta.json")

    def _check_meta(self) -> None:
        path = self._meta_path()
        if os.path.exists(path):
            with open(path) as fh:
                on_disk = json.load(fh)
            if on_disk != self._meta():
                raise ValueError(
                    f"reservoir at {self.root!r} was built with {on_disk}, "
                    f"opened with {self._meta()} — a bottom-k fold across "
                    "mismatched race keys is silently wrong; rebuild or "
                    "open with the original parameters"
                )

    def _commit_meta(self) -> None:
        if not os.path.exists(self._meta_path()):
            os.makedirs(self.root, exist_ok=True)
            _atomic_write_text(self._meta_path(), json.dumps(self._meta(), indent=1))

    # -- writes -------------------------------------------------------------

    def _batch_delta(self, batch_df: DataFrame) -> DataFrame:
        """The batch's own bottom-k with the race key materialized —
        the only rows that could ever enter the global reservoir. Plans
        as TakeOrderedAndProject (per-task top-k, no global sort)."""
        cols = self.payload_cols
        if cols is None:
            cols = [c for c in batch_df.columns]
        for need in (self.id_col, self.weight_col):
            if need not in cols:
                cols = [need, *cols]
        d = batch_df.filter(
            F.col(self.weight_col).isNotNull() & (F.col(self.weight_col) > 0)
        ).select(*cols)
        key = weighted_sample_key(self.id_col, self.weight_col, self.salt)
        return (
            d.withColumn("_wkey", key)
            .orderBy(F.col("_wkey").asc(), F.col(self.id_col).asc())
            .limit(self.k)
        )

    def ingested_batches(self, *, max_seq: int | None = None) -> set[int]:
        """Every batch id folded into the current state — directly
        committed or carried through a compaction's ``folded_batches``."""
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
        # single-writer contract (foreachBatch runs batches serially);
        # rebuilt from disk whenever the on-disk head moved past what
        # this instance committed (a foreign writer)
        head = self.table.current_seq() or 0
        if self._seen is None or head != self._seen_seq:
            self._seen = self.ingested_batches()
            self._seen_seq = head
        return self._seen

    def ingest_batch(self, batch_df: DataFrame, batch_id: int) -> int | None:
        """Commit one batch's bottom-k delta; returns the snapshot seq,
        or None when this batch_id already committed (re-delivery —
        the exactly-once guard, same recipe as SketchStore: on
        CommitConflict the seen-set re-reads from disk before a
        retry, so a competing writer landing the same batch_id turns
        the retry into a no-op)."""
        if int(batch_id) in self._seen_cached():
            return None
        self._commit_meta()
        delta = self._batch_delta(batch_df)
        seq = None
        for _ in range(10):
            try:
                seq = self.table.append(
                    delta, summary={"batch_id": int(batch_id)}, max_retries=1
                )
                break
            except CommitConflict:
                self._seen = None
                if int(batch_id) in self._seen_cached():
                    return None
        else:
            raise CommitConflict(
                f"batch {batch_id}: head of {self.table.root} kept moving "
                "across 10 commit attempts"
            )
        if self._seen is None:
            self._seen = self.ingested_batches()
        self._seen.add(int(batch_id))
        self._seen_seq = seq
        return seq

    # -- reads --------------------------------------------------------------

    def sample(self, *, as_of: int | None = None) -> DataFrame:
        """The current reservoir: exactly k rows (fewer if less was
        ingested) + ``sample_rank`` — identical to ``weighted_sample``
        over everything ingested. Duplicate ids across deltas (possible
        only outside the unique-id contract) collapse to one row each
        before ranking. The fold input is O(deltas·k) rows, so the
        bottom-k re-take is cheap regardless of corpus size."""
        from pyspark.sql import Window

        deltas = self.table.read(as_of=as_of)
        dedup = self._dedup_smallest_key(deltas)
        out = (
            dedup.orderBy(F.col("_wkey").asc(), F.col(self.id_col).asc())
            .limit(self.k)
        )
        w = Window.orderBy(F.col("_wkey").asc(), F.col(self.id_col).asc())
        return out.withColumn("sample_rank", F.row_number().over(w)).drop("_wkey")

    def _dedup_smallest_key(self, deltas: DataFrame) -> DataFrame:
        """One row per id, the SMALLEST race key winning — deterministic
        even in the degraded outside-the-contract case of one id
        committed with different weights across deltas (dropDuplicates
        would keep a shuffle-order-dependent arbitrary row)."""
        from pyspark.sql import Window

        w = Window.partitionBy(self.id_col).orderBy(F.col("_wkey").asc())
        return (
            deltas.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def compact(self) -> int | None:
        """Replace the committed deltas with the current k-row fold and
        expire history — query cost returns to O(k). Batch idempotence
        survives via ``folded_batches``; the fold and replace pin to one
        snapshot (CAS), so a delta committed mid-compaction raises
        instead of being dropped."""
        head = self.table.current_seq()
        if head == 0:
            return None
        seen = sorted(self.ingested_batches(max_seq=head))
        folded = (
            self._dedup_smallest_key(self.table.read(as_of=head))
            .orderBy(F.col("_wkey").asc(), F.col(self.id_col).asc())
            .limit(self.k)
        )
        seq = self.table.replace(
            folded,
            summary={"compaction": True, "folded_batches": seen},
            expected_parent=head,
        )
        self.table.expire_snapshots(keep_last=1)
        # unconditional: a stale cache kept here would stamp the new
        # head onto a seen-set missing any foreign writer's batches
        self._seen = set(seen)
        self._seen_seq = seq
        return seq


def stream_weighted_reservoir(
    stream_df: DataFrame,
    store: ReservoirStore,
    *,
    checkpoint: str,
    query_name: str = "weighted_reservoir",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Attach a ReservoirStore to a streaming frame: every micro-batch
    commits its bottom-k delta (idempotent under epoch re-delivery).
    Default trigger ``{"availableNow": True}`` drains and stops."""

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        store.ingest_batch(batch_df, epoch_id)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
