"""Incremental / streaming sketch accounting over a snapshot table.

The daily-ingest counterpart of operators/sketches.py: a 100 TB corpus
is never re-scanned to answer "how many distinct users so far?", "how
often has this token occurred?" or "might this key already exist?" —
each batch contributes a fixed-size register DELTA, and because all
three sketches merge relationally (HLL = per-bucket MAX, CMS =
per-counter SUM, Bloom = per-word BIT_OR) the current state is a fold
over the deltas, not a recompute over history. Work per batch is
O(batch); query cost is O(deltas) until ``compact()`` folds them back
to one.  ``kind="bloom"`` + ``membership()`` is the incremental-dedup
prefilter: a new batch probes every key ever ingested without joining
history.

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
from tilegrab_spark.plans.snapshots import (
    CommitConflict,
    SnapshotTable,
    _atomic_write_text,
)

__all__ = ["SketchStore", "stream_sketch_ingest"]


class SketchStore:
    """Persisted incremental sketch — ``kind`` is ``"hll"``, ``"cms"``
    or ``"bloom"``.

    HLL params: ``p``. CMS params: ``d``, ``w`` (and optional
    ``count_col`` weighting per batch row). Bloom params: ``m_bits``,
    ``k_hashes``, ``bloom_salt``. ``group_cols`` key all three.
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
        m_bits: int = 1 << 16,
        k_hashes: int = 5,
        bloom_salt: str = "bloom",
    ):
        if kind not in ("hll", "cms", "bloom"):
            raise ValueError(f"kind must be hll|cms|bloom, got {kind!r}")
        self.spark = spark
        self.root = root
        self.kind = kind
        self.key_col = key_col
        self.group_cols = list(group_cols)
        self.p, self.d, self.w, self.count_col = p, d, w, count_col
        self.m_bits, self.k_hashes, self.bloom_salt = m_bits, k_hashes, bloom_salt
        self.table = SnapshotTable(spark, os.path.join(root, "deltas"))
        self._seen: set[int] | None = None
        self._seen_seq: int = 0
        self._check_meta()

    # -- parameter contract -------------------------------------------------

    def _meta(self) -> dict:
        m = {
            "kind": self.kind,
            "key_col": self.key_col,
            "group_cols": self.group_cols,
        }
        if self.kind == "hll":
            m.update({"p": self.p})
        elif self.kind == "cms":
            m.update({"d": self.d, "w": self.w})
        else:
            m.update(
                {
                    "m_bits": self.m_bits,
                    "k_hashes": self.k_hashes,
                    "salt": self.bloom_salt,
                }
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
        if self.kind == "bloom":
            from tilegrab_spark.operators.bloom import bloom_build

            return bloom_build(
                batch_df,
                self.key_col,
                m_bits=self.m_bits,
                k_hashes=self.k_hashes,
                salt=self.bloom_salt,
                group_cols=tuple(self.group_cols),
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
        # json per batch (O(batches²) driver I/O otherwise).
        # _seen_seq records the head the cache reflects: when the head
        # on disk has moved past it (another writer — a violation of the
        # single-writer contract), the cache is stale and is rebuilt
        # from disk instead of trusted.
        head = self.table.current_seq() or 0
        if self._seen is None or head != self._seen_seq:
            self._seen = self.ingested_batches()
            self._seen_seq = head
        return self._seen

    def ingest_batch(self, batch_df: DataFrame, batch_id: int) -> int | None:
        """Commit one batch's register delta; returns the snapshot seq,
        or None when this batch_id already committed (retry/re-delivery
        — the exactly-once guard).

        The fast-path guard is the in-memory ``_seen`` cache (valid under
        the documented single-writer contract: the foreachBatch sink runs
        batches serially through one store instance). Defense in depth
        for the contract being violated — two store instances on the same
        root ingesting concurrently: on ``CommitConflict`` the cache is
        invalidated and re-read FROM DISK; if the competing writer landed
        this very batch_id, the retry becomes a no-op instead of a
        double-count (CMS sums are not idempotent under re-append)."""
        if int(batch_id) in self._seen_cached():
            return None
        self._commit_meta()
        delta = self._batch_delta(batch_df)
        seq = None
        for _ in range(10):
            try:
                # max_retries=1: a head moved by another writer must NOT
                # be silently retried onto (append's default) — it has to
                # surface here so the batch-id check can run first
                seq = self.table.append(
                    delta, summary={"batch_id": int(batch_id)}, max_retries=1
                )
                break
            except CommitConflict:
                self._seen = None  # another writer moved the head: resync
                if int(batch_id) in self._seen_cached():
                    return None
        else:
            raise CommitConflict(
                f"batch {batch_id}: head of {self.table.root} kept moving "
                "across 10 commit attempts"
            )
        # our own commit moved the head: advance the cache marker in
        # lockstep so the next batch's check stays O(1), no disk rescan
        if self._seen is None:
            self._seen = self.ingested_batches()
        self._seen.add(int(batch_id))
        self._seen_seq = seq
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
        if self.kind == "bloom":
            return deltas.groupBy(*self.group_cols, "word_idx").agg(
                F.bit_or("bits").alias("bits")
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

    def membership(
        self, keys: DataFrame, *, as_of: int | None = None,
        out_col: str = "maybe_present",
    ) -> DataFrame:
        """``keys`` + boolean ``out_col`` probed against every key ever
        ingested (False = definitely never seen — the incremental-dedup
        prefilter). ``kind='bloom'`` without group_cols only (a grouped
        probe is a per-group register join — read ``registers()`` and
        compose)."""
        if self.kind != "bloom":
            raise ValueError("membership is for kind='bloom'")
        if self.group_cols:
            raise ValueError(
                "membership requires group_cols=(); probe grouped "
                "registers() directly"
            )
        from tilegrab_spark.operators.bloom import bloom_probe

        return bloom_probe(
            keys,
            self.registers(as_of=as_of),
            self.key_col,
            m_bits=self.m_bits,
            k_hashes=self.k_hashes,
            salt=self.bloom_salt,
            out_col=out_col,
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
        # the compaction advanced the head but folded the same batch
        # set: keep the cache marker in sync so the next ingest doesn't
        # misread our own commit as a foreign writer
        self._seen = set(seen) if self._seen is None else self._seen
        self._seen_seq = seq
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
