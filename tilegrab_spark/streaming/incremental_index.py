"""Incremental BM25 index maintenance over snapshot tables — the
daily-ingest counterpart of ``operators/retrieval.py``: a 100 TB corpus
is never re-tokenized to serve search; each batch appends its postings
delta and a vocabulary-sized df delta, and a query folds only what it
touches.

Layout under ``root`` (both through ``plans/snapshots.SnapshotTable``,
so half-written batches are invisible, re-delivery is idempotent via
commit summaries, and ``as_of`` time-travels the index):

- ``postings/``: (tb, term, id, tf, dl) rows, range-partitioned by
  ``tb = pmod(xxhash64(term), n_buckets)`` with per-file tb stats —
  a query's candidate scan PRUNES to its own term buckets via the
  manifest (the same PartitionFilter discipline as the IVF index), so
  search cost tracks queried postings lists, never corpus size or
  batch count.
- ``dfreq/``: per-batch (term, df) deltas; document frequency is a
  vocabulary-sized fold over deltas (``compact()`` collapses history
  back to one delta + one postings rewrite, CAS-guarded).
- corpus scalars (n_docs, dl_sum) ride each postings commit summary —
  N and avgdl fold from snapshot metadata, no data scan.

The tokenizer contract (lowercase ``[^a-z0-9]+`` runs, the
retrieval.py convention) is pinned in ``_index_meta.json``; reopening
with different parameters raises instead of silently mixing
incompatible postings. Document ids must be unique ACROSS batches
(re-ingesting a doc double-counts it — dedup upstream, the usual
exactly-once-by-key discipline).

The pytest pins multi-batch ingest == one-shot ``bm25_search`` rebuild
at 1e-12, re-delivery no-ops, compaction invariance, file pruning, and
time travel.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from tilegrab_spark.operators.retrieval import TextIndex, _tokens, bm25_topk
from tilegrab_spark.plans.snapshots import SnapshotTable, _atomic_write_text

__all__ = ["TextIndexStore"]


class TextIndexStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_buckets: int = 64,
    ):
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        self.spark = spark
        self.root = root
        self.id_col = id_col
        self.text_col = text_col
        self.n_buckets = int(n_buckets)
        self.postings = SnapshotTable(spark, os.path.join(root, "postings"))
        self.dfreq = SnapshotTable(spark, os.path.join(root, "dfreq"))
        self._check_meta()

    # -- parameter contract --------------------------------------------------

    def _meta(self) -> dict:
        return {
            "tokenizer": "lower-alnum-v1",
            "id_col": self.id_col,
            "text_col": self.text_col,
            "n_buckets": self.n_buckets,
        }

    def _meta_path(self) -> str:
        return os.path.join(self.root, "_index_meta.json")

    def _check_meta(self) -> None:
        if os.path.exists(self._meta_path()):
            with open(self._meta_path()) as fh:
                on_disk = json.load(fh)
            if on_disk != self._meta():
                raise ValueError(
                    f"text index at {self.root!r} was built with {on_disk}, "
                    f"opened with {self._meta()} — rebuild or reopen with "
                    "the original parameters"
                )

    def _commit_meta(self) -> None:
        if not os.path.exists(self._meta_path()):
            os.makedirs(self.root, exist_ok=True)
            _atomic_write_text(self._meta_path(), json.dumps(self._meta(), indent=1))

    # -- ingest ---------------------------------------------------------------

    def _tb(self):
        return F.pmod(F.xxhash64("term"), F.lit(self.n_buckets)).cast("int")

    def ingested_batches(self, *, max_seq: int | None = None) -> set[int]:
        seen: set[int] = set()
        for s in self.postings.snapshots():
            if max_seq is not None and s["seq"] > max_seq:
                continue
            sm = s.get("summary", {})
            if sm.get("batch_id") is not None:
                seen.add(int(sm["batch_id"]))
            seen.update(int(b) for b in sm.get("folded_batches", []))
        return seen

    def ingest_batch(self, docs: DataFrame, batch_id: int) -> int | None:
        """Append one batch's postings + df deltas; returns the postings
        snapshot seq, or None when this ``batch_id`` already committed
        (re-delivery no-op)."""
        if int(batch_id) in self.ingested_batches():
            return None
        toks = docs.select(
            F.col(self.id_col).alias("id"), _tokens(self.text_col).alias("_toks")
        )
        stats = toks.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.size("_toks")).alias("dls")
        ).first()
        n_docs, dl_sum = int(stats["n"]), int(stats["dls"] or 0)
        delta = (
            toks.select("id", F.size("_toks").alias("dl"), F.explode("_toks").alias("term"))
            .groupBy("id", "term")
            .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
            .withColumn("tb", self._tb())
            .select("tb", "term", "id", "tf", "dl")
        )
        # range-partition on tb so each data file covers a narrow bucket
        # span — the manifest tb stats then prune query scans
        nparts = min(self.n_buckets, max(2, self.spark.sparkContext.defaultParallelism))
        delta = delta.repartitionByRange(nparts, "tb")
        self._commit_meta()
        summary = {"batch_id": int(batch_id), "n_docs": n_docs, "dl_sum": dl_sum}
        # the two-table commit is dfreq-first and NOT atomic: the
        # idempotence check keys off POSTINGS, so a crash between the
        # two appends re-runs this batch — guard the dfreq side by its
        # own committed batch set so the retry can't double-append df
        already_df = {
            int(b)
            for s in self.dfreq.snapshots()
            for b in (
                ([s["summary"]["batch_id"]] if s.get("summary", {}).get("batch_id") is not None else [])
                + list(s.get("summary", {}).get("folded_batches", []))
            )
        }
        if int(batch_id) not in already_df:
            dfd = delta.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
            self.dfreq.append(dfd, summary={"batch_id": int(batch_id)})
        return self.postings.append(delta, stat_cols=("tb",), summary=summary)

    # -- reads ----------------------------------------------------------------

    def _fold_sums(self, as_of: int | None = None) -> tuple[int, int]:
        """Exact (n_docs, dl_sum) folded from commit summaries — a
        replace snapshot's summary carries the whole fold, so the walk
        resets there. No data scan."""
        n = dls = 0
        for s in sorted(self.postings.snapshots(), key=lambda x: x["seq"]):
            if as_of is not None and s["seq"] > as_of:
                continue
            if s.get("operation") == "replace":
                n = dls = 0
            sm = s.get("summary", {})
            n += int(sm.get("n_docs", 0))
            dls += int(sm.get("dl_sum", 0))
        return n, dls

    def corpus_stats(self, *, as_of: int | None = None) -> tuple[int, float]:
        """(n_docs, avgdl) folded from commit summaries — no data scan."""
        n, dls = self._fold_sums(as_of)
        if n == 0:
            raise ValueError("empty index")
        return n, dls / n

    def search(
        self,
        queries: DataFrame,
        *,
        k: int = 10,
        query_id: str = "query_id",
        text_col: str = "text",
        k1: float = 1.2,
        b: float = 0.75,
        as_of: int | None = None,
    ) -> DataFrame:
        """BM25 top-k per query over the index as of a snapshot (default
        latest). The postings scan is pruned to the query terms' tb
        buckets (bounded driver collect of ≤ |distinct query terms|
        ints, the IVF-probe pattern)."""
        qterms = queries.select(
            F.col(query_id), F.explode(F.array_distinct(_tokens(text_col))).alias("term")
        )
        tbs = sorted(
            r[0]
            for r in qterms.select(self._tb().alias("tb")).distinct().collect()
        )
        if not tbs:
            from pyspark.sql import types as T

            id_type = {f.name: f.dataType for f in self.postings.schema().fields}["id"]
            schema = T.StructType(
                [
                    queries.schema[query_id],
                    T.StructField(self.id_col, id_type),
                    T.StructField("score", T.DoubleType()),
                    T.StructField("rank", T.IntegerType()),
                ]
            )
            return self.spark.createDataFrame([], schema)
        post = self.postings.read(
            as_of=as_of, key_col="tb", key_ranges=[(t, t) for t in tbs]
        ).drop("tb")
        dfreq = (
            self.dfreq.read(as_of=self._dfreq_seq_for(as_of))
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
        )
        n, avgdl = self.corpus_stats(as_of=as_of)
        idx = TextIndex(
            postings=post.withColumnRenamed("id", self.id_col),
            dfreq=dfreq,
            n_docs=n,
            avgdl=avgdl,
            id_col=self.id_col,
        )
        return bm25_topk(idx, queries, k=k, query_id=query_id,
                         text_col=text_col, k1=k1, b=b)

    def _dfreq_seq_for(self, postings_as_of: int | None) -> int | None:
        """dfreq snapshot matching a postings snapshot: the two tables
        commit in lockstep (dfreq first), so align on batch sets."""
        if postings_as_of is None:
            return None
        want = self.ingested_batches(max_seq=postings_as_of)
        best = None
        acc: set[int] = set()
        for s in sorted(self.dfreq.snapshots(), key=lambda x: x["seq"]):
            sm = s.get("summary", {})
            if sm.get("batch_id") is not None:
                acc.add(int(sm["batch_id"]))
            acc.update(int(b) for b in sm.get("folded_batches", []))
            if acc == want:
                best = s["seq"]
        if best is None:
            raise ValueError(
                f"no dfreq snapshot matches postings as_of={postings_as_of}"
            )
        return best

    # -- maintenance ------------------------------------------------------------

    def compact(self) -> int:
        """Fold postings and df history into one snapshot each
        (CAS-guarded: concurrent appends fail the rewrite rather than
        being erased). Postings rows are disjoint across batches, so
        the rewrite only re-clusters files by tb; df deltas genuinely
        fold (sum per term)."""
        head = self.postings.current_seq()
        batches = sorted(self.ingested_batches())
        nparts = min(self.n_buckets, max(2, self.spark.sparkContext.defaultParallelism))
        folded_posts = self.postings.read().repartitionByRange(nparts, "tb")
        n, dl_sum = self._fold_sums()
        dhead = self.dfreq.current_seq()
        folded_df = self.dfreq.read().groupBy("term").agg(F.sum("df").alias("df"))
        self.dfreq.replace(
            folded_df,
            expected_parent=dhead,
            summary={"folded_batches": batches},
        )
        return self.postings.replace(
            folded_posts,
            stat_cols=("tb",),
            expected_parent=head,
            summary={"folded_batches": batches, "n_docs": n, "dl_sum": dl_sum},
        )
