"""Streaming upsert sink into the snapshot table: keyed merge per
micro-batch, keep-last within a batch, unchanged-row suppression,
exactly-once under re-delivery (state = the table's own summaries)."""

import pandas as pd

from tilegrab_spark.plans.snapshots import SnapshotTable
from tilegrab_spark.streaming.upsert_stream import UpsertSink, stream_upsert


def _df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["cell", "rev", "caption"])
    return spark.createDataFrame(pdf)


def _state(t):
    return {r["cell"]: (r["rev"], r["caption"]) for r in t.read().collect()}


def test_upsert_batches_fold_and_keep_last(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    sink = UpsertSink(t, key_cols=("cell",), dedup_order_col="rev")
    # batch 0: includes two versions of cell 1 -> rev 3 wins
    assert sink.upsert_batch(_df(spark, [(1, 1, "a"), (1, 3, "a3"), (2, 1, "b")]), 0)
    assert _state(t) == {1: (3, "a3"), 2: (1, "b")}
    # batch 1: update cell 2, insert cell 5
    assert sink.upsert_batch(_df(spark, [(2, 2, "b2"), (5, 1, "e")]), 1)
    assert _state(t) == {1: (3, "a3"), 2: (2, "b2"), 5: (1, "e")}


def test_redelivery_is_skipped_even_across_sink_instances(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    sink = UpsertSink(t, key_cols=("cell",))
    assert sink.upsert_batch(_df(spark, [(1, 1, "a")]), 0) is not None
    seq = t.current_seq()
    # same batch_id retried on THIS sink: skipped
    assert sink.upsert_batch(_df(spark, [(1, 1, "a")]), 0) is None
    # and on a FRESH sink over the same root (restart): still skipped —
    # the committed batch ids live in the table's snapshot summaries
    sink2 = UpsertSink(t, key_cols=("cell",))
    assert sink2.upsert_batch(_df(spark, [(1, 9, "zzz")]), 0) is None
    assert t.current_seq() == seq
    assert _state(t) == {1: (1, "a")}


def test_unchanged_suppression_writes_nothing(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    sink = UpsertSink(t, key_cols=("cell",), content_cols=("rev", "caption"))
    sink.upsert_batch(_df(spark, [(1, 1, "a"), (2, 1, "b")]), 0)
    seq = t.current_seq()
    # batch 1 re-delivers identical content for both keys: no snapshot
    assert sink.upsert_batch(_df(spark, [(1, 1, "a"), (2, 1, "b")]), 1) is None
    assert t.current_seq() == seq
    # batch 2: one key actually changed -> only that one merges
    assert sink.upsert_batch(_df(spark, [(1, 1, "a"), (2, 2, "b2")]), 2) is not None
    assert _state(t) == {1: (1, "a"), 2: (2, "b2")}


def test_stream_upsert_end_to_end(spark, tmp_path):
    src = str(tmp_path / "landing")
    _df(spark, [(1, 1, "a"), (2, 1, "b")]).write.parquet(src)
    t = SnapshotTable(spark, str(tmp_path / "t"))
    sink = UpsertSink(t, key_cols=("cell",), dedup_order_col="rev")
    stream = spark.readStream.schema("cell long, rev long, caption string").parquet(src)
    q = stream_upsert(stream, sink, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _state(t) == {1: (1, "a"), 2: (1, "b")}
    # second drain picks up only the new file
    _df(spark, [(2, 2, "b2"), (3, 1, "c")]).write.mode("append").parquet(src)
    q = stream_upsert(stream, sink, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _state(t) == {1: (1, "a"), 2: (2, "b2"), 3: (1, "c")}
