"""Incremental weighted reservoir: batch-recompute oracle (any ingest
order lands the one-shot weighted_sample result), time travel,
re-delivery idempotence through compaction, parameter contract, and a
real structured-streaming drive."""

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.sampling import weighted_sample
from tilegrab_spark.plans.snapshots import SnapshotNotFound
from tilegrab_spark.streaming.weighted_reservoir import (
    ReservoirStore,
    stream_weighted_reservoir,
)


def _batches(spark, n=3, rows=500):
    return [
        spark.range(i * rows, (i + 1) * rows).select(
            F.col("id").alias("doc_id"),
            (1.0 + (F.col("id") % 9)).cast("double").alias("w"),
            F.concat(F.lit("payload"), F.col("id")).alias("text"),
        )
        for i in range(n)
    ]


def _ids(df):
    return [r.doc_id for r in df.orderBy("sample_rank").collect()]


def _expected(batches, k):
    whole = batches[0]
    for b in batches[1:]:
        whole = whole.unionByName(b)
    return _ids(weighted_sample(whole, id_col="doc_id", weight_col="w", k=k))


def test_incremental_equals_batch_recompute_any_order(spark, tmp_path):
    batches = _batches(spark)
    want = _expected(batches, 100)
    fwd = ReservoirStore(
        spark, str(tmp_path / "fwd"), id_col="doc_id", weight_col="w", k=100
    )
    for i, b in enumerate(batches):
        assert fwd.ingest_batch(b, i) == i + 1
    assert _ids(fwd.sample()) == want
    rev = ReservoirStore(
        spark, str(tmp_path / "rev"), id_col="doc_id", weight_col="w", k=100
    )
    for i, b in reversed(list(enumerate(batches))):
        rev.ingest_batch(b, i)
    assert _ids(rev.sample()) == want
    # the payload rides along
    row = fwd.sample().orderBy("sample_rank").first()
    assert row.text == f"payload{row.doc_id}"


def test_time_travel_and_rank_prefix(spark, tmp_path):
    batches = _batches(spark)
    store = ReservoirStore(
        spark, str(tmp_path / "tt"), id_col="doc_id", weight_col="w", k=50
    )
    seqs = [store.ingest_batch(b, i) for i, b in enumerate(batches)]
    after2 = _expected(batches[:2], 50)
    assert _ids(store.sample(as_of=seqs[1])) == after2
    assert _ids(store.sample(as_of=seqs[0])) == _expected(batches[:1], 50)
    # the final sample's rank order is the sequential draw order: its
    # prefix equals the k=10 reservoir of the same corpus
    assert _ids(store.sample())[:10] == _expected(batches, 10)


def test_redelivery_noop_and_compaction(spark, tmp_path):
    batches = _batches(spark)
    store = ReservoirStore(
        spark, str(tmp_path / "rd"), id_col="doc_id", weight_col="w", k=80
    )
    for i, b in enumerate(batches[:2]):
        store.ingest_batch(b, i)
    assert store.ingest_batch(batches[0], 0) is None  # re-delivery
    want2 = _expected(batches[:2], 80)
    assert _ids(store.sample()) == want2
    store.compact()
    assert store.table.current_seq() is not None
    assert _ids(store.sample()) == want2
    # re-delivery stays a no-op after compaction (folded_batches)
    assert store.ingest_batch(batches[1], 1) is None
    # a fresh instance on the same root sees the same guard
    again = ReservoirStore(
        spark, str(tmp_path / "rd"), id_col="doc_id", weight_col="w", k=80
    )
    assert again.ingest_batch(batches[0], 0) is None
    again.ingest_batch(batches[2], 2)
    assert _ids(again.sample()) == _expected(batches, 80)


def test_parameter_contract_and_validation(spark, tmp_path):
    store = ReservoirStore(
        spark, str(tmp_path / "pc"), id_col="doc_id", weight_col="w", k=10
    )
    store.ingest_batch(_batches(spark, n=1)[0], 0)
    with pytest.raises(ValueError, match="mismatched race keys"):
        ReservoirStore(
            spark, str(tmp_path / "pc"), id_col="doc_id", weight_col="w", k=20
        )
    with pytest.raises(ValueError, match="mismatched race keys"):
        ReservoirStore(
            spark, str(tmp_path / "pc"), id_col="doc_id", weight_col="w",
            k=10, salt="other",
        )
    with pytest.raises(ValueError, match="positive"):
        ReservoirStore(
            spark, str(tmp_path / "pc2"), id_col="doc_id", weight_col="w", k=0
        )
    empty = ReservoirStore(
        spark, str(tmp_path / "empty"), id_col="doc_id", weight_col="w", k=10
    )
    with pytest.raises(SnapshotNotFound):
        empty.sample()


def test_nonpositive_weights_dropped_and_payload_cols(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (3, -1.0, "c"), (4, 0.5, "d")],
        "doc_id long, w double, text string",
    )
    store = ReservoirStore(
        spark,
        str(tmp_path / "np"),
        id_col="doc_id",
        weight_col="w",
        k=10,
        payload_cols=["doc_id", "w"],
    )
    store.ingest_batch(df, 0)
    got = store.sample()
    assert sorted(r.doc_id for r in got.collect()) == [1, 4]
    assert "text" not in got.columns


def test_streaming_availablenow_drive(spark, tmp_path):
    src = str(tmp_path / "src")
    batches = _batches(spark, n=2)
    for b in batches:
        b.write.mode("append").parquet(src)
    store = ReservoirStore(
        spark, str(tmp_path / "stream"), id_col="doc_id", weight_col="w", k=60
    )
    stream = spark.readStream.schema("doc_id long, w double, text string").parquet(src)
    q = stream_weighted_reservoir(stream, store, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _ids(store.sample()) == _expected(batches, 60)


def test_duplicate_id_resolves_to_smallest_key_deterministically(spark, tmp_path):
    """Outside-the-contract degraded mode: one id committed in two
    deltas with DIFFERENT weights must resolve deterministically to
    the smallest race key (not an arbitrary shuffle-order row)."""
    from tilegrab_spark.operators.sampling import weighted_sample_key

    store = ReservoirStore(
        spark, str(tmp_path / "dup"), id_col="doc_id", weight_col="w", k=50
    )
    b0 = spark.createDataFrame(
        [(i, 1.0, "first") for i in range(40)], "doc_id long, w double, tag string"
    )
    b1 = spark.createDataFrame(
        [(7, 1000.0, "second"), (999, 2.0, "second")],
        "doc_id long, w double, tag string",
    )
    store.ingest_batch(b0, 0)
    store.ingest_batch(b1, 1)
    rows = {r.doc_id: r for r in store.sample().collect()}
    # id 7: w=1000 gives the (much) smaller key -> the second row wins
    key_small = b1.select(
        weighted_sample_key("doc_id", "w").alias("k")
    ).filter(F.col("doc_id") == 7).first().k
    key_big = b0.select(
        weighted_sample_key("doc_id", "w").alias("k")
    ).filter(F.col("doc_id") == 7).first().k
    assert key_small < key_big
    assert rows[7].tag == "second" and rows[7].w == 1000.0
    # stable across compaction too
    store.compact()
    rows2 = {r.doc_id: r for r in store.sample().collect()}
    assert rows2[7].tag == "second"
    assert sorted(rows) == sorted(rows2)
