"""Incremental span store: batch-recompute oracle under interleaved
arrival orders, retro-activation of historical documents, min_docs
policy, re-delivery idempotence, compaction, parameter contract, and a
structured-streaming drive."""

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.spans import duplicate_spans
from tilegrab_spark.streaming.span_stream import SpanStore, stream_span_dedup

BOILER = "all rights reserved by the publisher"
QUOTE = "to be or not to be that is the question"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(spark):
    """Three batches; duplications cross batch boundaries so spans only
    appear once the later copy arrives."""
    b0 = _docs(spark, [
        (1, f"alpha beta {BOILER} gamma delta"),
        (2, "unique words only here nothing shared at all"),
    ])
    b1 = _docs(spark, [
        (3, f"{QUOTE} plus some trailing content"),
        (4, f"opening statement {BOILER} closing statement"),  # dups doc 1
    ])
    b2 = _docs(spark, [
        (5, f"second copy {QUOTE} appears now"),  # dups doc 3
        (6, "another fully unique document with fresh words"),
    ])
    return [b0, b1, b2]


def _sets(df):
    return sorted(
        (r.doc_id, r.start_tok, r.end_tok, r.n_grams) for r in df.collect()
    )


def test_incremental_equals_batch_recompute_orders(spark, tmp_path):
    batches = _corpus(spark)
    whole = batches[0].unionByName(batches[1]).unionByName(batches[2])
    want = _sets(duplicate_spans(whole, k=4))
    assert want  # fixture sanity: cross-batch dups exist
    for name, order in (("fwd", [0, 1, 2]), ("rev", [2, 1, 0]), ("mid", [1, 2, 0])):
        store = SpanStore(spark, str(tmp_path / name), k=4)
        for i in order:
            assert store.ingest_batch(batches[i], i) is not None
        assert _sets(store.spans()) == want, f"order {name}"


def test_retro_activation_of_historical_docs(spark, tmp_path):
    batches = _corpus(spark)
    store = SpanStore(spark, str(tmp_path / "retro"), k=4)
    store.ingest_batch(batches[0], 0)
    assert store.spans().count() == 0  # no dup yet
    store.ingest_batch(batches[1], 1)
    ids = {r.doc_id for r in store.spans().collect()}
    assert ids == {1, 4}  # doc 1 (historical) retro-activated
    store.ingest_batch(batches[2], 2)
    ids = {r.doc_id for r in store.spans().collect()}
    assert ids == {1, 3, 4, 5}


def test_min_docs_policy_ignores_within_doc_repeats(spark, tmp_path):
    rep = "one two three four one two three four"  # k=4 gram twice in ONE doc
    d = _docs(spark, [(1, rep), (2, "totally different words everywhere")])
    loose = SpanStore(spark, str(tmp_path / "loose"), k=4, min_docs=1)
    loose.ingest_batch(d, 0)
    assert {r.doc_id for r in loose.spans().collect()} == {1}
    strict = SpanStore(spark, str(tmp_path / "strict"), k=4, min_docs=2)
    strict.ingest_batch(d, 0)
    assert strict.spans().count() == 0
    # oracle parity for both policies
    assert _sets(loose.spans()) == _sets(duplicate_spans(d, k=4, min_docs=1))
    assert _sets(strict.spans()) == _sets(duplicate_spans(d, k=4, min_docs=2))


def test_redelivery_noop_and_compaction(spark, tmp_path):
    batches = _corpus(spark)
    store = SpanStore(spark, str(tmp_path / "rd"), k=4)
    for i, b in enumerate(batches[:2]):
        store.ingest_batch(b, i)
    want = _sets(store.spans())
    assert store.ingest_batch(batches[0], 0) is None
    assert _sets(store.spans()) == want
    store.compact()
    assert _sets(store.spans()) == want
    assert store.ingest_batch(batches[1], 1) is None  # survives compaction
    # a fresh instance continues correctly
    again = SpanStore(spark, str(tmp_path / "rd"), k=4)
    assert again.ingest_batch(batches[0], 0) is None
    again.ingest_batch(batches[2], 2)
    whole = batches[0].unionByName(batches[1]).unionByName(batches[2])
    assert _sets(again.spans()) == _sets(duplicate_spans(whole, k=4))


def test_parameter_contract_and_validation(spark, tmp_path):
    store = SpanStore(spark, str(tmp_path / "pc"), k=4)
    store.ingest_batch(_corpus(spark)[0], 0)
    with pytest.raises(ValueError, match="never fold"):
        SpanStore(spark, str(tmp_path / "pc"), k=5)
    with pytest.raises(ValueError, match="never fold"):
        SpanStore(spark, str(tmp_path / "pc"), k=4, min_docs=2)
    with pytest.raises(ValueError, match="min_count"):
        SpanStore(spark, str(tmp_path / "bad"), k=4, min_count=1)
    empty = SpanStore(spark, str(tmp_path / "empty"), k=4)
    assert empty.spans().count() == 0


def test_streaming_availablenow_drive(spark, tmp_path):
    src = str(tmp_path / "src")
    batches = _corpus(spark)
    for b in batches:
        b.write.mode("append").parquet(src)
    store = SpanStore(spark, str(tmp_path / "stream"), k=4)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = stream_span_dedup(stream, store, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    whole = batches[0].unionByName(batches[1]).unionByName(batches[2])
    assert _sets(store.spans()) == _sets(duplicate_spans(whole, k=4))


def test_string_ids_and_empty_schema(spark, tmp_path):
    """String doc ids work end to end, and the pre-ingest empty
    spans() frame carries the configured id type so it stays
    union-compatible with post-ingest reads."""
    store = SpanStore(spark, str(tmp_path / "sid"), k=4, id_type="string")
    empty = store.spans()
    assert dict(empty.dtypes)["doc_id"] == "string"
    docs = spark.createDataFrame(
        [("a", f"alpha beta {BOILER} gamma"), ("b", f"start {BOILER} end")],
        "doc_id string, text string",
    )
    store.ingest_batch(docs, 0)
    got = store.spans()
    assert empty.unionByName(got).count() == got.count() >= 2
    assert {r.doc_id for r in got.collect()} == {"a", "b"}
