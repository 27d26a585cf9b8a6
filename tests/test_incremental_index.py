"""TextIndexStore: multi-batch ingest must equal a one-shot
bm25_search rebuild bit-for-bit (1e-12); re-delivery no-ops; compaction
preserves results and idempotence; the postings scan actually prunes to
query-term buckets; time travel answers from earlier batches only."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.retrieval import bm25_search
from tilegrab_spark.streaming.incremental_index import TextIndexStore


def _docs(spark, lo, hi):
    words = ["tile", "mosaic", "spark", "engine", "quality", "geospatial",
             "index", "corpus", "shard", "join"]
    rows = [
        (i, " ".join(words[(i * 7 + j) % len(words)] for j in range(3 + i % 5)))
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame(
        [(0, "mosaic engine"), (1, "geospatial quality corpus"), (2, "zzz")],
        "query_id int, text string",
    )


def _results(df):
    return sorted(
        (r.query_id, r.doc_id, r.score, r.rank) for r in df.collect()
    )


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="tg_txtidx_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_incremental_equals_rebuild(spark, root):
    store = TextIndexStore(spark, root, n_buckets=16)
    assert store.ingest_batch(_docs(spark, 0, 40), 0) is not None
    assert store.ingest_batch(_docs(spark, 40, 90), 1) is not None
    assert store.ingest_batch(_docs(spark, 90, 120), 2) is not None
    got = _results(store.search(_queries(spark), k=7))
    want = _results(bm25_search(_docs(spark, 0, 120), _queries(spark), k=7))
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert (g[0], g[1], g[3]) == (w[0], w[1], w[3])
        assert g[2] == pytest.approx(w[2], rel=1e-12)


def test_redelivery_noop_and_stats(spark, root):
    store = TextIndexStore(spark, root, n_buckets=8)
    store.ingest_batch(_docs(spark, 0, 30), 7)
    before = _results(store.search(_queries(spark), k=5))
    assert store.ingest_batch(_docs(spark, 0, 30), 7) is None  # retry
    assert _results(store.search(_queries(spark), k=5)) == before
    n, avgdl = store.corpus_stats()
    assert n == 30 and avgdl > 0
    assert store.ingested_batches() == {7}


def test_compaction_preserves_everything(spark, root):
    store = TextIndexStore(spark, root, n_buckets=8)
    store.ingest_batch(_docs(spark, 0, 25), 0)
    store.ingest_batch(_docs(spark, 25, 60), 1)
    before = _results(store.search(_queries(spark), k=6))
    n_before = store.corpus_stats()
    store.compact()
    assert _results(store.search(_queries(spark), k=6)) == before
    assert store.corpus_stats() == n_before
    assert store.ingested_batches() == {0, 1}  # carried through the fold
    assert store.ingest_batch(_docs(spark, 0, 25), 0) is None  # still idempotent
    # postings history folded to the replace snapshot's single manifest set
    live = store.postings.scan_files()
    assert all(e["path"].startswith("data/") for e in live)


def test_scan_prunes_to_query_buckets(spark, root):
    store = TextIndexStore(spark, root, n_buckets=16)
    store.ingest_batch(_docs(spark, 0, 200), 0)
    all_files = store.postings.scan_files()
    one_term = spark.createDataFrame([(0, "mosaic")], "query_id int, text string")
    tb = (
        spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit("mosaic")), F.lit(16)).cast("int").alias("tb"))
        .first()["tb"]
    )
    pruned = store.postings.scan_files(key_col="tb", key_ranges=[(tb, tb)])
    assert len(pruned) < len(all_files)
    hits = store.search(one_term, k=3)
    assert hits.count() == 3


def test_time_travel(spark, root):
    store = TextIndexStore(spark, root, n_buckets=8)
    seq1 = store.ingest_batch(_docs(spark, 0, 30), 0)
    early = _results(store.search(_queries(spark), k=5))
    store.ingest_batch(_docs(spark, 30, 80), 1)
    assert _results(store.search(_queries(spark), k=5, as_of=seq1)) == early
    n1, _ = store.corpus_stats(as_of=seq1)
    n2, _ = store.corpus_stats()
    assert (n1, n2) == (30, 80)


def test_contract_and_edges(spark, root):
    store = TextIndexStore(spark, root, n_buckets=8)
    store.ingest_batch(_docs(spark, 0, 10), 0)
    with pytest.raises(ValueError):
        TextIndexStore(spark, root, n_buckets=32)  # param mismatch
    with pytest.raises(ValueError):
        TextIndexStore(spark, root + "_x", n_buckets=0)
    # query with only unseen terms -> empty frame, right columns
    out = store.search(
        spark.createDataFrame([(0, "@@@@")], "query_id int, text string"), k=3
    )
    assert out.count() == 0
    assert out.columns == ["query_id", "doc_id", "score", "rank"]


def test_crash_between_table_commits_recovers(spark, root):
    """Simulate a death between the dfreq append and the postings
    append: the retry must not double-count df."""
    store = TextIndexStore(spark, root, n_buckets=8)
    store.ingest_batch(_docs(spark, 0, 20), 0)
    # hand-craft the torn state: append batch 1's dfreq delta only
    from tilegrab_spark.operators.retrieval import _tokens

    d = _docs(spark, 20, 50)
    toks = d.select(F.col("doc_id").alias("id"), _tokens("text").alias("_t"))
    dfd = (
        toks.select("id", F.explode("_t").alias("term"))
        .groupBy("id", "term").count()
        .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )
    store.dfreq.append(dfd, summary={"batch_id": 1})
    # retry of batch 1 (postings absent -> not "ingested") must land
    # postings and SKIP the second dfreq append
    assert store.ingest_batch(d, 1) is not None
    got = _results(store.search(_queries(spark), k=6))
    want = _results(bm25_search(_docs(spark, 0, 50), _queries(spark), k=6))
    for g, w in zip(got, want):
        assert (g[0], g[1], g[3]) == (w[0], w[1], w[3])
        assert g[2] == pytest.approx(w[2], rel=1e-12)
