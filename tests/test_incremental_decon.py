"""Incremental decontamination: batch-equivalence oracle under
interleaved document/eval arrivals, retro-scan on new benchmarks,
new-k reindex bookkeeping, and the no-raw-reread contract."""

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.decontaminate import contamination_hits
from tilegrab_spark.streaming.incremental_decon import DeconStore

N = 5

DOCS_B1 = [
    (1, "completely unrelated text about tile pyramids and mosaics"),
    (2, "he said the quick brown fox jumps over the wall again"),
    (3, "spark plans shuffle when grouping keys differ from layout"),
]
DOCS_B2 = [
    (5, "quote: the quick brown fox jumps near paris is the capital region"),
    (7, "short clean doc"),
    (9, "answer: paris is the capital"),
]
EVAL_B1 = [(101, "the quick brown fox jumps over the lazy dog tonight")]
EVAL_B2 = [(102, "paris is the capital")]  # < n tokens: whole-sequence gram


def _df(spark, rows, idc):
    return spark.createDataFrame(rows, [idc, "text"])


def _batch_oracle(spark, docs_rows, eval_rows):
    docs = _df(spark, docs_rows, "doc_id")
    ev = _df(spark, eval_rows, "eval_id")
    return {
        r["doc_id"]: (r["n_hits"], r["n_eval_docs"])
        for r in contamination_hits(docs, ev, n=N).collect()
    }


def _store_report(store):
    return {
        r["doc_id"]: (r["n_hits"], r["n_eval_docs"])
        for r in store.contaminated().collect()
    }


def test_docs_then_evals_then_docs_matches_batch(spark, tmp_path):
    store = DeconStore(spark, str(tmp_path / "s1"), n=N)
    store.ingest_docs(_df(spark, DOCS_B1, "doc_id"), batch_id=1)
    # eval arrives AFTER some docs: retro-scan must flag doc 2
    store.ingest_eval(
        _df(spark, EVAL_B1, "eval_id"),
        batch_id=2,
        corpus_df=_df(spark, DOCS_B1, "doc_id"),
    )
    # later docs are checked against the registered eval set on arrival
    store.ingest_docs(_df(spark, DOCS_B2, "doc_id"), batch_id=3)
    got = _store_report(store)
    want = _batch_oracle(spark, DOCS_B1 + DOCS_B2, EVAL_B1)
    assert got == want and 2 in got and 5 in got


def test_short_eval_doc_new_k_reindex(spark, tmp_path):
    store = DeconStore(spark, str(tmp_path / "s2"), n=N)
    store.ingest_docs(_df(spark, DOCS_B1 + DOCS_B2, "doc_id"), batch_id=1)
    assert store.ks_indexed() == [N]
    # EVAL_B2 has 4 tokens < n=5 -> needs corpus 4-grams (never indexed)
    with pytest.raises(ValueError, match="reindex"):
        store.ingest_eval(_df(spark, EVAL_B2, "eval_id"), batch_id=2)
    store.ingest_eval(
        _df(spark, EVAL_B2, "eval_id"),
        batch_id=2,
        corpus_df=_df(spark, DOCS_B1 + DOCS_B2, "doc_id"),
    )
    assert store.ks_indexed() == [4, N]
    got = _store_report(store)
    want = _batch_oracle(spark, DOCS_B1 + DOCS_B2, EVAL_B2)
    assert got == want and 9 in got  # verbatim short-eval copy flagged


def test_interleaved_equivalence_full(spark, tmp_path):
    store = DeconStore(spark, str(tmp_path / "s3"), n=N)
    store.ingest_eval(_df(spark, EVAL_B1, "eval_id"), batch_id=1)
    store.ingest_docs(_df(spark, DOCS_B1, "doc_id"), batch_id=2)
    store.ingest_eval(
        _df(spark, EVAL_B2, "eval_id"),
        batch_id=3,
        corpus_df=_df(spark, DOCS_B1, "doc_id"),
    )
    store.ingest_docs(_df(spark, DOCS_B2, "doc_id"), batch_id=4)
    got = _store_report(store)
    want = _batch_oracle(spark, DOCS_B1 + DOCS_B2, EVAL_B1 + EVAL_B2)
    assert got == want
    # doc 5 overlaps grams from both eval docs
    assert got[5][1] == 2


def test_retro_scan_probes_index_not_text(spark, tmp_path):
    """After ingest, eval registration must work even if the raw corpus
    frame is gone (no corpus_df needed when no new k appears)."""
    store = DeconStore(spark, str(tmp_path / "s4"), n=N)
    store.ingest_docs(_df(spark, DOCS_B1, "doc_id"), batch_id=1)
    hits = store.ingest_eval(_df(spark, EVAL_B1, "eval_id"), batch_id=2)
    assert {r["doc_id"] for r in hits.collect()} == {2}


def test_clean_ids_pipeline(spark, tmp_path):
    store = DeconStore(spark, str(tmp_path / "s5"), n=N)
    store.ingest_eval(_df(spark, EVAL_B1 + EVAL_B2, "eval_id"), batch_id=1)
    store.ingest_docs(_df(spark, DOCS_B1 + DOCS_B2, "doc_id"), batch_id=2)
    docs = _df(spark, DOCS_B1 + DOCS_B2, "doc_id")
    kept = sorted(r["doc_id"] for r in store.clean_ids(docs).collect())
    assert kept == [1, 3, 7]


def test_first_doc_batch_with_no_evals_returns_empty(spark, tmp_path):
    store = DeconStore(spark, str(tmp_path / "s6"), n=N)
    hits = store.ingest_docs(_df(spark, DOCS_B1, "doc_id"), batch_id=1)
    assert hits.count() == 0
    assert store.contaminated().count() == 0


def test_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        DeconStore(spark, str(tmp_path / "s7"), n=0)
    store = DeconStore(spark, str(tmp_path / "s8"), n=N)
    with pytest.raises(ValueError, match="nothing ingested"):
        store.contaminated()
