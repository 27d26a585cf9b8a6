"""Hashed-linear quality classifier vs plain-Python/numpy oracles."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.classifier import (
    hashed_token_features,
    score_documents,
    train_quality_classifier,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "the the the the"),
    (3, ""),
    (4, "  MIXED Case   tokens\tand\nwhitespace  "),
]


def _sigmoid(m):
    if m >= 0:
        return 1.0 / (1.0 + math.exp(-m))
    e = math.exp(m)
    return e / (1.0 + e)


def _hash_idx(token, salt, n):
    h = hashlib.md5((token + salt).encode()).hexdigest()
    return int(h[:15], 16) % n


def _py_counts(text, salt, n):
    counts = {}
    for t in text.lower().strip().split():
        if t:
            counts[_hash_idx(t, salt, n)] = counts.get(_hash_idx(t, salt, n), 0) + 1
    return counts


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_hashed_features_match_python(spark):
    n = 64
    got = {
        (r.doc_id, r.idx): r.cnt
        for r in hashed_token_features(
            _docs_df(spark), n_features=n, salt="qc"
        ).collect()
    }
    expect = {}
    for doc_id, text in DOCS:
        for idx, c in _py_counts(text, "qc", n).items():
            expect[(doc_id, idx)] = c
    assert got == expect


def test_integer_margin_exact(spark):
    n = 32
    rng = np.random.default_rng(7)
    w = rng.integers(-1000, 1000, size=n).astype(np.int64)
    rows = {
        r.doc_id: (r.margin, r.score)
        for r in score_documents(_docs_df(spark), w, bias=3.0).collect()
    }
    for doc_id, text in DOCS:
        margin = sum(c * int(w[i]) for i, c in _py_counts(text, "qc", n).items())
        margin = int(margin + 3.0)
        got_m, got_s = rows[doc_id]
        assert got_m == margin
        assert got_s == pytest.approx(_sigmoid(margin), abs=1e-12)


def test_float_weights_and_empty_doc(spark):
    n = 16
    w = np.linspace(-1.0, 1.0, n)
    rows = {r.doc_id: r.score for r in score_documents(_docs_df(spark), w).collect()}
    # empty document scores exactly at the bias
    assert rows[3] == pytest.approx(0.5)
    for doc_id, text in DOCS:
        margin = sum(c * w[i] for i, c in _py_counts(text, "qc", n).items())
        assert rows[doc_id] == pytest.approx(_sigmoid(margin))


def test_keep_cols_and_validation(spark):
    df = _docs_df(spark).withColumn("lang", F.lit("en"))
    out = score_documents(df, np.zeros(8), keep_cols=("lang",))
    assert out.columns == ["doc_id", "lang", "margin", "score"]
    with pytest.raises(ValueError, match="1-D"):
        score_documents(df, np.zeros((2, 2)))
    with pytest.raises(ValueError, match="n_features"):
        hashed_token_features(df, n_features=0)


def test_scoring_plan_single_docsized_exchange(spark):
    df = _docs_df(spark)
    plan = (
        score_documents(df, np.zeros(8))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # the only non-broadcast exchanges key on the document id (scoring
    # groupBy + the left join back onto the doc table) — nothing keyed
    # on token or feature index ever shuffles
    import re

    shuffles = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert shuffles and all(s.startswith("doc_id") for s in shuffles)


def _labeled_corpus(spark, n_per_class=60):
    good_vocab = "science method evidence theory careful study result".split()
    bad_vocab = "click buy now free winner prize urgent".split()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n_per_class):
        rows.append(
            (i, " ".join(rng.choice(good_vocab, size=12)), 1)
        )
        rows.append(
            (n_per_class + i, " ".join(rng.choice(bad_vocab, size=12)), 0)
        )
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_training_separates_synthetic_classes(spark):
    corpus = _labeled_corpus(spark)
    train = corpus.filter(F.col("doc_id") % 3 != 0)
    held = corpus.filter(F.col("doc_id") % 3 == 0)
    w, bias = train_quality_classifier(
        train, label_col="label", n_features=256, iters=15, lr=2.0
    )
    scored = score_documents(held, w, bias=bias).join(held, "doc_id")
    agg = scored.select(
        F.sum(
            (
                (F.col("score") > 0.5).cast("int") == F.col("label")
            ).cast("int")
        ).alias("correct"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert agg.correct / agg.n >= 0.95


def test_training_matches_numpy_reference(spark):
    """Same math, independent implementation: dense numpy full-batch GD
    on the same hashed features must track the distributed trainer
    closely (float reduce order differs -> tolerance, not equality)."""
    corpus = _labeled_corpus(spark, n_per_class=20)
    n, iters, lr, l2 = 64, 5, 1.0, 1e-4
    w, bias = train_quality_classifier(
        corpus, label_col="label", n_features=n, iters=iters, lr=lr, l2=l2
    )
    rows = corpus.select("doc_id", "text", "label").collect()
    X = np.zeros((len(rows), n))
    y = np.zeros(len(rows))
    for r_i, r in enumerate(sorted(rows, key=lambda r: r.doc_id)):
        counts = _py_counts(r.text, "qc", n)
        total = sum(counts.values())
        for i, c in counts.items():
            X[r_i, i] = c / total
        y[r_i] = r.label
    w_ref = np.zeros(n)
    b_ref = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w_ref + b_ref)))
        err = p - y
        w_ref -= lr * (X.T @ err / len(rows) + l2 * w_ref)
        b_ref -= lr * err.mean()
    assert np.allclose(w, w_ref, atol=1e-8)
    assert bias == pytest.approx(b_ref, abs=1e-8)
