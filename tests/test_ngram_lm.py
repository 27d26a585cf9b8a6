"""Bigram LM train/score vs an independent pure-Python reference."""

import math
from collections import Counter

import pytest

from tilegrab_spark.operators.ngram_lm import perplexity_score, train_bigram_lm

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "cats and dogs and cats"),
    (3, "single"),
    (4, ""),
    (5, "the cat sat on the mat again and again"),
]


def _toks(text):
    return [t for t in text.lower().strip().split() if t]


def _py_model(rows):
    uni, bi = Counter(), Counter()
    for _, text in rows:
        ts = _toks(text)
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
    return uni, bi


def _py_score(text, uni, bi, k=1.0):
    ts = _toks(text)
    vocab = len(uni)
    if len(ts) < 2:
        return None, None
    lp = 0.0
    for v, w in zip(ts, ts[1:]):
        lp += math.log((bi.get((v, w), 0) + k) / (uni.get(v, 0) + k * (vocab + 1)))
    n = len(ts) - 1
    return lp, math.exp(-lp / n)


def _docs(spark, rows=CORPUS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_model_counts_exact(spark):
    model = {(r.v, r.w): (r.c_vw, r.c_v, r.vocab)
             for r in train_bigram_lm(_docs(spark)).collect()}
    uni, bi = _py_model(CORPUS)
    assert set(model) == set(bi)
    for (v, w), c in bi.items():
        assert model[(v, w)] == (c, uni[v], len(uni))


@pytest.mark.parametrize("broadcast_model", [True, False])
def test_scores_match_python_reference(spark, broadcast_model):
    docs = _docs(spark)
    model = train_bigram_lm(docs)
    got = {
        r.doc_id: r
        for r in perplexity_score(
            docs, model, broadcast_model=broadcast_model
        ).collect()
    }
    uni, bi = _py_model(CORPUS)
    for doc_id, text in CORPUS:
        lp, ppl = _py_score(text, uni, bi)
        r = got[doc_id]
        if lp is None:
            assert r.n_bigrams is None and r.perplexity is None
        else:
            assert r.n_bigrams == len(_toks(text)) - 1
            assert r.logprob_sum == pytest.approx(lp, abs=1e-9)
            assert r.perplexity == pytest.approx(ppl, rel=1e-9)


def test_out_of_corpus_document_and_unseen_context(spark):
    model = train_bigram_lm(_docs(spark))
    alien = spark.createDataFrame(
        [(99, "zz yy zz"), (98, "the cat zzz")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in perplexity_score(alien, model).collect()}
    uni, bi = _py_model(CORPUS)
    for doc_id, text in ((99, "zz yy zz"), (98, "the cat zzz")):
        lp, ppl = _py_score(text, uni, bi)
        assert got[doc_id].logprob_sum == pytest.approx(lp, abs=1e-9)
        assert got[doc_id].perplexity == pytest.approx(ppl, rel=1e-9)
    # unseen everything -> worse (higher) perplexity than in-corpus text
    in_corpus = {
        r.doc_id: r.perplexity
        for r in perplexity_score(_docs(spark), model).collect()
    }
    assert got[99].perplexity > in_corpus[0]


def test_low_perplexity_selects_fluent_text(spark):
    """The filter semantics: repeated fluent text scores below noise."""
    rows = [(i, "the cat sat on the mat") for i in range(20)] + [
        (100, "qqq www eee rrr ttt yyy")
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_bigram_lm(docs)
    got = {r.doc_id: r.perplexity for r in perplexity_score(docs, model).collect()}
    assert got[0] < got[100]


def test_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="smoothing_k"):
        perplexity_score(docs, train_bigram_lm(docs), smoothing_k=0)
