"""DSIR suite — exact recomputation oracle in pure python (same md5
bucket contract), behavioral ranking checks, deterministic Gumbel
top-k."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

from tilegrab_spark.operators.dsir import (
    dsir_log_weights,
    dsir_topk_sample,
    hashed_ngram_features,
    ngram_profile,
)

HASH_SPACE = 1 << 60


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def grams(text, orders=(1, 2)):
    toks = [t for t in text.lower().strip().split() if t]
    out = []
    for k in sorted(set(orders)):
        if k == 1:
            out += toks
        else:
            out += [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return out


def bucket_counts(texts, n_buckets, salt="dsir", orders=(1, 2)):
    c = Counter()
    for t in texts:
        for g in grams(t, orders):
            c[h60(g + salt) % n_buckets] += 1
    return c


def profile_logp(texts, n_buckets, alpha=1.0, **kw):
    c = bucket_counts(texts, n_buckets, **kw)
    tot = sum(c.values())
    denom = tot + alpha * n_buckets
    floor = math.log(alpha / denom)
    return {b: math.log((n + alpha) / denom) for b, n in c.items()}, floor


def ref_log_weights(corpus, target, n_buckets, alpha=1.0):
    pt, ft = profile_logp([t for _, t in target], n_buckets, alpha)
    pr, fr = profile_logp([t for _, t in corpus], n_buckets, alpha)
    out = {}
    for did, text in corpus:
        s = 0.0
        for b, n in Counter(
            h60(g + "dsir") % n_buckets for g in grams(text)
        ).items():
            s += n * (pt.get(b, ft) - pr.get(b, fr))
        out[did] = s
    return out


GEO = [
    "the tile server merges raster tiles into mosaic layers",
    "web mercator projection maps longitude latitude to tile pixels",
    "zoom level controls raster tile resolution on the map",
    "vector polygons clip raster tiles along region boundaries",
]
COOK = [
    "simmer the onions in butter until golden and soft",
    "whisk the eggs with cream and a pinch of salt",
    "roast the vegetables until the edges caramelize nicely",
    "fold the flour into the batter and bake until risen",
]
CORPUS = [(i, t) for i, t in enumerate(GEO + COOK)]
TARGET = [(100 + i, t) for i, t in enumerate(
    ["render the tile layers of the mercator map at each zoom level",
     "mosaic raster tiles cover the projection grid"]
)]

NB = 4096


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestFeaturesAndProfile:
    def test_features_match_oracle(self, spark):
        feats = hashed_ngram_features(_df(spark, CORPUS), n_buckets=NB)
        got = {}
        for r in feats.collect():
            got.setdefault(r["doc_id"], Counter())[r["bucket"]] = r["cnt"]
        for did, text in CORPUS:
            want = Counter(h60(g + "dsir") % NB for g in grams(text))
            assert got[did] == want, did

    def test_profile_matches_oracle(self, spark):
        prof = {r["bucket"]: r for r in ngram_profile(_df(spark, CORPUS), n_buckets=NB).collect()}
        want, floor = profile_logp([t for _, t in CORPUS], NB)
        assert set(prof) == set(want)
        for b, lp in want.items():
            assert prof[b]["log_prob"] == pytest.approx(lp, rel=1e-12)
            assert prof[b]["log_floor"] == pytest.approx(floor, rel=1e-12)


class TestWeights:
    def test_matches_reference(self, spark):
        got = {
            r["doc_id"]: r["dsir_logw"]
            for r in dsir_log_weights(
                _df(spark, CORPUS), _df(spark, TARGET), n_buckets=NB
            ).collect()
        }
        want = ref_log_weights(CORPUS, TARGET, NB)
        for did in want:
            assert got[did] == pytest.approx(want[did], rel=1e-9, abs=1e-9), did

    def test_target_like_docs_rank_higher(self, spark):
        scored = dsir_log_weights(
            _df(spark, CORPUS), _df(spark, TARGET), n_buckets=NB
        ).collect()
        geo = [r["dsir_logw"] for r in scored if r["doc_id"] < len(GEO)]
        cook = [r["dsir_logw"] for r in scored if r["doc_id"] >= len(GEO)]
        assert min(geo) > max(cook)

    def test_empty_doc_and_partition_invariance(self, spark):
        corpus = CORPUS + [(50, ""), (51, None)]
        a = {
            r["doc_id"]: r["dsir_logw"]
            for r in dsir_log_weights(
                _df(spark, corpus), _df(spark, TARGET), n_buckets=NB
            ).collect()
        }
        assert a[50] == 0.0 and a[51] == 0.0
        b = {
            r["doc_id"]: r["dsir_logw"]
            for r in dsir_log_weights(
                _df(spark, corpus).repartition(7),
                _df(spark, TARGET).repartition(3),
                n_buckets=NB,
            ).collect()
        }
        for did in a:
            assert a[did] == pytest.approx(b[did], rel=1e-12)


class TestSample:
    def test_gumbel_topk_matches_reference_and_is_deterministic(self, spark):
        scored = dsir_log_weights(
            _df(spark, CORPUS), _df(spark, TARGET), n_buckets=NB
        )
        got = [r["doc_id"] for r in dsir_topk_sample(scored, k=4).collect()]
        logw = ref_log_weights(CORPUS, TARGET, NB)
        keys = {}
        for did in logw:
            u = (h60(str(did) + "dsir-gumbel") + 0.5) / HASH_SPACE
            keys[did] = logw[did] + (-math.log(-math.log(u)))
        want = [d for d, _ in sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))][:4]
        assert got == want
        again = [r["doc_id"] for r in dsir_topk_sample(scored.repartition(5), k=4).collect()]
        assert again == got

    def test_temperature_and_validation(self, spark):
        scored = dsir_log_weights(
            _df(spark, CORPUS), _df(spark, TARGET), n_buckets=NB
        )
        # low temperature -> selection dominated by weights: all geo docs
        cold = [r["doc_id"] for r in dsir_topk_sample(scored, k=4, temperature=1e-3).collect()]
        assert all(d < len(GEO) for d in cold)
        with pytest.raises(ValueError, match="k must"):
            dsir_topk_sample(scored, k=0)
        with pytest.raises(ValueError, match="temperature"):
            dsir_topk_sample(scored, k=1, temperature=0)
