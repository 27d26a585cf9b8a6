"""Bloom filter build/merge/probe/anti-join vs a plain-Python oracle."""

import hashlib

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.bloom import (
    bloom_anti_join,
    bloom_build,
    bloom_merge,
    bloom_parameters,
    bloom_probe,
)

M, K = 512, 3


def _pos(key, j, salt="bloom"):
    h = hashlib.md5((str(key) + salt + str(j)).encode()).hexdigest()
    return int(h[:15], 16) % M


def _py_words(keys):
    words = {}
    for key in keys:
        for j in range(K):
            p = _pos(key, j)
            words[p >> 6] = words.get(p >> 6, 0) | (1 << (p % 64))
    # int64 wrap for the sign bit
    return {w: b - (1 << 64) if b >= (1 << 63) else b for w, b in words.items()}


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


KEYS = [f"user-{i}" for i in range(40)]
OTHERS = [f"ghost-{i}" for i in range(200)]


def test_build_matches_python_words(spark):
    got = {
        r.word_idx: r.bits
        for r in bloom_build(
            _keys_df(spark, KEYS), "key", m_bits=M, k_hashes=K
        ).collect()
    }
    assert got == _py_words(KEYS)


def test_no_false_negatives_and_bounded_fpp(spark):
    sketch = bloom_build(_keys_df(spark, KEYS), "key", m_bits=M, k_hashes=K)
    probed = {
        r.key: r.maybe_present
        for r in bloom_probe(
            _keys_df(spark, KEYS + OTHERS), sketch, "key", m_bits=M, k_hashes=K
        ).collect()
    }
    assert all(probed[k] for k in KEYS)
    fp = sum(probed[k] for k in OTHERS) / len(OTHERS)
    # 40 keys * 3 hashes in 512 bits -> theoretical fpp ~ 1.1%
    assert fp <= 0.10


def test_merge_equals_build_of_union(spark):
    a = bloom_build(_keys_df(spark, KEYS[:20]), "key", m_bits=M, k_hashes=K)
    b = bloom_build(_keys_df(spark, KEYS[20:]), "key", m_bits=M, k_hashes=K)
    merged = {r.word_idx: r.bits for r in bloom_merge(a, b).collect()}
    assert merged == _py_words(KEYS)


def test_anti_join_is_exact_on_absent(spark):
    sketch = bloom_build(_keys_df(spark, KEYS), "key", m_bits=M, k_hashes=K)
    df = _keys_df(spark, KEYS + OTHERS)
    absent = {r.key for r in bloom_anti_join(df, sketch, "key", m_bits=M, k_hashes=K).collect()}
    # no inserted key may be called absent; every absent call is correct
    assert not (absent & set(KEYS))
    assert absent <= set(OTHERS)
    # absent + maybe covers everything
    probed = bloom_probe(df, sketch, "key", m_bits=M, k_hashes=K)
    maybe = {r.key for r in probed.filter("maybe_present").collect()}
    assert absent | maybe == set(KEYS + OTHERS)


def test_null_keys_ignored_and_pass_anti_join(spark):
    df = spark.createDataFrame([("a",), (None,)], "key string")
    sketch = bloom_build(df, "key", m_bits=M, k_hashes=K)
    assert {r.word_idx for r in sketch.collect()} == set(_py_words(["a"]))
    out = bloom_anti_join(
        spark.createDataFrame([(None,), ("zzz",)], "key string"),
        sketch, "key", m_bits=M, k_hashes=K,
    )
    assert {r.key for r in out.collect()} == {None, "zzz"}


def test_grouped_build(spark):
    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "b"), ("g2", "a")], "g string, key string"
    )
    got = {
        (r.g, r.word_idx): r.bits
        for r in bloom_build(
            df, "key", m_bits=M, k_hashes=K, group_cols=("g",)
        ).collect()
    }
    expect = {}
    for g, keys in (("g1", ["a", "b"]), ("g2", ["a"])):
        for w, b in _py_words(keys).items():
            expect[(g, w)] = b
    assert got == expect


def test_parameters_and_validation(spark):
    m, k = bloom_parameters(1_000_000, 0.01)
    assert m % 64 == 0 and 9_000_000 < m < 10_500_000 and k in (6, 7, 8)
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(_keys_df(spark, KEYS), "key", m_bits=100, k_hashes=3)
    with pytest.raises(ValueError, match="k_hashes"):
        bloom_build(_keys_df(spark, KEYS), "key", m_bits=64, k_hashes=0)
    with pytest.raises(ValueError, match="fpp"):
        bloom_parameters(10, 1.5)


def test_probe_plan_broadcasts_sketch(spark):
    sketch = bloom_build(_keys_df(spark, KEYS), "key", m_bits=M, k_hashes=K)
    plan = (
        bloom_probe(_keys_df(spark, OTHERS), sketch, "key", m_bits=M, k_hashes=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
