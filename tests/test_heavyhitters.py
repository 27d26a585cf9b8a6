"""Exact heavy hitters: two-pass MG+verify pinned against the plain
GROUP BY HAVING oracle, plus the no-false-negative guarantee under
adversarial partitioning and the bounded-candidate-exchange contract."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.heavyhitters import (
    _mg_shrink,
    heavy_hitters,
    mg_candidates,
    skew_profile,
)


def _zipfish(n_rows: int, n_keys: int) -> list:
    """Deterministic skewed key stream: key k gets ~n/(k+1) rows."""
    rows = []
    k = 0
    while len(rows) < n_rows:
        reps = max(1, n_rows // (2 * (k + 1)))
        rows += [f"k{k:04d}"] * min(reps, n_rows - len(rows))
        k = (k + 1) % n_keys
    return rows


def _oracle(keys: list, threshold: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"key": keys}))
    out = con.execute(
        "SELECT key, count(*) AS cnt FROM t GROUP BY key "
        f"HAVING count(*) >= {threshold} ORDER BY key"
    ).fetch_df()
    con.close()
    return out


@pytest.mark.parametrize("n_parts", [1, 7, 32])
def test_matches_group_by_having_oracle(spark, n_parts):
    keys = _zipfish(6000, 300)
    df = spark.createDataFrame([(k,) for k in keys], ["key"]).repartition(n_parts)
    threshold = 60  # = min_frac 0.01 of 6000
    got = (
        heavy_hitters(df, "key", min_frac=0.01)
        .orderBy("key")
        .toPandas()
    )
    want = _oracle(keys, threshold)
    assert list(got["key"]) == list(want["key"])
    assert list(got["cnt"]) == list(want["cnt"])


def test_min_count_form_and_exactness(spark):
    keys = ["a"] * 500 + ["b"] * 120 + ["c"] * 119 + [f"x{i}" for i in range(400)]
    df = spark.createDataFrame([(k,) for k in keys], ["key"]).repartition(13)
    got = {
        r["key"]: r["cnt"] for r in heavy_hitters(df, "key", min_count=120).collect()
    }
    assert got == {"a": 500, "b": 120}


def test_no_false_negatives_adversarial_spread(spark):
    """The hot key is spread thin across MANY partitions (its
    per-partition count is small) while each partition carries noise —
    the case a per-partition top-k WITHOUT the MG guarantee misses."""
    rows = []
    for p in range(40):
        rows += [(p, "hot")] * 5  # 200 total, only 5 per partition
        rows += [(p, f"noise_{p}_{i}") for i in range(200)]  # unique noise
    df = (
        spark.createDataFrame(rows, ["p", "key"])
        .repartition(40, "p")
        .select("key")
    )
    n = len(rows)
    got = heavy_hitters(df, "key", min_frac=200 / n).collect()
    assert {r["key"]: r["cnt"] for r in got} == {"hot": 200}


def test_candidate_pass_bounds_and_guarantee(spark):
    keys = _zipfish(4000, 100)
    df = spark.createDataFrame([(k,) for k in keys], ["key"]).repartition(8)
    capacity = 25
    cand = mg_candidates(df, "key", capacity)
    rows = cand.collect()
    # bounded exchange: at most n_partitions * capacity rows
    assert len(rows) <= 8 * capacity
    # MG lower-bound invariant: est <= true count, globally summed
    true = pd.Series(keys).value_counts()
    summed: dict = {}
    for r in rows:
        summed[r["key"]] = summed.get(r["key"], 0) + r["est_count"]
        assert r["est_count"] >= 1
    for k, est in summed.items():
        assert est <= int(true[k])
    # guarantee: every key with count > N/(capacity+1) is a candidate
    must_have = set(true[true > len(keys) / (capacity + 1)].index)
    assert must_have <= set(summed)


def test_mg_shrink_unit():
    c = {"a": 10, "b": 3, "c": 1, "d": 1}
    _mg_shrink(c, 2)
    assert c == {"a": 9, "b": 2}
    c2 = {"a": 5}
    _mg_shrink(c2, 2)
    assert c2 == {"a": 5}


def test_nulls_ignored_and_empty(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,), ("b",)], ["key"]
    )
    got = {r["key"]: r["cnt"] for r in heavy_hitters(df, "key", min_count=2).collect()}
    assert got == {"a": 2}
    empty = df.filter(F.lit(False))
    assert heavy_hitters(empty, "key", min_frac=0.5).count() == 0


def test_skew_profile_order_and_frac(spark):
    keys = ["hot"] * 300 + ["warm"] * 100 + [f"c{i}" for i in range(100)]
    df = spark.createDataFrame([(k,) for k in keys], ["key"]).repartition(6)
    prof = skew_profile(df, "key", min_frac=0.05, top=5).collect()
    assert [r["key"] for r in prof] == ["hot", "warm"]
    assert prof[0]["cnt"] == 300
    assert abs(prof[0]["frac"] - 300 / 500) < 1e-12


def test_verify_pass_broadcasts_candidates(spark):
    keys = _zipfish(2000, 50)
    df = spark.createDataFrame([(k,) for k in keys], ["key"]).repartition(4)
    plan = (
        heavy_hitters(df, "key", min_frac=0.02)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_validation(spark):
    df = spark.createDataFrame([("a",)], ["key"])
    with pytest.raises(ValueError):
        heavy_hitters(df, "key")
    with pytest.raises(ValueError):
        heavy_hitters(df, "key", min_frac=0.1, min_count=5)
    with pytest.raises(ValueError):
        heavy_hitters(df, "key", min_frac=0.0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "key", min_count=0)
    with pytest.raises(ValueError):
        mg_candidates(df, "key", 0)
