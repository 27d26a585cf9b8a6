"""HLL distinct sketch: accuracy, exact mergeability, grouped parity,
and the md5-low-8 hash contract (cross-checked against the Python-side
`dedup._stable_hash64`)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.sketches import (
    hll_distinct,
    hll_error_bound,
    hll_merge,
    hll_registers,
    hll_summary,
)


def _regs(df):
    return sorted(tuple(r) for r in df.collect())


def test_accuracy_within_error_bound(spark):
    n = 5000
    df = spark.range(n).select(F.concat(F.lit("key_"), F.col("id")).alias("k"))
    est = hll_distinct(df, key_col="k", p=12).collect()[0]["n_distinct_est"]
    assert abs(est - n) / n < 3 * hll_error_bound(12)


def test_small_range_linear_counting_is_nearly_exact(spark):
    df = spark.range(10).select(F.concat(F.lit("u_"), F.col("id")).alias("k"))
    est = hll_distinct(df, key_col="k", p=12).collect()[0]["n_distinct_est"]
    assert round(est) == 10


def test_duplicates_do_not_move_the_estimate(spark):
    base = spark.range(800).select(F.concat(F.lit("d_"), F.col("id")).alias("k"))
    dup9 = base.crossJoin(spark.range(9).select(F.lit(1).alias("_j"))).select("k")
    a = hll_distinct(base, key_col="k", p=10).collect()[0]
    b = hll_distinct(dup9, key_col="k", p=10).collect()[0]
    assert a["harm_s40"] == b["harm_s40"] and a["zeros"] == b["zeros"]


def test_merge_is_exact(spark):
    docs = spark.range(3000).select(F.concat(F.lit("m_"), F.col("id")).alias("k"))
    half_a = docs.filter(F.xxhash64("k") % 2 == 0)
    half_b = docs.filter(F.xxhash64("k") % 2 != 0)
    merged = hll_merge(
        hll_registers(half_a, key_col="k", p=11),
        hll_registers(half_b, key_col="k", p=11),
    )
    whole = hll_registers(docs, key_col="k", p=11)
    assert _regs(merged) == _regs(whole)
    # overlapping inputs merge to the same state too (idempotent union)
    remerged = hll_merge(whole, hll_registers(half_a, key_col="k", p=11))
    assert _regs(remerged) == _regs(whole)


def test_grouped_matches_per_group_global(spark):
    df = spark.range(4000).select(
        (F.col("id") % 3).cast("int").alias("g"),
        F.concat(F.lit("x"), F.col("id")).alias("k"),
    )
    grouped = {
        r["g"]: (r["zeros"], r["sum_rho"], r["harm_s40"])
        for r in hll_distinct(df, key_col="k", group_cols=["g"], p=9).collect()
    }
    for g in range(3):
        solo = hll_distinct(df.filter(F.col("g") == g), key_col="k", p=9).collect()[0]
        assert grouped[g] == (solo["zeros"], solo["sum_rho"], solo["harm_s40"])


def test_hash_contract_matches_stable_hash64(spark):
    """bucket/rho must derive from md5-low-8 big-endian — the same 64-bit
    value dedup._stable_hash64 yields — so SQL oracles can re-derive."""
    keys = ["alpha", "bravo", "42", "", "héllo"]
    p = 12
    rows = hll_registers(
        spark.createDataFrame([(k,) for k in keys], "k string"), key_col="k", p=p
    ).collect()
    regs = {}
    for k in keys:
        h = int.from_bytes(hashlib.md5(k.encode()).digest()[:8], "big")
        bucket, w = h & ((1 << p) - 1), h >> p
        rho = 64 - p + 1 if w == 0 else (w & -w).bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    assert {(r["bucket"], r["rho"]) for r in rows} == set(regs.items())


def test_null_keys_ignored_and_p_validated(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    regs = hll_registers(df, key_col="k", p=8)
    assert regs.count() == 2
    with pytest.raises(ValueError, match="p must be"):
        hll_registers(df, key_col="k", p=2)


def test_summary_partial_registers_counts_absent_as_zeros(spark):
    keys = [f"z{i}" for i in range(5)]
    occupied = {
        int.from_bytes(hashlib.md5(k.encode()).digest()[:8], "big") & 63 for k in keys
    }
    df = spark.range(5).select(F.concat(F.lit("z"), F.col("id")).alias("k"))
    s = hll_summary(hll_registers(df, key_col="k", p=6), p=6).collect()[0]
    assert s["zeros"] == 64 - len(occupied)
    assert s["harm_s40"] < 64 * (1 << 40)
