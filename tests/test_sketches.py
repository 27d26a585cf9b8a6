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
    kmv_estimate,
    kmv_merge,
    kmv_set_estimates,
    kmv_sketch,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


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


# ---------------------------------------------------------------------------
# KMV


def test_kmv_matches_python_bottom_k(spark):
    keys = [f"user_{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = [
        (r["pos"], r["h"]) for r in kmv_sketch(df, key_col="k", k=16).orderBy("pos").collect()
    ]
    want = [(i + 1, h) for i, h in enumerate(sorted(_h60(k) for k in keys)[:16])]
    assert got == want


def test_kmv_estimate_exact_below_k_and_bounded_above(spark):
    small = spark.range(50).select(F.concat(F.lit("s"), F.col("id")).alias("k"))
    est = kmv_estimate(kmv_sketch(small, key_col="k", k=256), k=256).collect()[0]
    assert est["n_obs"] == 50 and est["n_distinct_est"] == 50.0
    n = 20000
    big = spark.range(n).select(F.concat(F.lit("b"), F.col("id")).alias("k"))
    est = kmv_estimate(kmv_sketch(big, key_col="k", k=256), k=256).collect()[0]
    assert abs(est["n_distinct_est"] - n) / n < 3.0 / (256 - 2) ** 0.5


def test_kmv_merge_equals_sketch_of_union(spark):
    docs = spark.range(5000).select(F.concat(F.lit("u"), F.col("id")).alias("k"))
    a = docs.filter(F.col("id") % 3 != 0).select("k")
    b = docs.filter(F.col("id") % 3 != 1).select("k")  # overlapping halves
    merged = kmv_merge(kmv_sketch(a, key_col="k", k=64), kmv_sketch(b, key_col="k", k=64), k=64)
    whole = kmv_sketch(docs.select("k"), key_col="k", k=64)
    assert sorted(tuple(r) for r in merged.collect()) == sorted(
        tuple(r) for r in whole.collect()
    )


def test_kmv_prefilter_invariance(spark):
    df = spark.range(3000).select(
        (F.col("id") % 2).cast("int").alias("g"),
        F.concat(F.lit("p"), F.col("id")).alias("k"),
    )
    with_pf = kmv_sketch(df, key_col="k", group_cols=["g"], k=32, prefilter_buckets=32)
    without = kmv_sketch(df, key_col="k", group_cols=["g"], k=32, prefilter_buckets=1)
    assert sorted(tuple(r) for r in with_pf.collect()) == sorted(
        tuple(r) for r in without.collect()
    )


def test_kmv_set_estimates_recover_overlap(spark):
    # |A| = 6000 (ids 0..5999), |B| = 6000 (ids 3000..8999) → jaccard = 1/3
    a = spark.range(0, 6000).select(F.concat(F.lit("e"), F.col("id")).alias("k"))
    b = spark.range(3000, 9000).select(F.concat(F.lit("e"), F.col("id")).alias("k"))
    r = kmv_set_estimates(
        kmv_sketch(a, key_col="k", k=512), kmv_sketch(b, key_col="k", k=512), k=512
    ).collect()[0]
    assert abs(r["jaccard_est"] - 1 / 3) < 0.08
    assert abs(r["n_union_est"] - 9000) / 9000 < 0.15
    assert abs(r["n_intersect_est"] - 3000) / 3000 < 0.3
    assert r["n_both"] <= r["n_merged"] == 512


def test_kmv_validation(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(df, key_col="k", k=1)


# ---------------------------------------------------------------------------
# Count-min


def _cms_py(keys, d, w):
    """Python registers for a list of (key, count)."""
    regs = {}
    for key, c in keys:
        for i in range(d):
            h = int(hashlib.md5((str(key) + chr(31) + str(i)).encode()).hexdigest()[:15], 16)
            b = h & (w - 1)
            regs[(i, b)] = regs.get((i, b), 0) + c
    return regs


def test_cms_registers_match_python(spark):
    from tilegrab_spark.operators.sketches import cms_sketch

    rows = [(f"k{i % 7}", 1) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, c int")
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_sketch(df, key_col="k", d=3, w=64).collect()
    }
    assert got == _cms_py(rows, 3, 64)


def test_cms_never_underestimates_and_is_tight_when_sparse(spark):
    from tilegrab_spark.operators.sketches import cms_estimate, cms_sketch

    df = spark.range(2000).select(
        F.concat(F.lit("u"), (F.col("id") % 50)).alias("k")
    )  # 50 keys x 40 occurrences
    regs = cms_sketch(df, key_col="k", d=4, w=1024)
    est = cms_estimate(regs, df, key_col="k", d=4, w=1024).collect()
    assert len(est) == 50
    for r in est:
        assert r["est_cnt"] >= 40
    # with 50 keys in 1024 buckets x 4 rows, expect exactness
    assert all(r["est_cnt"] == 40 for r in est)


def test_cms_weighted_counts_and_merge(spark):
    from tilegrab_spark.operators.sketches import cms_estimate, cms_merge, cms_sketch

    a = spark.createDataFrame([("x", 5), ("y", 2)], "k string, c int")
    b = spark.createDataFrame([("x", 3)], "k string, c int")
    merged = cms_merge(
        cms_sketch(a, key_col="k", count_col="c", d=2, w=32),
        cms_sketch(b, key_col="k", count_col="c", d=2, w=32),
    )
    whole = cms_sketch(
        a.unionByName(b), key_col="k", count_col="c", d=2, w=32
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))
    est = {
        r["k"]: r["est_cnt"]
        for r in cms_estimate(merged, a, key_col="k", d=2, w=32).collect()
    }
    assert est["x"] == 8 and est["y"] >= 2


def test_cms_unseen_key_estimates_zero_when_no_collision(spark):
    from tilegrab_spark.operators.sketches import cms_estimate, cms_sketch

    data = spark.createDataFrame([("a", 1)], "k string, c int")
    probe = spark.createDataFrame([("zzz",)], "k string")
    regs = cms_sketch(data, key_col="k", d=4, w=1024)
    r = cms_estimate(regs, probe, key_col="k", d=4, w=1024).collect()[0]
    assert r["est_cnt"] == 0  # fixed keys, no collision at w=1024


def test_cms_validation(spark):
    from tilegrab_spark.operators.sketches import cms_sketch

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="power of two"):
        cms_sketch(df, key_col="k", w=100)
    with pytest.raises(ValueError, match="d must be"):
        cms_sketch(df, key_col="k", d=0)


# ---------------------------------------------------------------------------
# review-pass regressions


def test_hll_p_bound_protects_integer_state(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match=r"p must be in \[4, 20\]"):
        hll_registers(df, key_col="k", p=21)


def test_hll_empty_input_estimates_zero(spark):
    df = spark.createDataFrame([], "k string")
    row = hll_distinct(df, key_col="k", p=8).collect()[0]
    assert row["zeros"] == 256 and row["sum_rho"] == 0
    assert row["n_distinct_est"] == 0.0


def test_cms_estimate_validates_parameters(spark):
    from tilegrab_spark.operators.sketches import cms_estimate, cms_sketch

    df = spark.createDataFrame([("a",)], "k string")
    regs = cms_sketch(df, key_col="k", d=2, w=64)
    with pytest.raises(ValueError, match="power of two"):
        cms_estimate(regs, df, key_col="k", d=2, w=1000)


class TestQuantileSketch:
    """Mergeable bottom-k-by-row-hash quantile sketch."""

    def _events(self, spark, n=20000):
        from pyspark.sql import functions as F

        # skewed values: exp-ish via pow of uniform rank, two groups
        return (
            spark.range(n)
            .withColumn("grp", (F.col("id") % 2).cast("int"))
            .withColumn("val", F.pow(F.col("id") % 1000 + 1, F.lit(1.7)))
        )

    def test_small_group_exact(self, spark):
        from tilegrab_spark.operators.sketches import quantile_estimate, quantile_sketch

        df = self._events(spark, 300)  # 150 rows/group < k
        sk = quantile_sketch(df, value_col="val", id_col="id", group_cols=["grp"], k=256)
        est = quantile_estimate(sk, qs=(0.5, 0.9), group_cols=["grp"]).toPandas()
        pdf = df.toPandas()
        for grp in (0, 1):
            vals = sorted(pdf[pdf.grp == grp].val)
            n = len(vals)
            for q in (0.5, 0.9):
                import math
                exact = vals[max(1, min(n, math.ceil(q * n))) - 1]
                got = float(est[(est.grp == grp) & (abs(est.q - q) < 1e-9)].value.iloc[0])
                assert got == exact

    def test_rank_accuracy_large(self, spark):
        from tilegrab_spark.operators.sketches import quantile_estimate, quantile_sketch

        df = self._events(spark)
        k = 512
        sk = quantile_sketch(df, value_col="val", id_col="id", group_cols=["grp"], k=k)
        assert sk.groupBy("grp").count().toPandas()["count"].max() == k
        est = quantile_estimate(sk, qs=(0.25, 0.5, 0.9), group_cols=["grp"]).toPandas()
        pdf = df.toPandas()
        import numpy as np

        for grp in (0, 1):
            vals = np.sort(pdf[pdf.grp == grp].val.values)
            for q in (0.25, 0.5, 0.9):
                got = float(est[(est.grp == grp) & (abs(est.q - q) < 1e-9)].value.iloc[0])
                # rank-space error: where the estimate falls in the TRUE cdf
                frac = np.searchsorted(vals, got, side="right") / len(vals)
                assert abs(frac - q) < 4.5 / (k ** 0.5), (grp, q, frac)

    def test_merge_equals_sketch_of_union(self, spark):
        from pyspark.sql import functions as F

        from tilegrab_spark.operators.sketches import quantile_merge, quantile_sketch

        df = self._events(spark, 4000)
        a = df.filter(F.col("id") < 2000)
        b = df.filter(F.col("id") >= 2000)
        k = 128
        ska = quantile_sketch(a, value_col="val", id_col="id", group_cols=["grp"], k=k)
        skb = quantile_sketch(b, value_col="val", id_col="id", group_cols=["grp"], k=k)
        merged = quantile_merge(ska, skb, group_cols=["grp"], k=k).toPandas()
        full = quantile_sketch(df, value_col="val", id_col="id", group_cols=["grp"], k=k).toPandas()
        key = ["grp", "pos", "h", "v"]
        assert merged.sort_values(key).reset_index(drop=True).equals(
            full.sort_values(key).reset_index(drop=True))

    def test_duplicates_keep_multiplicity_and_validation(self, spark):
        import pytest as _pytest
        from pyspark.sql import functions as F

        from tilegrab_spark.operators.sketches import quantile_estimate, quantile_sketch

        # 90% of rows share ONE value; median must be that value (a
        # value-hashed sketch would collapse them and get this wrong)
        df = spark.range(1000).withColumn(
            "val", F.when(F.col("id") % 10 < 9, F.lit(7.0)).otherwise(F.col("id").cast("double"))
        )
        sk = quantile_sketch(df, value_col="val", id_col="id", k=256)
        est = quantile_estimate(sk, qs=(0.5,)).toPandas()
        assert float(est.value.iloc[0]) == 7.0
        with _pytest.raises(ValueError):
            quantile_sketch(df, value_col="val", id_col="id", k=1)
        with _pytest.raises(ValueError):
            quantile_estimate(sk, qs=(0.0,))


class TestCmsInnerProduct:
    """Join-size estimation: python register oracle, never-undercount,
    accuracy at ample width, exact-at-no-collision, grouped form."""

    def _true_join(self, ka, kb):
        from collections import Counter

        ca, cb = Counter(ka), Counter(kb)
        return sum(ca[k] * cb[k] for k in ca)

    def test_matches_python_register_oracle_and_bounds(self, spark):
        from tilegrab_spark.operators.sketches import (
            cms_inner_product,
            cms_sketch,
        )

        ka = [f"k{i % 37}" for i in range(800)]
        kb = [f"k{i % 53}" for i in range(600)]
        da = spark.createDataFrame([(k,) for k in ka], "key string")
        db = spark.createDataFrame([(k,) for k in kb], "key string")
        d, w = 4, 4096
        sa, sb = (
            cms_sketch(x, key_col="key", d=d, w=w) for x in (da, db)
        )
        est = cms_inner_product(sa, sb).first()["join_size_est"]
        # python oracle straight from the collected registers
        ra = {(r["row"], r["bucket"]): r["cnt"] for r in sa.collect()}
        rb = {(r["row"], r["bucket"]): r["cnt"] for r in sb.collect()}
        want = min(
            sum(
                v * rb.get((row, b), 0)
                for (r2, b), v in ra.items()
                if r2 == row
            )
            for row in range(d)
        )
        assert est == want
        true = self._true_join(ka, kb)
        assert est >= true  # never undercounts
        # 37/53 keys in 4096 buckets: collisions overwhelmingly unlikely
        assert est == true

    def test_one_shot_estimate_and_empty(self, spark):
        from tilegrab_spark.operators.sketches import join_size_estimate

        da = spark.createDataFrame([("a",), ("a",), ("b",)], "k1 string")
        db = spark.createDataFrame([("a",), ("b",), ("b",)], "k2 string")
        assert join_size_estimate(da, db, key_a="k1", key_b="k2") == 4
        empty = da.filter("k1 = 'zz'")
        assert join_size_estimate(empty, db, key_a="k1", key_b="k2") == 0

    def test_grouped(self, spark):
        from tilegrab_spark.operators.sketches import (
            cms_inner_product,
            cms_sketch,
        )

        da = spark.createDataFrame(
            [("g1", "x"), ("g1", "x"), ("g2", "y")], "g string, key string"
        )
        db = spark.createDataFrame(
            [("g1", "x"), ("g2", "y"), ("g2", "y")], "g string, key string"
        )
        sa = cms_sketch(da, key_col="key", group_cols=["g"], d=3, w=1024)
        sb = cms_sketch(db, key_col="key", group_cols=["g"], d=3, w=1024)
        got = {
            r["g"]: r["join_size_est"]
            for r in cms_inner_product(sa, sb, group_cols=["g"]).collect()
        }
        assert got == {"g1": 2, "g2": 2}

    def test_zero_overlap_rowdrop_guard(self, spark):
        """Disjoint key sets: any hash row with empty intersection must
        drive the MIN to 0 even though the sparse join drops it."""
        from tilegrab_spark.operators.sketches import (
            cms_inner_product,
            cms_sketch,
        )

        da = spark.createDataFrame([(f"a{i}",) for i in range(50)], "key string")
        db = spark.createDataFrame([(f"b{i}",) for i in range(50)], "key string")
        sa = cms_sketch(da, key_col="key", d=4, w=4096)
        sb = cms_sketch(db, key_col="key", d=4, w=4096)
        assert cms_inner_product(sa, sb).first()["join_size_est"] == 0
        # even at collision-heavy width the estimate never undercounts
        sa16 = cms_sketch(da, key_col="key", d=4, w=16)
        sb16 = cms_sketch(db, key_col="key", d=4, w=16)
        assert cms_inner_product(sa16, sb16).first()["join_size_est"] >= 0
