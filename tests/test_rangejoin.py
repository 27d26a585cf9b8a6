"""range_join / interval_join: brute-force parity, exactly-once pair
emission, boundary closed-ness, bucket-width invariance, left join."""

import random

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.rangejoin import interval_join, range_join


@pytest.fixture(scope="module")
def pts_ivs(spark):
    rnd = random.Random(7)
    pts = [(i, float(rnd.randrange(-500, 1500))) for i in range(300)]
    ivs = []
    for j in range(80):
        lo = float(rnd.randrange(-600, 1400))
        ivs.append((j, lo, lo + rnd.randrange(1, 300)))
    return (
        spark.createDataFrame(pts, "pid int, p double"),
        spark.createDataFrame(ivs, "iid int, lo double, hi double"),
        pts,
        ivs,
    )


def _expected(pts, ivs, closed):
    ops = {
        "left": lambda p, lo, hi: lo <= p < hi,
        "both": lambda p, lo, hi: lo <= p <= hi,
        "right": lambda p, lo, hi: lo < p <= hi,
        "neither": lambda p, lo, hi: lo < p < hi,
    }[closed]
    return sorted(
        (pid, iid) for pid, p in pts for iid, lo, hi in ivs if ops(p, lo, hi)
    )


@pytest.mark.parametrize("closed", ["left", "both", "right", "neither"])
def test_range_join_bruteforce_parity(spark, pts_ivs, closed):
    pdf, idf, pts, ivs = pts_ivs
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            pdf, idf, point_col="p", lo_col="lo", hi_col="hi",
            bucket_width=100, closed=closed,
        ).collect()
    )
    assert got == _expected(pts, ivs, closed)


def test_range_join_bucket_width_invariance(spark, pts_ivs):
    pdf, idf, *_ = pts_ivs
    args = dict(point_col="p", lo_col="lo", hi_col="hi")
    small = range_join(pdf, idf, bucket_width=13, **args)
    large = range_join(pdf, idf, bucket_width=5000, **args)
    key = lambda df: sorted((r["pid"], r["iid"]) for r in df.collect())
    assert key(small) == key(large)


def test_range_join_left_keeps_unmatched(spark):
    pdf = spark.createDataFrame([(1, 5.0), (2, 999.0)], "pid int, p double")
    idf = spark.createDataFrame([(10, 0.0, 10.0)], "iid int, lo double, hi double")
    out = {
        r["pid"]: r["iid"]
        for r in range_join(
            pdf, idf, point_col="p", lo_col="lo", hi_col="hi",
            bucket_width=50, how="left",
        ).collect()
    }
    assert out == {1: 10, 2: None}


def test_range_join_exactly_once_for_wide_intervals(spark):
    # interval spanning many buckets must not duplicate matches
    pdf = spark.createDataFrame([(1, 500.0)], "pid int, p double")
    idf = spark.createDataFrame([(7, 0.0, 10000.0)], "iid int, lo double, hi double")
    rows = range_join(
        pdf, idf, point_col="p", lo_col="lo", hi_col="hi", bucket_width=10
    ).collect()
    assert len(rows) == 1


def test_interval_join_bruteforce_parity(spark):
    rnd = random.Random(11)
    a = [(i, float(rnd.randrange(0, 900)), 0.0) for i in range(120)]
    a = [(i, lo, lo + rnd.randrange(1, 120)) for i, lo, _ in a]
    b = [(j, float(rnd.randrange(0, 900)), 0.0) for j in range(90)]
    b = [(j, lo, lo + rnd.randrange(1, 200)) for j, lo, _ in b]
    adf = spark.createDataFrame(a, "aid int, alo double, ahi double")
    bdf = spark.createDataFrame(b, "bid int, blo double, bhi double")
    got = sorted(
        (r["aid"], r["bid"])
        for r in interval_join(
            adf, bdf, lo_left="alo", hi_left="ahi",
            lo_right="blo", hi_right="bhi", bucket_width=64,
        ).collect()
    )
    want = sorted(
        (ai, bj)
        for ai, alo, ahi in a
        for bj, blo, bhi in b
        if alo < bhi and blo < ahi
    )
    assert got == want


def test_validation(spark, pts_ivs):
    pdf, idf, *_ = pts_ivs
    with pytest.raises(ValueError, match="bucket_width"):
        range_join(pdf, idf, point_col="p", lo_col="lo", hi_col="hi", bucket_width=0)
    with pytest.raises(ValueError, match="closed"):
        range_join(
            pdf, idf, point_col="p", lo_col="lo", hi_col="hi",
            bucket_width=10, closed="open",
        )
    with pytest.raises(ValueError, match="how"):
        range_join(
            pdf, idf, point_col="p", lo_col="lo", hi_col="hi",
            bucket_width=10, how="full",
        )
