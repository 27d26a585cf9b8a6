"""Spatially-blocked splits: block atomicity, determinism, fraction
concentration, the DuckDB hash-contract oracle, and both input shapes."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.splits import (
    spatial_split,
    split_leakage_report,
    with_block_cell,
)

_FR = {"train": 0.8, "val": 0.1, "test": 0.1}


def _tile_frame(spark, zoom=12, n=48):
    rows = [(zoom, 64 * 32 + i, 64 * 32 + (i * 7) % n) for i in range(n)]
    rows += [(zoom, x, y) for (z, x, y) in rows[:10] for x, y in [(x + 1, y)]]
    return spark.createDataFrame(rows, "z int, x long, y long")


def test_block_atomicity_and_leakage_report(spark):
    df = spatial_split(_tile_frame(spark), block_zoom=8, fractions=_FR)
    rep = split_leakage_report(df, 8).collect()
    assert rep and all(r.n_splits == 1 for r in rep)
    # neighbors inside one block share the split label by construction
    assert df.select("split").distinct().count() <= 3


def test_deterministic_across_partitionings(spark):
    df = _tile_frame(spark, n=64)
    a = spatial_split(df.repartition(13), block_zoom=7, fractions=_FR)
    b = spatial_split(df.coalesce(1), block_zoom=7, fractions=_FR)
    left = {(r.z, r.x, r.y): r.split for r in a.collect()}
    right = {(r.z, r.x, r.y): r.split for r in b.collect()}
    assert left == right


def test_duckdb_hash_contract_oracle(spark):
    """The assignment must be re-derivable by an independent engine from
    the documented md5-60 contract over '{bz}_{bx}_{by}' || salt."""
    df = spatial_split(
        _tile_frame(spark, zoom=12, n=40), block_zoom=6, fractions=_FR,
        salt="s1", keep_block=True,
    )
    got = {(r.block_x, r.block_y): r.split for r in df.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE b(bx BIGINT, by BIGINT)")
    con.executemany("INSERT INTO b VALUES (?, ?)", sorted(set(got)))
    space = 1 << 60
    want = dict(
        (tuple(r[:2]), r[2])
        for r in con.execute(
            "SELECT bx, by, CASE "
            f"WHEN h < {int(0.8 * space)} THEN 'train' "
            f"WHEN h < {int(0.9 * space)} THEN 'val' "
            "ELSE 'test' END FROM (SELECT bx, by, "
            "('0x' || substr(md5('6_' || bx || '_' || by || 's1'), 1, 15))::BIGINT AS h "
            "FROM b)"
        ).fetchall()
    )
    assert got == want


def test_fraction_concentration(spark):
    """At 4096 blocks the realized shares are Binomial(B, f)/B — check
    each within 5 sigma."""
    pts = spark.range(4096).select(
        (F.col("id") % 64).cast("long").alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.lit(6).alias("z"),
    )
    counts = {
        r.split: r.n
        for r in spatial_split(pts, block_zoom=6, fractions=_FR)
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    B = 4096
    for k, f in _FR.items():
        sigma = (B * f * (1 - f)) ** 0.5
        assert abs(counts.get(k, 0) - B * f) < 5 * sigma, (k, counts)


def test_lonlat_rows_and_proximity(spark):
    pts = spark.createDataFrame(
        [(11.5010 + i * 1e-4, 48.1500 + i * 1e-4) for i in range(20)],
        "lon double, lat double",
    )
    out = spatial_split(pts, block_zoom=5, fractions=_FR).collect()
    assert len({r.split for r in out}) == 1  # one block -> one label


def test_validation(spark):
    df = _tile_frame(spark)
    with pytest.raises(ValueError):
        spatial_split(df, block_zoom=8, fractions={"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        spatial_split(df, block_zoom=8, fractions={"a": 0.0, "b": 1.0})
    with pytest.raises(ValueError):
        spatial_split(df, block_zoom=-1)
    with pytest.raises(ValueError):
        with_block_cell(spark.createDataFrame([(1,)], "q int"), 4)
    # rows coarser than the block zoom must error, not silently leak
    coarse = spark.createDataFrame([(3, 1, 1)], "z int, x long, y long")
    with pytest.raises(Exception):
        spatial_split(coarse, block_zoom=8).collect()
