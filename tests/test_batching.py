"""grouped_rank + aspect_bucket_batches vs a DuckDB window oracle.

grouped_rank must equal ``row_number() OVER (PARTITION BY key ORDER BY
order_col)`` exactly, for any boundary choice — the two-level scan is
an implementation detail, never a semantics change."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from tilegrab_spark.operators.packing import aspect_bucket_batches, grouped_rank

BUCKETS = [(1024, 1024), (1152, 896), (896, 1152), (1536, 640), (640, 1536)]


def _meta(spark, n=400, seed=9):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "image_id": [f"img{i:05d}" for i in range(n)],
            "w": rng.integers(320, 2048, n),
            "h": rng.integers(320, 2048, n),
            "lang": rng.choice(["en", "de", "fr"], n),
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_grouped_rank_matches_duckdb_window(spark):
    df, pdf = _meta(spark)
    got = grouped_rank(df, ["lang"], "image_id").toPandas()
    want = duckdb.sql(
        """SELECT image_id,
                  row_number() OVER (PARTITION BY lang ORDER BY image_id) AS rank
           FROM pdf"""
    ).df()
    merged = got.merge(want, on="image_id", suffixes=("", "_want"))
    assert (merged["rank"] == merged["rank_want"]).all()


def test_grouped_rank_boundary_invariance(spark):
    """Explicit degenerate boundaries (one chunk / many chunks) give
    byte-identical ranks — determinism independent of chunking."""
    df, _ = _meta(spark, n=120)
    a = grouped_rank(df, ["lang"], "image_id", boundaries=[]).toPandas()
    cuts = [f"img{i:05d}" for i in range(7, 120, 9)]
    b = grouped_rank(df, ["lang"], "image_id", boundaries=cuts).toPandas()
    m = a.merge(b, on="image_id", suffixes=("_a", "_b"))
    assert (m["rank_a"] == m["rank_b"]).all()


def test_grouped_rank_validation(spark):
    df, _ = _meta(spark, n=10)
    with pytest.raises(ValueError, match="key_cols"):
        grouped_rank(df, [], "image_id")


def _py_bucket(w, h):
    import math

    la = math.log(w / h)
    return min(
        range(len(BUCKETS)),
        key=lambda i: (abs(la - math.log(BUCKETS[i][0] / BUCKETS[i][1])), i),
    )


def test_aspect_buckets_and_batches(spark):
    df, pdf = _meta(spark, n=500, seed=4)
    bs = 16
    got = aspect_bucket_batches(
        df, BUCKETS, batch_size=bs, order_col="image_id"
    ).toPandas()
    # bucket assignment matches the scalar formula
    want_bucket = pdf.apply(lambda r: _py_bucket(int(r["w"]), int(r["h"])), axis=1)
    m = got.set_index("image_id").loc[pdf["image_id"]]
    assert (m["bucket_id"].to_numpy() == want_bucket.to_numpy()).all()
    # bucket dims looked up right
    for i, (bw, bh) in enumerate(BUCKETS):
        sub = got[got["bucket_id"] == i]
        assert (sub["bucket_w"] == bw).all() and (sub["bucket_h"] == bh).all()
    # batches: ranks contiguous 1..n per bucket; batch sizes exact
    for i in sorted(got["bucket_id"].unique()):
        sub = got[got["bucket_id"] == i].sort_values("rank")
        n = len(sub)
        assert list(sub["rank"]) == list(range(1, n + 1))
        assert (sub["batch_id"] == (sub["rank"] - 1) // bs).all()
        sizes = sub.groupby("batch_id").size()
        full_flags = sub.groupby("batch_id")["batch_full"].first()
        for b, sz in sizes.items():
            assert full_flags[b] == (sz == bs)
        # only the LAST batch may be ragged
        assert (sizes.iloc[:-1] == bs).all()
    # batches respect the global order: every row in batch k sorts
    # before every row in batch k+1 within its bucket
    for i in sorted(got["bucket_id"].unique()):
        sub = got[got["bucket_id"] == i]
        maxid = sub.groupby("batch_id")["image_id"].max().sort_index()
        minid = sub.groupby("batch_id")["image_id"].min().sort_index()
        assert (maxid.iloc[:-1].to_numpy() < minid.iloc[1:].to_numpy()).all()


def test_aspect_batches_validation(spark):
    df, _ = _meta(spark, n=5)
    with pytest.raises(ValueError, match="batch_size"):
        aspect_bucket_batches(df, BUCKETS, batch_size=0, order_col="image_id")
    with pytest.raises(ValueError, match="buckets"):
        aspect_bucket_batches(df, [], batch_size=4, order_col="image_id")
    with pytest.raises(ValueError, match="buckets"):
        aspect_bucket_batches(df, [(0, 5)], batch_size=4, order_col="image_id")


def test_append_stability_with_monotone_keys(spark):
    """New images whose order keys sort after the existing corpus must
    not move any existing row's rank or batch — the property that lets
    a daily append job extend batches without re-shipping old ones.
    Holds when boundaries are pinned (the pack_shards reuse contract)."""
    df_a, pdf_a = _meta(spark, n=200, seed=1)
    cuts = [f"img{i:05d}" for i in range(25, 200, 40)]
    # freeze chunking by pinning boundaries (the pack_shards reuse path)
    from tilegrab_spark.operators.packing import grouped_rank as gr

    ra = gr(df_a, ["lang"], "image_id", boundaries=cuts).toPandas()
    rng = np.random.default_rng(2)
    pdf_b = pd.DataFrame(
        {
            "image_id": [f"img{i:05d}" for i in range(200, 260)],  # sort after
            "w": rng.integers(320, 2048, 60),
            "h": rng.integers(320, 2048, 60),
            "lang": rng.choice(["en", "de", "fr"], 60),
        }
    )
    df_ab = spark.createDataFrame(pd.concat([pdf_a, pdf_b], ignore_index=True))
    rab = gr(df_ab, ["lang"], "image_id", boundaries=cuts).toPandas()
    m = ra.merge(rab, on="image_id", suffixes=("_old", "_new"))
    assert len(m) == 200
    assert (m["rank_old"] == m["rank_new"]).all()
