"""Provider/URL contract parity (reference tests/test_sources.py:6-33 +
FIXTURES.md §4.5), both driver-side and as Catalyst projections."""

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.sources.tile_sources import SOURCES, url_column


def test_all_providers_registered():
    # the reference's four providers, plus the engine's quadkey-
    # addressed extension (bingsat)
    assert set(SOURCES) == {"osm", "esri_wi", "gsat", "nmsat", "bingsat"}
    for s in SOURCES.values():
        assert s.uid and s.name and s.url_template


def test_osm_url_golden():
    assert (
        SOURCES["osm"].get_url(z=16, x=47439, y=31441)
        == "https://tile.openstreetmap.org/16/47439/31441.png"
    )


def test_url_contract_1_1_1():
    # get_url(1,1,1) contains exactly one '/1/1/1' or '&x=1&y=1&z=1'
    # (quadkey-addressed providers render the level-1 quadkey instead)
    for uid, s in SOURCES.items():
        url = s.get_url(z=1, x=1, y=1, api_key="K" if s.requires_key else None)
        if "{q}" in s.url_template:
            assert "a3" in url, (uid, url)  # quadkey of (1,1)@z1 is "3"
        else:
            assert url.count("/1/1/1") == 1 or "&x=1&y=1&z=1" in url, (uid, url)


def test_bingsat_quadkey_golden():
    # Bing tile-system docs example: (x=3, y=5) at level 3 -> "213"
    url = SOURCES["bingsat"].get_url(z=3, x=3, y=5)
    assert "a213.jpeg" in url


def test_esri_path_order_z_y_x():
    url = SOURCES["esri_wi"].get_url(z=3, x=1, y=2)
    assert url.endswith("/3/2/1")


def test_nearmap_requires_key():
    with pytest.raises(ValueError):
        SOURCES["nmsat"].get_url(z=1, x=1, y=1)
    assert "apikey=SECRET" in SOURCES["nmsat"].get_url(z=1, x=1, y=1, api_key="SECRET")


def test_url_column_matches_driver_scalar(spark):
    df = spark.createDataFrame(
        [(16, 47439, 31441), (1, 1, 1), (3, 1, 2)], "z int, x long, y long"
    )
    for uid, s in SOURCES.items():
        key = "K" if s.requires_key else None
        rows = df.withColumn(
            "url", url_column(uid, F.col("z"), F.col("x"), F.col("y"), api_key=key)
        ).collect()
        for r in rows:
            assert r.url == s.get_url(z=r.z, x=r.x, y=r.y, api_key=key), uid


def test_url_column_missing_key_raises():
    with pytest.raises(ValueError):
        url_column("nmsat", F.col("z"), F.col("x"), F.col("y"))


def test_bucketed_tables_join_with_zero_exchange(spark, tmp_path):
    """Co-located join layout (SURVEY §4): two tables bucketed+sorted on
    cell_id join as a SortMergeJoin with NO Exchange on either side —
    at 10^12 rows this is the difference between a map-side join and a
    petabyte shuffle. (Plan-asserted, plus row parity vs plain join.)"""
    import pandas as pd

    from pyspark.sql import functions as F

    from tilegrab_spark.sources.images import (
        IMAGE_SCHEMA,
        _gen_batch,
        write_bucketed_image_table,
    )

    import shutil

    for t in ("bkt_a", "bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a previously crashed run can leave the managed location behind
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    cells = [{"z": 15, "x": 100 + i, "y": 200 + j, "src": 0, "bucket": 0}
             for i in range(6) for j in range(6)]
    pdf = _gen_batch(pd.DataFrame(cells), 64, 64)
    df = spark.createDataFrame(pdf, IMAGE_SCHEMA)
    write_bucketed_image_table(df.select("image_id", "caption"), "bkt_a", n_buckets=4)
    write_bucketed_image_table(df.select("image_id", "phash"), "bkt_b", n_buckets=4)

    a = spark.table("bkt_a")
    b = spark.table("bkt_b")
    # at sandbox size the planner would broadcast (also fine — but the
    # bucketing claim under test is the BIG-table plan, where broadcast
    # is impossible): pin the non-broadcast path and inspect the join
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, on="cell_id").select("cell_id", "caption", "phash")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 36
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
