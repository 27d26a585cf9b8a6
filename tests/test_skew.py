"""Skew handling: the salted join actually spreads a hot cell across
reducers (north rule: explicit skew splitting for dense urban cells),
and the metrics upsert view resolves to the newest record."""

from pyspark.sql import functions as F

from tilegrab_spark.operators.image_join import join_images
from tilegrab_spark.plans.lineage import MetricsStore


def test_salted_join_spreads_hot_cell(spark):
    # one hot cell with 4000 images, 50 cold cells with 1
    rows = [(10, 5, 5, f"10_5_5_{i}") for i in range(4000)]
    rows += [(10, 100 + i, 100 + i, f"10_{100+i}_{100+i}_0") for i in range(50)]
    images = spark.createDataFrame(rows, "z int, x long, y long, image_id string")
    tiles = spark.createDataFrame(
        [(10, 5, 5), *[(10, 100 + i, 100 + i) for i in range(50)]],
        "z int, x long, y long",
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")  # observe raw partitioning
    try:
        for salt, max_share in ((1, 1.01), (8, 0.4)):
            j = join_images(tiles, images, broadcast_tiles=False, salt=salt)
            per_part = (
                j.withColumn("pid", F.spark_partition_id())
                .filter((F.col("x") == 5) & (F.col("y") == 5))
                .groupBy("pid")
                .count()
                .collect()
            )
            total = sum(r["count"] for r in per_part)
            assert total == 4000
            top = max(r["count"] for r in per_part) / total
            assert top <= max_share, (salt, top)
            if salt == 8:
                # hot cell spread across most reducers (test session has
                # only 4 shuffle partitions — 8 salts hash into <= 4)
                assert len(per_part) >= 3
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_metrics_latest_upsert_view(spark, tmp_path):
    ms = MetricsStore(spark, str(tmp_path / "m"))
    df1 = spark.createDataFrame([(1,), (2,)], "cell_id long")
    ms.append_stage(df1, run_id="r1", stage="fetch", status="FAILED")
    import time

    time.sleep(1.1)  # current_timestamp granularity
    df2 = spark.createDataFrame([(1,)], "cell_id long")
    ms.append_stage(df2, run_id="r2", stage="fetch", status="SUCCESS")
    latest = {r.cell_id: r.status for r in ms.latest().collect()}
    assert latest == {1: "SUCCESS", 2: "FAILED"}
    # resume: cell 1 done, cell 2 must be retried
    work = spark.createDataFrame([(1,), (2,)], "cell_id long")
    remaining = ms.resume_filter(work, "fetch")
    assert [r.cell_id for r in remaining.collect()] == [2]


def test_skew_aware_join_matches_plain(spark):
    from tilegrab_spark.operators.image_join import (
        identify_hot_cells,
        join_images_skew_aware,
    )

    rows = [(10, 5, 5, f"10_5_5_{i}") for i in range(500)]
    rows += [(10, 100 + i, 100 + i, f"10_{100+i}_{100+i}_0") for i in range(50)]
    images = spark.createDataFrame(rows, "z int, x long, y long, image_id string")
    tiles = spark.createDataFrame(
        [(10, 5, 5), (10, 7, 7), *[(10, 100 + i, 100 + i) for i in range(30)]],
        "z int, x long, y long",
    )
    hot = identify_hot_cells(images, threshold=100)
    assert [(r.x, r.y) for r in hot.collect()] == [(5, 5)]
    skew = join_images_skew_aware(tiles, images, hot_threshold=100, salt=4)
    plain = join_images(tiles, images)
    a = sorted((r.x, r.y, r.image_id) for r in skew.collect())
    b = sorted((r.x, r.y, r.image_id) for r in plain.collect())
    assert a == b and len(a) == 500 + 30


def test_identify_hot_cells_mg_matches_groupby(spark):
    from tilegrab_spark.operators.image_join import identify_hot_cells

    rows = [(10, 5, 5, f"a{i}") for i in range(500)]
    rows += [(11, 9, 3, f"b{i}") for i in range(150)]
    rows += [(10, 100 + i, 100 + i, f"c{i}") for i in range(80)]
    images = spark.createDataFrame(
        rows, "z int, x long, y long, image_id string"
    ).repartition(9)
    want = sorted(
        (r.z, r.x, r.y, r.n_rows)
        for r in identify_hot_cells(images, threshold=100).collect()
    )
    got = sorted(
        (r.z, r.x, r.y, r.n_rows)
        for r in identify_hot_cells(images, threshold=100, via="mg").collect()
    )
    assert got == want == [(10, 5, 5, 500), (11, 9, 3, 150)]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        identify_hot_cells(images, via="nope")
