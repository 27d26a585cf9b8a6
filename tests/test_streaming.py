"""Streaming ingest: parquet drops land in the partitioned image table
exactly once across restarts (checkpointed availableNow)."""

from tilegrab_spark.sources.images import read_image_table, write_synthetic_image_table
from tilegrab_spark.streaming.ingest import stream_image_ingest


def test_stream_ingest_exactly_once(spark, tmp_path):
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    # drop 1: two tiles
    write_synthetic_image_table(
        spark, landing, [(16, 1, 1, 0), (16, 1, 2, 0)], n_buckets=2, mode="overwrite"
    )
    q = stream_image_ingest(spark, landing, table, ckpt, n_buckets=2)
    q.awaitTermination(120)
    assert read_image_table(spark, table).count() == 2

    # drop 2: one more tile, new files; rerun catches up only the delta
    write_synthetic_image_table(
        spark, landing, [(16, 2, 2, 0)], n_buckets=2, mode="append"
    )
    q2 = stream_image_ingest(spark, landing, table, ckpt, n_buckets=2)
    q2.awaitTermination(120)
    df = read_image_table(spark, table)
    assert df.count() == 3
    assert df.select("image_id").distinct().count() == 3

    # rerun with no new data: nothing duplicated
    q3 = stream_image_ingest(spark, landing, table, ckpt, n_buckets=2)
    q3.awaitTermination(120)
    assert read_image_table(spark, table).count() == 3
