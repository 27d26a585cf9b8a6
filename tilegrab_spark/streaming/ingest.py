"""Structured-Streaming ingest of image rows (beyond-parity; the
reference is strictly batch — SURVEY.md §2.10 — its only incremental
behavior is restart-resume, which this engine covers with lineage
anti-joins in plans/lineage.py).

This variant keeps the image table continuously loaded from a landing
directory of parquet drops: readStream → tile-key projection (same pure
Catalyst expressions as the batch path) → partitioned append with a
checkpoint, so ingest survives restarts exactly-once per file.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from tilegrab_spark.sources.images import IMAGE_SCHEMA, TILE_ID_RE, cell_id_col


def stream_image_ingest(
    spark: SparkSession,
    landing_dir: str,
    table_path: str,
    checkpoint_dir: str,
    *,
    n_buckets: int = 16,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Stream parquet drops of image rows into the partitioned table.

    ``trigger_once=True`` runs one incremental catch-up batch (the batch
    engine's tables stay the single source of truth); ``False`` runs
    continuous micro-batches.
    """
    src = (
        spark.readStream.schema(IMAGE_SCHEMA)
        .parquet(landing_dir)
        .withColumn("z", F.regexp_extract("image_id", TILE_ID_RE, 1).cast("int"))
        .withColumn("x", F.regexp_extract("image_id", TILE_ID_RE, 2).cast("long"))
        .withColumn("y", F.regexp_extract("image_id", TILE_ID_RE, 3).cast("long"))
        .withColumn("zoom", F.col("z"))
        .withColumn(
            "bucket", F.pmod(cell_id_col("z", "x", "y"), F.lit(n_buckets)).cast("int")
        )
        .drop("z", "x", "y")
    )
    writer = (
        src.writeStream.format("parquet")
        .option("path", table_path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("zoom", "bucket")
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
