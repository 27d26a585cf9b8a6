"""Watermarked event-time windowed aggregation (driver brief: "watermarks
+ windowed aggs for late data").

``stream_windowed_counts`` consumes event rows (``ts timestamp,
event_type string, value double``) from a landing directory and emits
FINALIZED per-window counts: append output mode + watermark means a
window row is written exactly once, only after the watermark passes its
end — late rows within the watermark still count; rows later than the
watermark are dropped (the deterministic late-data contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def stream_windowed_counts(
    spark,
    landing_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> StreamingQuery:
    src = spark.readStream.schema(EVENT_SCHEMA).parquet(landing_dir)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")  # only watermark-finalized windows
        .trigger(availableNow=True)
        .start()
    )
