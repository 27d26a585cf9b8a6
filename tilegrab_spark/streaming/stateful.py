"""Custom stateful streaming operator: running per-cell ingest statistics
via ``applyInPandasWithState`` — the Structured-Streaming shape for
operators Spark lacks natively (driver brief: "applyInPandasWithState for
custom stateful operators").

``stream_cell_stats`` maintains, per tile cell, a running count of image
rows, total payload bytes, and the latest phash seen — surviving across
micro-batches via GroupState. Late/duplicate drops update the same cell
state; the output stream emits one row per (cell, batch) update.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_images long, total_bytes long, last_phash long"
OUTPUT_SCHEMA = (
    "z int, x long, y long, n_images long, total_bytes long, last_phash long"
)


def _update_cell(
    key: Tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    z, x, y = key
    if state.exists:
        n, total, last = state.get
    else:
        n, total, last = 0, 0, 0
    for pdf in batches:
        n += len(pdf)
        total += int(pdf["nbytes"].sum())
        if len(pdf):
            last = int(pdf["phash"].iloc[-1])
    state.update((n, total, last))
    yield pd.DataFrame(
        [{"z": z, "x": x, "y": y, "n_images": n, "total_bytes": total, "last_phash": last}]
    )


def stream_cell_stats(
    spark,
    landing_dir: str,
    checkpoint_dir: str,
    out_dir: str,
):
    """Streaming per-cell rollup of image drops. Each micro-batch's
    updated cell rows are appended to ``out_dir`` (parquet, with a
    batch_id column) via foreachBatch — checkpoint-recoverable, so a
    restarted query resumes its GroupState and processes only new files."""
    from tilegrab_spark.sources.images import IMAGE_SCHEMA, TILE_ID_RE

    src = (
        spark.readStream.schema(IMAGE_SCHEMA)
        .parquet(landing_dir)
        .withColumn("z", F.regexp_extract("image_id", TILE_ID_RE, 1).cast("int"))
        .withColumn("x", F.regexp_extract("image_id", TILE_ID_RE, 2).cast("long"))
        .withColumn("y", F.regexp_extract("image_id", TILE_ID_RE, 3).cast("long"))
        .withColumn("nbytes", F.length("bytes"))
        .select("z", "x", "y", "nbytes", "phash")
    )
    stats = src.groupBy("z", "x", "y").applyInPandasWithState(
        _update_cell,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_dir
        )

    return (
        stats.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
