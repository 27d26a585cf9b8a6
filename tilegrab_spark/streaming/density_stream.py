"""Incremental density-layer maintenance over a point stream.

The batch operator (operators/render.py) turns a point lake into
heat tiles; this maintains that layer as points keep landing, without
ever re-binning history. The whole design rides on one fact: the
binned representation ``[x, y, px, py, weight]`` is ADDITIVE — a
micro-batch's bins merge into the persisted bin state by a plain
grouped SUM, and repainting is only needed for tiles the batch
touched.

Shape: ``readStream`` over parquet drops of point rows →
``foreachBatch``: bin THIS batch's points (`bin_points` — pure
Catalyst, map-side combined, output bounded by touched pixels) and
append them with the batch id to a delta table. Nothing else runs in
the hot path — each micro-batch does work proportional to its own
rows. Consumers then call:

- ``compact_density`` — current per-pixel weights: dedup replayed
  batches (binning is deterministic, so a re-run of an uncommitted
  batch appends IDENTICAL rows; ``max`` per (batch, pixel) before the
  cross-batch SUM makes replays exactly-once) and fold. One
  aggregation, prunable to a tile subset.
- ``render_current`` — full repaint of the layer via the shared paint
  stage (``render_binned``) — byte-identical to running the batch
  operator over all points ever landed (asserted in tests).
- ``render_dirty`` — repaint ONLY tiles touched since a batch id:
  dirty tile keys from the delta tail, full-history compaction
  restricted to those tiles by a broadcastable semi-join. Steady-state
  maintenance cost is O(delta + dirty-tile history), independent of
  layer size.

Exactly-once: the stream checkpoint assigns each landing file to one
batch; replays are deduped at compaction (above). The reference is
strictly batch (SURVEY §2.10) — this extends the streaming surface the
same way mosaic_stream does for stitching.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from tilegrab_spark.operators.render import bin_points, render_binned

__all__ = [
    "stream_density",
    "compact_density",
    "render_current",
    "render_dirty",
]

_DELTA_COLS = ("x", "y", "px", "py", "weight", "batch_id")


def stream_density(
    spark: SparkSession,
    landing_dir: str,
    deltas_path: str,
    checkpoint_dir: str,
    *,
    zoom: int,
    point_schema: str = "lon double, lat double",
    lon_col: str = "lon",
    lat_col: str = "lat",
    weight_col: Optional[str] = None,
    tile_px: int = 256,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Bin each micro-batch of landed points and append the bins (with
    ``batch_id``) to the delta table at ``deltas_path``."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        binned = bin_points(
            batch_df,
            zoom=zoom,
            lon_col=lon_col,
            lat_col=lat_col,
            weight_col=weight_col,
            tile_px=tile_px,
        ).withColumn("batch_id", F.lit(int(batch_id)))
        binned.write.mode("append").parquet(deltas_path)

    stream = (
        spark.readStream.schema(point_schema).parquet(landing_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        stream = stream.trigger(availableNow=True)
    return stream.start()


def compact_density(spark: SparkSession, deltas_path: str) -> DataFrame:
    """Current per-pixel weights ``[x, y, px, py, weight]`` from the
    delta table: replay-dedup (max per batch+pixel — re-runs of an
    uncommitted batch append byte-identical rows) then the cross-batch
    SUM. Map-side combinable both times."""
    deltas = spark.read.parquet(deltas_path).select(*_DELTA_COLS)
    once = deltas.groupBy("batch_id", "x", "y", "px", "py").agg(
        F.max("weight").alias("weight")
    )
    return once.groupBy("x", "y", "px", "py").agg(F.sum("weight").alias("weight"))


def render_current(
    spark: SparkSession,
    deltas_path: str,
    *,
    zoom: int,
    **paint_kwargs,
) -> DataFrame:
    """Repaint the whole layer from the delta table — byte-identical
    to the batch operator over every point ever landed."""
    return render_binned(compact_density(spark, deltas_path), zoom=zoom, **paint_kwargs)


def render_dirty(
    spark: SparkSession,
    deltas_path: str,
    *,
    zoom: int,
    since_batch_id: int,
    **paint_kwargs,
) -> DataFrame:
    """Repaint only tiles touched by batches AFTER ``since_batch_id``:
    the steady-state maintenance call. Untouched tiles keep their
    previously rendered bytes (per-tile scaling is self-contained;
    with an explicit ``vmax`` the scale is global and constant)."""
    deltas = spark.read.parquet(deltas_path).select(*_DELTA_COLS)
    dirty = (
        deltas.filter(F.col("batch_id") > int(since_batch_id))
        .select("x", "y")
        .distinct()
    )
    once = (
        deltas.join(F.broadcast(dirty), ["x", "y"], "left_semi")
        .groupBy("batch_id", "x", "y", "px", "py")
        .agg(F.max("weight").alias("weight"))
    )
    current = once.groupBy("x", "y", "px", "py").agg(F.sum("weight").alias("weight"))
    return render_binned(current, zoom=zoom, **paint_kwargs)
