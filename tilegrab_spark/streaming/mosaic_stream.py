"""Incremental mosaic maintenance over a landing stream (beyond-parity;
SURVEY.md §2.10 — the reference is strictly batch).

Shape: ``readStream`` over parquet drops of image rows →
``foreachBatch``: each micro-batch is key-joined against the wanted-tile
set (J1) and stitched into PARTIAL mosaics (A2/W1 kernel, one canvas per
mosaic group per batch), appended with the batch id — so each micro-batch
does work proportional to ITS rows only, never a re-scan of the full
table. ``compact_mosaics`` then folds the partials of each group into
the current canvas by batch-ordered overlay (black = missing, the
engine's missing-tile semantics throughout — images/mosaic.py:20), which
is an ordinary grouped-map over the (small) partial-mosaic table and can
run on whatever cadence the consumer wants.

Exactly-once: the stream checkpoint makes each landing file contribute to
exactly one batch; partials carry ``batch_id`` so a restarted query that
re-runs an uncommitted batch overwrites deterministically (same key, same
batch id ⇒ same canvas bytes).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from tilegrab_spark.kernels import png
from tilegrab_spark.operators.image_join import join_images
from tilegrab_spark.operators.mosaic import MOSAIC_SCHEMA, mosaic
from tilegrab_spark.sources.images import IMAGE_SCHEMA, TILE_ID_RE

PARTIAL_SCHEMA = MOSAIC_SCHEMA + ", batch_id long"


def stream_mosaic(
    spark: SparkSession,
    landing_dir: str,
    tiles_df: DataFrame,
    partials_path: str,
    checkpoint_dir: str,
    *,
    group_w: int = 4,
    group_h: int = 4,
    anchor: tuple | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Maintain partial mosaics incrementally from a landing directory.

    ``tiles_df``: the wanted-tile set (bounded, broadcastable — e.g. the
    output of ``tiles_for``); must carry (geom_id, z, x, y). ``anchor``
    pins the group grid origin so every batch agrees on group keys
    without an extent aggregation (REQUIRED for incremental consistency:
    a data-derived origin would drift between batches).
    """
    if anchor is None:
        raise ValueError("stream_mosaic needs an explicit anchor (stable group grid)")
    tiles_df = tiles_df.select("geom_id", "z", "x", "y")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        parsed = (
            batch_df.withColumn("z", F.regexp_extract("image_id", TILE_ID_RE, 1).cast("int"))
            .withColumn("x", F.regexp_extract("image_id", TILE_ID_RE, 2).cast("long"))
            .withColumn("y", F.regexp_extract("image_id", TILE_ID_RE, 3).cast("long"))
        )
        joined = join_images(tiles_df, parsed)
        m = mosaic(
            joined,
            group_w=group_w,
            group_h=group_h,
            full_groups_only=False,
            anchor=anchor,
        ).withColumn("batch_id", F.lit(batch_id))
        # deterministic per-batch target: a re-run of the same batch after
        # a crash rewrites the same directory (exactly-once effect)
        m.write.mode("overwrite").parquet(f"{partials_path}/batch_id={batch_id}")

    src = spark.readStream.schema(IMAGE_SCHEMA).parquet(landing_dir)
    writer = (
        src.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _overlay_group(key, pdf, png_level: int):
    import pandas as pd

    pdf = pdf.sort_values("batch_id")
    canvas = None
    n_tiles = 0
    n_bad = 0
    for _, row in pdf.iterrows():
        arr = png.decode_png(bytes(row["bytes"]))
        if canvas is None:
            canvas = arr.copy()
        else:
            mask = (arr != 0).any(axis=2)  # black = missing; later wins
            canvas[mask] = arr[mask]
        n_tiles += int(row["n_tiles"])
        n_bad += int(row["n_bad"])
    last = pdf.iloc[-1]
    out = {c: last[c] for c in (
        "geom_id", "z", "gx", "gy", "tminx", "tminy", "tmaxx", "tmaxy",
        "w", "h", "merc_xmin", "merc_ymin", "merc_xmax", "merc_ymax",
    )}
    out["n_tiles"] = n_tiles
    out["n_bad"] = n_bad
    out["bytes"] = png.encode_png(canvas, filter_type=2, level=png_level)
    return pd.DataFrame([out])


def compact_mosaics(spark: SparkSession, partials_path: str, *, png_level: int = 3) -> DataFrame:
    """Fold per-batch partial mosaics into current canvases: grouped-map
    overlay in batch order. Input is the (group-count-bounded) partial
    table, NOT the image table — compaction cost is O(groups × batches
    since last compaction)."""
    partials = spark.read.parquet(partials_path)
    return partials.groupBy("geom_id", "z", "gx", "gy").applyInPandas(
        lambda key, pdf: _overlay_group(key, pdf, png_level), schema=MOSAIC_SCHEMA
    )
