"""Tile-pyramid rollup: build zoom level z-1 from level z — each parent
tile is the 2x2 mosaic of its children, block-mean downsampled back to
tile size. The tiling-engine analogue of a hypertable rollup: a
``groupBy(parent cell).applyInPandas`` reducer whose group key
(``x >> 1, y >> 1``) is a pure projection computed BEFORE the shuffle, so
building a whole level over 10^12 tiles is one shuffle sized by the
OUTPUT level (4x smaller than the input).

Iterating ``build_parent_level`` from z_max down to z_min materializes a
full pyramid; each level reads only the previous level's table
(partition-pruned by zoom).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tilegrab_spark.kernels import png

PARENT_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, zoom int, bucket int, n_children int"
)


def build_parent_level(
    images_df: DataFrame,
    zoom: int,
    *,
    tile_w: int = 256,
    tile_h: int = 256,
    src: str = "0",
    n_buckets: int = 16,
    png_level: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """Parent tiles at ``zoom - 1`` from child rows at ``zoom``.

    Children are placed in a 2x2 canvas by (x&1, y&1), missing children
    stay black (same missing-tile semantics as the mosaic, mosaic.py:20),
    then block-mean 2:1 downsample. Output rows carry the image-table
    schema so the result appends straight into the pyramid table.
    """
    pz = zoom - 1
    df = (
        images_df.filter(F.col("z") == zoom)
        .select(
            "x", "y", "bytes", "fmt",
            F.shiftright(F.col("x"), 1).alias("px"),
            F.shiftright(F.col("y"), 1).alias("py"),
        )
    )
    spark = images_df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism * 2
    df = df.repartition(nparts, "px", "py")

    import pyarrow as pa
    from typing import Tuple

    def _rollup_core(px, py, xs, ys, datas):
        canvas = np.zeros((tile_h * 2, tile_w * 2, 3), dtype=np.uint8)
        n = 0
        for i in sorted(range(len(xs)), key=lambda i: (ys[i], xs[i])):
            if datas[i] is None:
                continue
            arr = png.decode_png(bytes(datas[i]))
            ox = (int(xs[i]) & 1) * tile_w
            oy = (int(ys[i]) & 1) * tile_h
            canvas[oy : oy + tile_h, ox : ox + tile_w] = arr[:tile_h, :tile_w]
            n += 1
        small = (
            canvas.reshape(tile_h, 2, tile_w, 2, 3).mean(axis=(1, 3)).astype(np.uint8)
        )
        data = png.encode_png(small, filter_type=2, level=png_level)
        cell = (pz << 58) | (px << 29) | py
        return {
            "image_id": f"{pz}_{px}_{py}_{src}",
            "bytes": data,
            "w": tile_w,
            "h": tile_h,
            "fmt": "png",
            "caption": f"tile {pz}/{px}/{py} src={src} rollup n={n}",
            "phash": png.phash64(small),
            "zoom": pz,
            "bucket": int(cell % n_buckets),
            "n_children": n,
        }

    _schema = pa.schema(
        [
            ("image_id", pa.string()), ("bytes", pa.binary()),
            ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
            ("caption", pa.string()), ("phash", pa.int64()),
            ("zoom", pa.int32()), ("bucket", pa.int32()),
            ("n_children", pa.int32()),
        ]
    )

    def rollup(key: Tuple, tbl: "pa.Table") -> "pa.Table":
        px, py = (int(v.as_py() if hasattr(v, "as_py") else v) for v in key)
        row = _rollup_core(
            px, py,
            tbl.column("x").to_pylist(),
            tbl.column("y").to_pylist(),
            tbl.column("bytes").to_pylist(),
        )
        return pa.Table.from_pylist([row], schema=_schema)

    return df.groupBy("px", "py").applyInArrow(rollup, schema=PARENT_SCHEMA)


def build_pyramid(
    images_df: DataFrame,
    table_path: str,
    *,
    z_max: int,
    z_min: int,
    **kw,
) -> None:
    """Materialize all levels z_max-1 .. z_min into the pyramid table.
    Each level reads the PREVIOUS level's committed output (never the
    whole pyramid) — zoom partition pruning keeps every step 4x smaller.
    """
    from tilegrab_spark.sources.images import read_image_table

    spark = images_df.sparkSession
    level_src = images_df
    for z in range(z_max, z_min, -1):
        parents = build_parent_level(level_src, z, **kw)
        parents.write.mode("append").partitionBy("zoom", "bucket").parquet(table_path)
        level_src = read_image_table(spark, table_path).filter(
            F.col("zoom") == z - 1
        )
