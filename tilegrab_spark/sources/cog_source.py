"""Distributed Cloud-Optimized GeoTIFF scan — COG files → tile rows.

Read-side counterpart of `export_mosaics(fmt="cog")` (kernels/cog.py):
turns a directory of COGs back into a DataFrame of individually
addressable tiles WITHOUT ever decoding (or even reading) a whole
raster.  This is the 100 TB serving shape — a petabyte COG lake is
scanned tile-granular, bbox-pruned, at whatever parallelism the cluster
has, independent of how many tiles each file holds.

Two Spark stages, no driver-side data reads (reference parity: the
reference re-ingests exported rasters only whole-file via PIL,
images/image.py:28 — this is strictly more scalable):

1. **index** — `mapInPandas` over file paths: each task range-reads just
   the metadata block (the COG header-first rule guarantees all IFDs and
   tag payloads precede all tile data, so a small prefix read suffices —
   start at 64 KiB, grow 4× on demand) and emits one row per selected
   (level, ty, tx) tile carrying its byte range and per-tile model
   bounds.  **bbox pruning happens here**: tiles whose bounds miss the
   bbox never become rows, so their byte ranges are never read —
   I/O is O(bbox), not O(raster).
2. **fetch** — after a repartition that spreads tile rows evenly across
   the cluster (a single huge COG still fans out to every core),
   `mapInPandas` reads each tile's [offset, offset+count) range and
   decodes it (deflate + horizontal predictor, zlib expansion capped at
   one tile), cropping edge tiles to their real extent.

Rows come back with raw RGB pixels (`px`, row-major uint8) plus per-tile
EPSG:3857 bounds, ready for `F.*` pixel stats or re-encoding.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

INDEX_SCHEMA = T.StructType([
    T.StructField("path", T.StringType(), False),
    T.StructField("level", T.IntegerType(), False),
    T.StructField("ty", T.IntegerType(), False),
    T.StructField("tx", T.IntegerType(), False),
    T.StructField("byte_offset", T.LongType(), False),
    T.StructField("byte_count", T.LongType(), False),
    T.StructField("tile_w", T.IntegerType(), False),
    T.StructField("tile_h", T.IntegerType(), False),
    T.StructField("w", T.IntegerType(), False),   # cropped (real) extent
    T.StructField("h", T.IntegerType(), False),
    T.StructField("compression", T.IntegerType(), False),
    T.StructField("predictor", T.IntegerType(), False),
    T.StructField("merc_xmin", T.DoubleType(), False),
    T.StructField("merc_ymin", T.DoubleType(), False),
    T.StructField("merc_xmax", T.DoubleType(), False),
    T.StructField("merc_ymax", T.DoubleType(), False),
    T.StructField("epsg", T.IntegerType(), False),
])

TILE_SCHEMA = T.StructType([
    T.StructField("path", T.StringType(), False),
    T.StructField("level", T.IntegerType(), False),
    T.StructField("ty", T.IntegerType(), False),
    T.StructField("tx", T.IntegerType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("px", T.BinaryType(), False),   # raw RGB, h*w*3 bytes
    T.StructField("merc_xmin", T.DoubleType(), False),
    T.StructField("merc_ymin", T.DoubleType(), False),
    T.StructField("merc_xmax", T.DoubleType(), False),
    T.StructField("merc_ymax", T.DoubleType(), False),
    T.StructField("epsg", T.IntegerType(), False),
])

_FIRST_PREFIX = 1 << 16


def read_cog_index(path: str) -> dict:
    """Parse one COG's tile index from a bounded prefix read (never the
    whole file unless the metadata block itself is that large)."""
    from tilegrab_spark.kernels import cog

    size = os.path.getsize(path)
    n = min(_FIRST_PREFIX, size)
    with open(path, "rb") as f:
        data = f.read(n)
        while True:
            try:
                return cog.parse_index(data)
            except ValueError:
                if n >= size:
                    raise
                n = min(n * 4, size)
                data += f.read(n - len(data))


def _index_rows(path: str, level: int, bbox) -> Iterator[tuple]:
    idx = read_cog_index(path)
    if not 0 <= level < len(idx["levels"]):
        raise ValueError(
            f"{path}: level {level} out of range (file has "
            f"{len(idx['levels'])} levels)"
        )
    lv = idx["levels"][level]
    xmin, ymin, xmax, ymax = idx["bounds"]
    w, h, tw, tl = lv["w"], lv["h"], lv["tile_w"], lv["tile_h"]
    # model units per pixel AT THIS LEVEL (overviews inherit the full
    # raster's model bounds per the spec)
    sx = (xmax - xmin) / w
    sy = (ymax - ymin) / h
    tiles_x = (w + tw - 1) // tw
    for i, (off, cnt) in enumerate(zip(lv["offsets"], lv["counts"])):
        ty, tx = divmod(i, tiles_x)
        cw = min(tw, w - tx * tw)
        ch = min(tl, h - ty * tl)
        txmin = xmin + tx * tw * sx
        tymax = ymax - ty * tl * sy
        txmax = txmin + cw * sx
        tymin = tymax - ch * sy
        if bbox is not None and (
            txmin >= bbox[2] or txmax <= bbox[0]
            or tymin >= bbox[3] or tymax <= bbox[1]
        ):
            continue
        yield (
            path, level, ty, tx, off, cnt, tw, tl, cw, ch,
            lv["compression"], lv["predictor"],
            txmin, tymin, txmax, tymax, idx["epsg"],
        )


def cog_tile_index(
    spark: SparkSession,
    paths: str | list[str],
    *,
    bbox: tuple[float, float, float, float] | None = None,
    level: int = 0,
) -> DataFrame:
    """Stage 1: the bbox-pruned tile index (byte ranges + bounds, no
    pixels).  `paths` is a glob, a directory, or an explicit list —
    expansion is driver-side metadata only; header parsing is
    distributed, one bounded prefix read per file."""
    import pandas as pd

    if isinstance(paths, str):
        p = paths
        if os.path.isdir(p):
            p = os.path.join(p, "*.tif")
        files = sorted(_glob.glob(p))
    else:
        files = sorted(paths)
    if not files:
        raise ValueError(f"no COG files matched {paths!r}")

    cols = [f.name for f in INDEX_SCHEMA.fields]

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                r for path in pdf["path"]
                for r in _index_rows(path, level, bbox)
            ]
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    fdf = spark.createDataFrame(
        [(f,) for f in files], T.StructType([T.StructField("path", T.StringType(), False)])
    ).repartition(min(len(files), spark.sparkContext.defaultParallelism))
    return fdf.mapInPandas(scan, schema=INDEX_SCHEMA)


def read_cog_tiles(
    spark: SparkSession,
    paths: str | list[str],
    *,
    bbox: tuple[float, float, float, float] | None = None,
    level: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """COG files → decoded tile rows (TILE_SCHEMA).  Only tiles
    intersecting `bbox` (model/EPSG:3857 units) are read or decoded;
    `level` selects an internal overview (0 = full resolution).

    `partitions` controls fetch-stage fan-out (default: cluster
    parallelism) — the index rows are tiny, so the repartition shuffle
    is negligible next to the range reads it balances."""
    index = cog_tile_index(spark, paths, bbox=bbox, level=level)
    n = partitions or spark.sparkContext.defaultParallelism
    return fetch_cog_tiles(index.repartition(n))


def fetch_cog_tiles(index: DataFrame) -> DataFrame:
    """Stage 2: decode an INDEX_SCHEMA frame's byte ranges into pixels.
    Exposed separately so callers can filter/re-balance the index
    relationally (e.g. join against a tile worklist) before paying I/O."""
    import pandas as pd

    cols = [f.name for f in TILE_SCHEMA.fields]

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tilegrab_spark.kernels import cog

        handles: dict[str, object] = {}
        try:
            for pdf in batches:
                out = []
                for r in pdf.itertuples(index=False):
                    f = handles.get(r.path)
                    if f is None:
                        if len(handles) > 64:  # bound open fds per task
                            for h in handles.values():
                                h.close()
                            handles.clear()
                        f = handles[r.path] = open(r.path, "rb")
                    f.seek(r.byte_offset)
                    raw = f.read(r.byte_count)
                    if len(raw) < r.byte_count:
                        raise ValueError(f"{r.path}: tile range truncated")
                    block = cog.decode_tile(
                        raw, r.tile_w, r.tile_h, r.compression, r.predictor
                    )
                    px = block[: r.h, : r.w].tobytes()
                    out.append((
                        r.path, r.level, r.ty, r.tx, r.w, r.h, px,
                        r.merc_xmin, r.merc_ymin, r.merc_xmax, r.merc_ymax,
                        r.epsg,
                    ))
                if out:
                    yield pd.DataFrame(out, columns=cols)
        finally:
            for h in handles.values():
                h.close()

    return index.mapInPandas(fetch, schema=TILE_SCHEMA)
