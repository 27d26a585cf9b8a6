"""File-system export sinks (S5/S6/S7 parity, reference
images/exporter.py:14-76 and images/image.py:45-56).

The engine's durable sink is the parquet/Iceberg mosaic table
(Engine.write); these helpers materialize table rows as individual image
files the way the reference's CLI does — ``{index}_mosaic.png`` under the
output dir, ``{z}_{x}_{y}.png`` for per-tile saves, and for
``fmt='tiff'`` a REAL GeoTIFF (kernels/geotiff.py — same bytes
rasterio's GTiff driver + ``from_bounds`` would emit for EPSG:3857:
ModelPixelScale/ModelTiepoint/GeoKeyDirectory tags; exporter.py:47-74),
plus optional world-file + JSON sidecars."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame


def export_mosaics(
    mosaics: DataFrame,
    out_dir: str | Path,
    *,
    fmt: str = "png",
    georeference: bool = False,
) -> list[Path]:
    """Write each mosaic row as ``{i}_mosaic.{png|tif}`` (grouped outputs
    follow the reference's 1-based index naming, exporter.py:31-36).
    Streams rows with toLocalIterator — never collects all canvases at
    once."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    if fmt not in ("png", "jpg", "tiff", "cog", "webp", "webp_lossy"):
        raise ValueError(f"unsupported export fmt {fmt!r}")
    written = []
    rows = mosaics.orderBy("geom_id", "z", "gx", "gy").toLocalIterator()
    for i, r in enumerate(rows, start=1):
        if fmt == "cog":
            # Cloud-Optimized GeoTIFF: tiled + deflate + internal 2:1
            # overviews, header-first layout (kernels/cog.py) — the
            # object-store serving shape of the S7 sink
            from tilegrab_spark.kernels import cog, png

            p = out / f"{i}_mosaic.tif"
            p.write_bytes(
                cog.encode_cog(
                    png.decode_png(bytes(r.bytes)),
                    (r.merc_xmin, r.merc_ymin, r.merc_xmax, r.merc_ymax),
                )
            )
        elif fmt == "tiff":
            from tilegrab_spark.kernels import geotiff, png

            p = out / f"{i}_mosaic.tif"
            p.write_bytes(
                geotiff.encode_geotiff(
                    png.decode_png(bytes(r.bytes)),
                    (r.merc_xmin, r.merc_ymin, r.merc_xmax, r.merc_ymax),
                )
            )
        elif fmt == "webp":
            # lossless export via the engine's own VP8L encoder
            from tilegrab_spark.kernels import png, webp

            p = out / f"{i}_mosaic.webp"
            p.write_bytes(webp.encode_webp(png.decode_png(bytes(r.bytes))))
        elif fmt == "webp_lossy":
            # lossy export via the VP8 intra encoder (qindex 8 keeps
            # coding loss under the 40dB gate relative to the 4:2:0
            # subsampling ceiling — VP8 is inherently 4:2:0, so absolute
            # PSNR on chroma-dense content is bounded by the format)
            from tilegrab_spark.kernels import png, vp8

            p = out / f"{i}_mosaic.webp"
            p.write_bytes(vp8.encode_webp_vp8(png.decode_png(bytes(r.bytes)), qindex=8))
        elif fmt == "jpg":
            # lossy export (exporter.py:37-45 jpg branch): transcode the
            # canvas through the baseline JPEG encoder at quality 90
            # (clears the 40dB PSNR gate on bench content)
            from tilegrab_spark.kernels import jpeg, png

            p = out / f"{i}_mosaic.jpg"
            p.write_bytes(jpeg.encode_jpeg(png.decode_png(bytes(r.bytes)), quality=90))
        else:
            p = out / f"{i}_mosaic.png"
            p.write_bytes(bytes(r.bytes))
        written.append(p)
        if georeference:
            # world file (.pgw): pixel size + top-left center, EPSG:3857
            px = (r.merc_xmax - r.merc_xmin) / r.w
            py = (r.merc_ymax - r.merc_ymin) / r.h
            wf = out / f"{i}_mosaic.pgw"
            wf.write_text(
                f"{px}\n0.0\n0.0\n{-py}\n{r.merc_xmin + px / 2}\n{r.merc_ymax - py / 2}\n"
            )
            meta = out / f"{i}_mosaic.geo.json"
            meta.write_text(
                json.dumps(
                    {
                        "crs": "EPSG:3857",
                        "bounds": [r.merc_xmin, r.merc_ymin, r.merc_xmax, r.merc_ymax],
                        "width": r.w,
                        "height": r.h,
                        "transform_from_bounds": [
                            r.merc_xmin, r.merc_ymin, r.merc_xmax, r.merc_ymax, r.w, r.h,
                        ],
                    }
                )
            )
            written += [wf, meta]
    return written


def export_tiles(joined: DataFrame, out_dir: str | Path) -> int:
    """Per-tile save: ``{z}_{x}_{y}.png`` (TileImage.save naming,
    images/image.py:54-56). Returns count written."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    for r in joined.select("z", "x", "y", "bytes", "fmt").toLocalIterator():
        if r.bytes is None:
            continue
        (out / f"{r.z}_{r.x}_{r.y}.{r.fmt}").write_bytes(bytes(r.bytes))
        n += 1
    return n


def export_pmtiles(
    joined: DataFrame,
    path: str | Path,
    *,
    tile_type: str = "png",
    metadata: dict | None = None,
    bounds_e7: tuple | None = None,
) -> int:
    """Single-file PMTiles v3 archive sink (the range-read-servable
    sibling of the COG sink; ``kernels/pmtiles.py``).

    Scale shape: the Hilbert tile id is computed JVM/Arrow-side
    (vectorized ``tileids_np`` in a pandas UDF) and the CLUSTERED
    layout the format requires comes from one distributed
    ``orderBy(tile_id)`` — executors do the sort, the driver only
    streams already-ordered rows through :class:`PMTilesWriter`
    (payloads spool to disk; driver memory is O(directory entries)).
    PMTiles is by design one file, so the final byte-assembly is
    driver-serial — for planet-scale layers shard the layer first
    (e.g. per region / zoom range) and emit one archive per shard.
    Returns the number of tiles written."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from tilegrab_spark.kernels.pmtiles import PMTilesWriter, tileids_np

    def _tid_fn(z, x, y):
        return pd.Series(tileids_np(z.to_numpy(), x.to_numpy(), y.to_numpy()))

    _tid = pandas_udf(_tid_fn, "long")

    rows = (
        joined.select("z", "x", "y", "bytes")
        .where(F.col("bytes").isNotNull())
        .withColumn("tile_id", _tid("z", "x", "y"))
        # a tile may arrive more than once (e.g. it intersects two
        # input geometries); the format requires strictly ascending
        # ids, so keep one payload per tile — max() for determinism
        .groupBy("tile_id", "z", "x", "y")
        .agg(F.max("bytes").alias("bytes"))
        .orderBy("tile_id")
    )
    w = PMTilesWriter(
        tile_type=tile_type, metadata=metadata, bounds_e7=bounds_e7
    )
    n = 0
    for r in rows.toLocalIterator():
        w.add(r.z, r.x, r.y, bytes(r.bytes), tid=r.tile_id)
        n += 1
    if n == 0:
        raise ValueError("no tiles to export")
    w.finalize(str(path))
    return n
