"""Rasterize vector geometries into label tiles — gdal_rasterize,
Spark-first, closing the raster<->vector loop with polygonize.

Burning polygons into a tiled raster has the same interior/boundary
economics as zonal stats (zonal.py): a tile fully inside a polygon is a
CONSTANT fill (no per-pixel geometry — O(1) decisions for the O(area)
interior), and only the O(perimeter) boundary tiles pay the per-pixel
center-in-polygon mask (even-odd ray cast, the GDAL all-touched=False
convention, identical to the zonal masking rule so rasterize->zonal
roundtrips are exact). The plan:

1. candidate tiles per geometry come from the engine's own bbox
   enumeration (F1 generate-as-predicate — never a world scan);
2. ``classify_tiles`` (one Arrow pass against the broadcast ring set)
   routes every (tile, geometry) pair to outside / boundary / interior;
3. ONE groupBy((z, x, y)) composes overlapping geometries per tile —
   higher label wins per pixel (the deterministic painter's rule,
   order-independent) — and encodes the label plane as a standard
   image-table row, so the output feeds polygonize / majority / sieve /
   zonal_from_labels / MVT directly.

Labels are uint8 (1..255; 0 = background), the categorical-raster
contract of the rest of the suite (labels = max channel).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from tilegrab_spark.kernels import png as pngk
from tilegrab_spark.operators.tiles import enumerate_tiles
from tilegrab_spark.operators.zonal import _mask_for_tile, classify_tiles
from tilegrab_spark.sources.geometries import GeometrySet

__all__ = ["rasterize_geometries"]

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("z", T.IntegerType(), False),
        T.StructField("x", T.LongType(), False),
        T.StructField("y", T.LongType(), False),
        T.StructField("n_burned", T.LongType(), False),
    ]
)


def rasterize_geometries(
    spark: SparkSession,
    geoms: list[GeometrySet] | GeometrySet,
    *,
    zoom: int,
    labels: dict | None = None,
    tile_px: int = 256,
    fmt: str = "png",
) -> DataFrame:
    """Image-table rows covering every tile a geometry touches at
    ``zoom``: ``[image_id, bytes, w, h, fmt, z, x, y, n_burned]`` with
    the label plane in all three channels (gray). ``labels`` maps
    geom_id -> 1..255 (default: enumeration order starting at 1);
    overlaps resolve to the HIGHER label per pixel. Tiles no geometry
    touches are not emitted (the background is implicit — readers of
    sparse categorical coverage treat absent tiles as label 0, the same
    convention polygonize's coverage-edge rule uses)."""
    if isinstance(geoms, GeometrySet):
        geoms = [geoms]
    if not geoms:
        raise ValueError("geoms must be non-empty")
    if fmt not in ("png", "raw"):
        raise ValueError(f"fmt must be 'png' or 'raw', got {fmt!r}")
    if labels is None:
        labels = {g.geom_id: i + 1 for i, g in enumerate(geoms)}
    for gid, v in labels.items():
        if not 1 <= int(v) <= 255:
            raise ValueError(f"label for {gid!r} must be in [1, 255], got {v}")
    z, tp = int(zoom), int(tile_px)

    cand = None
    for g in geoms:
        t = enumerate_tiles(spark, g, z)
        cand = t if cand is None else cand.unionByName(t)
    classed = classify_tiles(cand, geoms).filter(F.col("zone_class") > 0)

    payload = {
        g.geom_id: (
            int(labels[g.geom_id]),
            [[np.asarray(r, np.float64) for r in poly] for poly in g.polygons],
        )
        for g in geoms
    }
    bc = spark.sparkContext.broadcast(payload)

    grouped = classed.groupBy("z", "x", "y").agg(
        F.collect_list(F.struct("geom_id", "zone_class")).alias("hits")
    )

    def burn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = list(_OUT_SCHEMA.fieldNames())
        for pdf in batches:
            recs = []
            for t in pdf.itertuples(index=False):
                zz, xx, yy = int(t.z), int(t.x), int(t.y)
                canvas = np.zeros((tp, tp), dtype=np.uint8)
                for hit in t.hits:
                    lab, polys = bc.value[hit["geom_id"]]
                    if int(hit["zone_class"]) == 2:
                        np.maximum(canvas, np.uint8(lab), out=canvas)
                        continue
                    m = np.zeros((tp, tp), dtype=bool)
                    for poly in polys:
                        rings = []
                        for rg in poly:
                            if not (rg[0] == rg[-1]).all():
                                rg = np.vstack([rg, rg[:1]])
                            rings.append(rg)
                        m ^= _mask_for_tile(xx, yy, zz, tp, tp, rings)
                    canvas[m] = np.maximum(canvas[m], np.uint8(lab))
                n_burned = int((canvas > 0).sum())
                if n_burned == 0:
                    continue  # boundary tile whose pixel centers all miss
                arr = np.stack([canvas, canvas, canvas], axis=2)
                data = pngk.encode_png(arr) if fmt == "png" else arr.tobytes()
                recs.append({
                    "image_id": f"{zz}_{xx}_{yy}", "bytes": data,
                    "w": tp, "h": tp, "fmt": fmt, "z": zz, "x": xx, "y": yy,
                    "n_burned": n_burned,
                })
            yield pd.DataFrame(
                {n: pd.Series([r[n] for r in recs], dtype=object) for n in names}
            )

    return grouped.mapInPandas(burn, schema=_OUT_SCHEMA)
