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

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from tilegrab_spark.kernels import png as pngk
from tilegrab_spark.operators.tiles import enumerate_tiles
from tilegrab_spark.operators.zonal import _mask_for_tile, classify_tiles
from tilegrab_spark.sources.geometries import GeometrySet

__all__ = ["rasterize_geometries", "rasterize_lines"]

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


_LINE_SCHEMA = _OUT_SCHEMA


def rasterize_lines(
    lines: DataFrame,
    *,
    zoom: int,
    width_px: float = 1.0,
    label: int = 1,
    tile_px: int = 256,
    fmt: str = "png",
    line_id: str = "line_id",
    coords_col: str = "coords",
    max_tiles_per_segment: int = 65536,
) -> DataFrame:
    """Burn polylines into label tiles — the line half of
    gdal_rasterize. A pixel burns when its CENTER lies within
    ``width_px / 2`` GLOBAL PIXELS of any segment (the buffered-line
    rule; width 1 approximates a thin Bresenham stroke, larger widths
    draw roads at display width). ``lines`` is the snap.py shape
    (line_id, coords: array of [lon, lat]).

    Plan: segments map to the tiles their padded bbox touches via two
    bounded sequence explodes (output-sized — a segment registers in
    O(length/tile) tiles, and a guard raises past
    ``max_tiles_per_segment`` instead of exploding a continent-length
    segment); ONE groupBy((z, x, y)) evaluates the exact point-to-
    segment distance over the tile's pixel-center grid, vectorized per
    segment, and composes with max. Output rows are image-table shaped
    and compose with rasterize_geometries via a plain unionByName +
    majority/polygonize downstream."""
    if not 0 <= zoom <= 22:
        raise ValueError(f"zoom must be in [0, 22], got {zoom}")
    if width_px <= 0:
        raise ValueError(f"width_px must be positive, got {width_px}")
    if not 1 <= int(label) <= 255:
        raise ValueError(f"label must be in [1, 255], got {label}")
    if fmt not in ("png", "raw"):
        raise ValueError(f"fmt must be 'png' or 'raw', got {fmt!r}")
    z, tp = int(zoom), int(tile_px)
    n_px = float((1 << z) * tp)
    half = float(width_px) / 2.0

    # lon/lat -> global pixel coords (the P1 mapping, pure Catalyst)
    def gpx(lon):
        return (lon / F.lit(360.0) + F.lit(0.5)) * F.lit(n_px)

    def gpy(lat):
        lr = F.radians(lat)
        merc = F.log(F.tan(F.lit(math.pi / 4.0) + lr / F.lit(2.0)))
        return (F.lit(0.5) - merc / F.lit(2.0 * math.pi)) * F.lit(n_px)

    n = F.size(F.col(coords_col))
    segs = F.zip_with(
        F.slice(F.col(coords_col), 1, n - 1),
        F.slice(F.col(coords_col), 2, n - 1),
        lambda a, b: F.struct(
            a[0].alias("alon"), a[1].alias("alat"),
            b[0].alias("blon"), b[1].alias("blat"),
        ),
    )
    seg = (
        lines.select(F.col(line_id), F.posexplode(segs).alias("seg_idx", "_s"))
        .select(
            line_id, "seg_idx",
            gpx(F.col("_s.alon")).alias("ax"), gpy(F.col("_s.alat")).alias("ay"),
            gpx(F.col("_s.blon")).alias("bx"), gpy(F.col("_s.blat")).alias("by"),
        )
    )
    pad = F.lit(half + 1.0)
    tx_lo = F.floor((F.least("ax", "bx") - pad) / tp).cast("long")
    tx_hi = F.floor((F.greatest("ax", "bx") + pad) / tp).cast("long")
    ty_lo = F.floor((F.least("ay", "by") - pad) / tp).cast("long")
    ty_hi = F.floor((F.greatest("ay", "by") + pad) / tp).cast("long")
    n_tiles = (tx_hi - tx_lo + 1) * (ty_hi - ty_lo + 1)
    guard = F.when(
        n_tiles > max_tiles_per_segment,
        F.raise_error(F.format_string(
            "segment registers in %s tiles (> max_tiles_per_segment); "
            "split degenerate continent-length segments upstream",
            n_tiles,
        )),
    ).otherwise(F.lit(True))
    lim = (1 << z) - 1
    exploded = (
        seg.filter(guard)  # filter keeps the guard in the plan (an
        # unused projected column would be pruned away with it)
        .withColumn("tx", F.explode(F.sequence(F.greatest(tx_lo, F.lit(0)),
                                               F.least(tx_hi, F.lit(lim)))))
        .withColumn("ty", F.explode(F.sequence(F.greatest(ty_lo, F.lit(0)),
                                               F.least(ty_hi, F.lit(lim)))))
        .select("tx", "ty", "ax", "ay", "bx", "by")
    )
    grouped = exploded.groupBy("tx", "ty").agg(
        F.collect_list(F.struct("ax", "ay", "bx", "by")).alias("segs")
    )
    lab = int(label)

    def burn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = list(_LINE_SCHEMA.fieldNames())
        for pdf in batches:
            recs = []
            for t in pdf.itertuples(index=False):
                tx, ty = int(t.tx), int(t.ty)
                # pixel-center grid in global pixel coords
                cx = tx * tp + np.arange(tp) + 0.5
                cy = ty * tp + np.arange(tp) + 0.5
                m = np.zeros((tp, tp), dtype=bool)
                for s in t.segs:
                    ax, ay = float(s["ax"]), float(s["ay"])
                    bx, by = float(s["bx"]), float(s["by"])
                    dx, dy = bx - ax, by - ay
                    L2 = dx * dx + dy * dy
                    px_ = cx[None, :] - ax
                    py_ = cy[:, None] - ay
                    if L2 == 0.0:
                        d2 = px_ ** 2 + py_ ** 2
                    else:
                        tt = np.clip((px_ * dx + py_ * dy) / L2, 0.0, 1.0)
                        d2 = (px_ - tt * dx) ** 2 + (py_ - tt * dy) ** 2
                    m |= d2 <= half * half
                n_burned = int(m.sum())
                if n_burned == 0:
                    continue
                canvas = np.where(m, np.uint8(lab), np.uint8(0))
                arr = np.stack([canvas, canvas, canvas], axis=2)
                data = pngk.encode_png(arr) if fmt == "png" else arr.tobytes()
                recs.append({
                    "image_id": f"{z}_{tx}_{ty}", "bytes": data,
                    "w": tp, "h": tp, "fmt": fmt, "z": z, "x": tx, "y": ty,
                    "n_burned": n_burned,
                })
            yield pd.DataFrame(
                {n_: pd.Series([r[n_] for r in recs], dtype=object) for n_ in names}
            )

    return grouped.mapInPandas(burn, schema=_LINE_SCHEMA)
