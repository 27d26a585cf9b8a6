"""Isochrones — travel-cost band polygons from a cost surface.

The classic reachability product (OSRM/Valhalla `isochrone`, ArcGIS
Service Areas, GRASS `r.cost` + `r.to.vect`): given a friction raster
and source cells, the band-``i`` isochrone is the region of pixels
whose accumulated least cost is in ``(thresholds[i-1],
thresholds[i]]`` — nested rings around the sources.

Pure composition of machinery this engine already trusts, no new
distributed pattern:

1. :func:`cost_distance` (min-plus wavefront rounds; its module doc)
   produces the per-tile float64 accumulated-cost rasters;
2. :func:`cost_bands` classifies each raster into uint8 band labels
   (``searchsorted`` — band i means cost <= thresholds[i], strictly
   above thresholds[i-1]; label 0 = beyond the last threshold or
   unreachable) and re-encodes them as image-table label tiles — one
   bounded Arrow map, no shuffle;
3. :func:`polygonize` (distributed marching of same-label regions)
   vectorizes the bands into closed integer-pixel rings, which
   ``polygons_geojson`` / ``polygons_to_mvt`` already export.

``isochrones`` chains 1-3; ``cost_bands`` is exposed separately so a
cost surface computed once can be banded at many threshold sets
without re-running the wavefront (the expensive part).

Scale shape: step 2 is map-side over tiles; everything else inherits
the audited plans of cost_distance and polygonize. Label budget: at
most 254 thresholds (bands live in uint8 with 0 reserved).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from tilegrab_spark.operators.costdistance import cost_distance
from tilegrab_spark.operators.polygonize import polygonize

__all__ = ["cost_bands", "isochrones"]

_BAND_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType(), False),
        T.StructField("x", T.LongType(), False),
        T.StructField("y", T.LongType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
    ]
)


def cost_bands(
    cost: DataFrame,
    thresholds: Sequence[float],
    *,
    drop_empty: bool = True,
) -> DataFrame:
    """Classify a :func:`cost_distance` output into band-label tiles in
    the image-table shape ``(z, x, y, bytes, w, h, fmt)`` that the
    whole categorical-raster suite (polygonize / sieve / majority /
    zonal_from_labels) consumes.

    Pixel label = ``1 + i`` for the smallest i with ``dist <=
    thresholds[i]`` (bands are left-open/right-closed, the GRASS
    convention); 0 = beyond the last threshold, unreachable, or an
    uncovered/non-ok tile pixel. ``drop_empty`` skips tiles whose
    every pixel is label 0 (far tiles produce no rings anyway;
    dropping them keeps polygonize's input proportional to the
    reached area, not the coverage)."""
    thr = [float(t) for t in thresholds]
    if not thr:
        raise ValueError("thresholds must be non-empty")
    if any(t <= 0 or not np.isfinite(t) for t in thr):
        raise ValueError(f"thresholds must be positive and finite, got {thresholds!r}")
    if any(thr[i] >= thr[i + 1] for i in range(len(thr) - 1)):
        raise ValueError(f"thresholds must be strictly ascending, got {thresholds!r}")
    if len(thr) > 254:
        raise ValueError(f"at most 254 thresholds (uint8 labels), got {len(thr)}")
    tarr = np.asarray(thr, dtype=np.float64)
    drop = bool(drop_empty)

    def classify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tilegrab_spark.kernels.png import encode_png

        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                if row.status != "ok" or row.dist is None:
                    continue
                w, h = int(row.w), int(row.h)
                d = np.frombuffer(bytes(row.dist), dtype="<f8").reshape(h, w)
                band = np.searchsorted(tarr, d, side="left").astype(np.int64)
                lab = np.where(band < tarr.shape[0], band + 1, 0).astype(np.uint8)
                lab[~np.isfinite(d)] = 0
                if drop and not lab.any():
                    continue
                rgb = np.repeat(lab[:, :, None], 3, axis=2)
                recs.append(
                    {
                        "z": int(row.z), "x": int(row.x), "y": int(row.y),
                        "bytes": encode_png(rgb, filter_type=0),
                        "w": w, "h": h, "fmt": "png",
                    }
                )
            yield pd.DataFrame(
                recs, columns=[f.name for f in _BAND_SCHEMA.fields]
            )

    return cost.mapInPandas(classify, schema=_BAND_SCHEMA)


def isochrones(
    images: DataFrame,
    sources: DataFrame,
    thresholds: Sequence[float],
    *,
    zoom: int,
    band="max",
    tile_px: int = 256,
    max_rounds: int = 256,
) -> DataFrame:
    """Isochrone band polygons: :func:`cost_distance` over ``images``
    + ``sources`` → :func:`cost_bands` at ``thresholds`` →
    :func:`polygonize`. Returns the polygonize ring rows (label = band
    index + 1; ``threshold = thresholds[label-1]`` added as a column)
    for every reached band region — feed to ``polygons_geojson`` /
    ``polygons_to_mvt`` unchanged.

    Inherits polygonize's tracked-persist contract: call
    ``operators.dedup.release_signature_caches()`` after collecting."""
    cost = cost_distance(
        images, sources, zoom=zoom, band=band, tile_px=tile_px, max_rounds=max_rounds
    )
    labels = cost_bands(cost, thresholds)
    rings = polygonize(labels, zoom=zoom)
    thr_arr = F.array(*[F.lit(float(t)) for t in thresholds])
    return rings.where(F.col("label") > 0).withColumn(
        "threshold", F.element_at(thr_arr, F.col("label").cast("int"))
    )
