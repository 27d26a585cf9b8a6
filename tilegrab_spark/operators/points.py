"""Point-in-polygon tagging for point lakes — the point analogue of F2.

``refine_by_shape`` (operators/tiles.py) answers "which TILES touch the
geometry"; this answers "which polygon CONTAINS each point" — the
spatial tag/join every point lake needs (assign fixes to zones,
detections to AOIs). Same architecture as the tile refine, per the
north rule's "point-in-polygon (ray-casting) on prepared geometry
broadcast":

- the (small) geometry set broadcasts once per executor;
- a cheap numpy bbox prefilter skips ray-casting for far points;
- the exact test is the engine's even-odd ray-cast kernel
  (kernels/geo.py::_point_in_rings — holes handled naturally);
- everything runs inside ONE Arrow-vectorized pandas UDF projection —
  ZERO shuffle: at 10^12 points this is a map-side tag, and Catalyst
  pushes it wherever the points already are.

Match semantics: polygons are tested in the caller's geometry order
and the FIRST containing polygon wins (deterministic; overlapping
zones resolve by precedence). ``multi=True`` returns ALL containing
geom_ids as an array instead. ``how='left'`` keeps unmatched points
with a NULL tag; ``'inner'`` drops them (the semi-join shape).

Boundary rule: even-odd ray-casting — a point exactly on an edge may
tag either side (the same float-boundary caveat every PIP has);
points on hole boundaries follow the same rule.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from tilegrab_spark.kernels.geo import _point_in_rings
from tilegrab_spark.sources.geometries import GeometrySet

__all__ = ["points_in_polygons"]


def points_in_polygons(
    points: DataFrame,
    geoms: GeometrySet | Sequence[GeometrySet],
    *,
    lon_col: str = "lon",
    lat_col: str = "lat",
    how: str = "left",
    multi: bool = False,
    out_col: str = "geom_id",
) -> DataFrame:
    """Tag each point with the geometry containing it.

    Returns the input plus ``out_col``: the first containing
    GeometrySet's geom_id (string, NULL = outside all), or an array of
    every containing geom_id when ``multi=True`` (empty array =
    outside; ``how='inner'`` then keeps points with >= 1 match).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if isinstance(geoms, GeometrySet):
        geoms = [geoms]
    geoms = list(geoms)
    if not geoms:
        raise ValueError("geoms must be non-empty")
    spark = points.sparkSession
    payload = []
    for g in geoms:
        rings = [
            [np.asarray(r, dtype=np.float64).tolist() for r in poly]
            for poly in g.polygons
        ]
        payload.append((g.geom_id, g.bbox, rings))
    bc = spark.sparkContext.broadcast(payload)
    want_multi = bool(multi)

    ret_type = "array<string>" if want_multi else "string"

    @F.pandas_udf(ret_type)
    def tag(lon: pd.Series, lat: pd.Series) -> pd.Series:
        px = lon.to_numpy(np.float64)
        py = lat.to_numpy(np.float64)
        n = px.shape[0]
        if want_multi:
            acc: list = [[] for _ in range(n)]
        else:
            acc = [None] * n
        undecided = np.isfinite(px) & np.isfinite(py)
        for gid, (bx0, by0, bx1, by1), polys in bc.value:
            cand = undecided if want_multi else undecided & np.array(
                [a is None for a in acc], dtype=bool
            )
            cand = (
                cand & (px >= bx0) & (px <= bx1) & (py >= by0) & (py <= by1)
            )
            idx = np.nonzero(cand)[0]
            if idx.size == 0:
                continue
            hit = np.zeros(idx.shape, dtype=bool)
            for poly in polys:
                rings = []
                for r in poly:
                    arr = np.asarray(r, dtype=np.float64)
                    if not (arr[0] == arr[-1]).all():
                        arr = np.vstack([arr, arr[:1]])  # close open rings
                    rings.append(arr)
                hit |= _point_in_rings(px[idx], py[idx], rings)
                if hit.all():
                    break
            for k in idx[hit]:
                if want_multi:
                    acc[k].append(gid)
                else:
                    acc[k] = gid
        return pd.Series(acc, index=lon.index, dtype=object)

    out = points.withColumn(out_col, tag(F.col(lon_col), F.col(lat_col)))
    if how == "inner":
        cond = (
            F.size(out_col) > 0 if want_multi else F.col(out_col).isNotNull()
        )
        out = out.filter(cond)
    return out
