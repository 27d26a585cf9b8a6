"""Per-group convex hulls over point lakes — the footprint aggregate.

"Give me the convex footprint of each track / cluster / AOI's points"
is the classic reduction a geometry-less warehouse can't answer. The
naive Spark form (groupBy + collect every point into one task) dies on
any hot group. Convex hulls admit the Misra-Gries-style two-level
shape because hulling is idempotent over unions:

    hull(A ∪ B) = hull(hull(A) ∪ hull(B))

1. MAP SIDE (mapInPandas over the existing partitions, ZERO shuffle):
   per partition, per group, reduce that partition's points to their
   partial hull VERTICES — O(n log n) locally, output O(h) rows per
   (partition, group), h = hull size (typically tens even for millions
   of points: E[h] = O(log n) for uniform-ish clouds);
2. REDUCE SIDE: one groupBy(group) over the tiny vertex stream, final
   monotone chain per group.

The single exchange carries partial-hull vertices, never the points —
the same discipline as heavyhitters.py / focal.py.

Determinism: the hull vertex cycle is rotated to start at the
lexicographically smallest vertex and wound CCW; strictly-collinear
boundary points are excluded (the standard monotone-chain convention),
so the output is a pure function of the point SET — partition- and
order-invariant (oracle-tested).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = ["monotone_chain", "convex_hull"]


def monotone_chain(pts: np.ndarray) -> np.ndarray:
    """Convex hull of (N,2) float64 points — Andrew's monotone chain.
    Returns hull vertices CCW starting at the lexicographically smallest
    point, strictly-collinear points excluded. Degenerate inputs return
    what exists: 1 point -> that point, collinear set -> the 2 extreme
    points."""
    pts = np.unique(np.asarray(pts, dtype=np.float64), axis=0)  # lex-sorted
    n = pts.shape[0]
    if n <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = np.array(lower[:-1] + upper[:-1])
    if hull.shape[0] == 0:  # all collinear: keep the two extremes
        return pts[[0, -1]]
    # monotone chain already starts at the lex-min point (pts is sorted)
    return hull


def _hull_area_perimeter(hull: np.ndarray) -> tuple:
    if hull.shape[0] < 3:
        per = 0.0
        if hull.shape[0] == 2:
            per = 2.0 * float(np.hypot(*(hull[1] - hull[0])))
        return 0.0, per
    x, y = hull[:, 0], hull[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    area = 0.5 * float(np.sum(x * yn - xn * y))
    per = float(np.sum(np.hypot(xn - x, yn - y)))
    return abs(area), per


def convex_hull(
    points: DataFrame,
    *,
    group_col: str,
    x_col: str = "lon",
    y_col: str = "lat",
) -> DataFrame:
    """Per-group convex hull: ``[<group_col>, hull (array<array<double>>,
    CCW from the lex-min vertex), n_vertices, hull_area, hull_perimeter]``.

    Area/perimeter are in the squared/linear units of the input columns
    (degrees for lon/lat; project to Mercator first for meters). Groups
    with 1-2 distinct points return the degenerate hull with area 0.
    """
    gtype = points.schema[group_col].dataType
    part_schema = T.StructType(
        [
            T.StructField("g", gtype, True),
            T.StructField("px", T.DoubleType(), False),
            T.StructField("py", T.DoubleType(), False),
        ]
    )

    gc, xc, yc = group_col, x_col, y_col

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # accumulate per-group points across the partition's batches,
        # hull ONCE per partition (hull-of-hulls would also be correct;
        # one pass is simpler and the state is bounded by partial hulls
        # of seen batches)
        acc: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby(gc, dropna=False, sort=False):
                pts = sub[[xc, yc]].to_numpy(np.float64)
                prev = acc.get(g)
                merged = pts if prev is None else np.vstack([prev, pts])
                acc[g] = monotone_chain(merged)  # keep state O(h)
        for g, hull in acc.items():
            yield pd.DataFrame({"g": [g] * hull.shape[0],
                                "px": hull[:, 0], "py": hull[:, 1]})

    partials = points.select(
        F.col(group_col).alias(gc), F.col(x_col).cast("double").alias(xc),
        F.col(y_col).cast("double").alias(yc)
    ).mapInPandas(partial, part_schema)

    out_schema = T.StructType(
        [
            T.StructField(group_col, gtype, True),
            T.StructField(
                "hull", T.ArrayType(T.ArrayType(T.DoubleType(), False), False), False
            ),
            T.StructField("n_vertices", T.IntegerType(), False),
            T.StructField("hull_area", T.DoubleType(), False),
            T.StructField("hull_perimeter", T.DoubleType(), False),
        ]
    )

    def finalize(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        hull = monotone_chain(pdf[["px", "py"]].to_numpy(np.float64))
        area, per = _hull_area_perimeter(hull)
        return pd.DataFrame(
            {
                group_col: [key[0]],
                "hull": [hull.tolist()],
                "n_vertices": [int(hull.shape[0])],
                "hull_area": [area],
                "hull_perimeter": [per],
            }
        )

    return partials.groupBy("g").applyInPandas(finalize, out_schema)
