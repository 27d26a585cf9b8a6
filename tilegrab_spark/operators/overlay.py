"""Vector↔vector overlay: polygon spatial join, exact tile∩polygon
areas, and areal interpolation.

The engine's spatial joins so far pair TILES with geometries (F1/F2,
points.py). This module pairs two POLYGON LAKES — the vector-overlay
workloads (parcels↔zones, AOIs↔admin boundaries, footprints↔flood
extents) every spatial warehouse runs:

- ``spatial_join_polygons`` — which left polygons intersect / contain /
  lie within which right polygons;
- ``tile_polygon_areas`` — the exact EPSG:3857 area of polygon∩tile per
  covered tile (Sutherland–Hodgman against the convex tile box — exact,
  no sampling);
- ``areal_interpolate`` — transfer zone attributes onto the tile grid
  weighted by exact intersection area (the standard areal-interpolation
  estimator for re-aggregating statistics across incompatible zonings).

Polygon lake shape (DataFrame-native, no driver-side geometry): one row
per polygon — ``id_col`` (unique orderable key) + ``rings_col``:
``array<array<array<double>>>`` = [outer, hole, ...], each ring a list
of [lon, lat] in EPSG:4326 (closed or open). MultiPolygons explode to
one row per part.

Scale shape (the grid_dbscan / LSH discipline — never all-pairs):

1. per-polygon bbox is a pure-Catalyst reduction over the nested ring
   arrays (no UDF);
2. each polygon explodes to the XYZ tiles covering its bbox at
   ``zoom`` (the engine's P1 encode — cells_encode_cols, bit-identical
   to the kernel) — candidate generation is an EQUI-join on packed
   integer cell keys, cost O(n x neighbors-per-cell);
3. each candidate pair is emitted EXACTLY ONCE with zero dedup shuffle:
   a pair sharing k cover cells is kept only in the cell holding the
   min-corner of the two bboxes' intersection — a deterministic
   per-row predicate both sides compute from the join row itself (the
   rangejoin.py ``greatest(lo, lo)`` trick in 2-D);
4. the exact refine (segment intersection + even-odd containment,
   kernels/clip.py + kernels/geo.py) runs Arrow-batched on the
   candidate rows only.

``zoom`` is the blocking knob: pick it so a typical polygon covers a
handful of cells (the in-expression ``max_cover_cells`` guard raises —
never silently truncates — when a polygon's bbox explodes past it;
raise ``zoom`` granularity or pre-split giant geometries). Dense-cell
skew is AQE skew-join shaped, same as grid_dbscan.

Area semantics: EPSG:3857 square meters — Web-Mercator inflates by
~1/cos^2(lat) away from the equator; AREA RATIOS at nearby latitudes
(the areal-interpolation weights) are unaffected to first order, which
is the estimator's use case. Inputs must lie inside the Mercator band
(|lat| <= 85.051129).

Boundary semantics: ``intersects`` is closed-set (touching counts);
``contains``/``within`` require the inner polygon strictly inside
(boundary contact fails — the conservative reading; see
``_refine_pair``). Exactly the rules the tests' independent scalar
oracle pins (tests/test_overlay.py).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from tilegrab_spark.functions.cells import cell_encode_cols
from tilegrab_spark.kernels.clip import (
    polygon_area,
    polygon_box_area,
    segments_intersect_any,
    _ring_segments,
)
from tilegrab_spark.kernels.geo import (
    WEB_MERCATOR_EXTENT,
    WGS84_RADIUS,
    _point_in_rings,
)

__all__ = [
    "with_polygon_bbox",
    "spatial_join_polygons",
    "tile_polygon_areas",
    "areal_interpolate",
]

_PREDICATES = ("intersects", "contains", "within")


def with_polygon_bbox(df: DataFrame, *, rings_col: str = "rings") -> DataFrame:
    """Add ``_minx/_miny/_maxx/_maxy`` (lon/lat degrees) — a pure
    Catalyst reduction over the nested ring arrays (flatten + transform
    + array_min/max), no Python."""
    flat = F.flatten(F.col(rings_col))
    xs = F.transform(flat, lambda p: p[0])
    ys = F.transform(flat, lambda p: p[1])
    return df.withColumns(
        {
            "_minx": F.array_min(xs),
            "_miny": F.array_min(ys),
            "_maxx": F.array_max(xs),
            "_maxy": F.array_max(ys),
        }
    )


def _cover_cols(zoom: int):
    """Tile-range columns of the row's bbox at ``zoom`` (x0<=x1, y0<=y1;
    y0 comes from MAX lat — XYZ y grows southward)."""
    tx0, ty0 = cell_encode_cols(F.col("_minx"), F.col("_maxy"), zoom)
    tx1, ty1 = cell_encode_cols(F.col("_maxx"), F.col("_miny"), zoom)
    return tx0, ty0, tx1, ty1


def _explode_cover(
    df: DataFrame,
    *,
    zoom: int,
    max_cover_cells: int,
    keep: Sequence[str],
    tag: str,
) -> DataFrame:
    """Explode each polygon row to its bbox-cover cells at ``zoom``.
    Emits ``keep`` columns renamed with ``tag`` prefix plus
    ``_cx/_cy`` cell keys and the row's ``{tag}tx0/{tag}ty0`` range
    starts (the exactly-once dedup anchor)."""
    tx0, ty0, tx1, ty1 = _cover_cols(zoom)
    base = df.withColumns(
        {"_tx0": tx0, "_ty0": ty0, "_tx1": tx1, "_ty1": ty1}
    )
    n_cells = (F.col("_tx1") - F.col("_tx0") + 1) * (
        F.col("_ty1") - F.col("_ty0") + 1
    )
    # guard lives inside the consumed sequence bound so pruning can't
    # drop it (cover.py idiom): raise, never silently truncate
    guarded_tx1 = (
        F.when(
            n_cells > F.lit(int(max_cover_cells)),
            F.raise_error(
                F.format_string(
                    "spatial overlay: polygon bbox covers %s cells at "
                    f"zoom {zoom} (> max_cover_cells={int(max_cover_cells)}); "
                    "raise zoom or pre-split the geometry",
                    n_cells,
                )
            ).cast("long"),
        )
        .otherwise(F.col("_tx1"))
    )
    cols = [F.col(c).alias(f"{tag}{c}") for c in keep]
    cols += [F.col(c).alias(f"{tag}{c}") for c in ("_minx", "_miny", "_maxx", "_maxy")]
    cols += [
        F.col("_tx0").alias(f"{tag}tx0"),
        F.col("_ty0").alias(f"{tag}ty0"),
        F.explode(F.sequence(F.col("_tx0"), guarded_tx1)).alias("_cx"),
    ]
    step1 = base.select(*cols, F.col("_ty0").alias("_y0"), F.col("_ty1").alias("_y1"))
    return step1.select(
        *[f"{tag}{c}" for c in keep],
        *[f"{tag}{c}" for c in ("_minx", "_miny", "_maxx", "_maxy")],
        f"{tag}tx0",
        f"{tag}ty0",
        "_cx",
        F.explode(F.sequence(F.col("_y0"), F.col("_y1"))).alias("_cy"),
    )


def _np_rings(rings) -> list:
    """Arrow nested list -> list of (N,2) float64 CLOSED ring arrays."""
    out = []
    for r in rings:
        arr = np.asarray([[p[0], p[1]] for p in r], dtype=np.float64)
        if arr.shape[0] >= 2 and not (arr[0] == arr[-1]).all():
            arr = np.vstack([arr, arr[:1]])
        out.append(arr)
    return out


def _all_vertices(rings: list) -> np.ndarray:
    return np.vstack([r[:-1] for r in rings if r.shape[0] >= 2])


def _all_segments(rings: list) -> np.ndarray:
    segs = [_ring_segments(r) for r in rings]
    segs = [s for s in segs if s.shape[0] > 0]
    return np.concatenate(segs, axis=0) if segs else np.empty((0, 4))


def _prepare(raw) -> tuple:
    """Parse a raw ring payload once per (batch, geometry): closed ring
    arrays + stacked vertices + stacked segments."""
    rings = _np_rings(raw)
    return rings, _all_vertices(rings), _all_segments(rings)


def _refine_pair(a, b, predicate: str) -> bool:
    """Exact predicate over two prepared polygons (see :func:`_prepare`).

    intersects (closed set): any A vertex covered by B, any B vertex
    covered by A, or any boundary segments intersecting (touch counts).
    contains (A ⊃ B, strict): every B vertex covered by A, no boundary
    contact at all, and no A vertex covered by B (the hole-of-A-inside-B
    detector). within = contains with sides swapped.
    """
    a_rings, av, a_segs = a
    b_rings, bv, b_segs = b
    a_in_b = _point_in_rings(av[:, 0], av[:, 1], b_rings)
    b_in_a = _point_in_rings(bv[:, 0], bv[:, 1], a_rings)
    if predicate == "intersects":
        if a_in_b.any() or b_in_a.any():
            return True
        return segments_intersect_any(a_segs, b_segs)
    if predicate == "within":
        a_in_b, b_in_a = b_in_a, a_in_b
    # contains: A ⊃ B
    if not b_in_a.all() or a_in_b.any():
        return False
    return not segments_intersect_any(a_segs, b_segs)


def spatial_join_polygons(
    left: DataFrame,
    right: DataFrame,
    *,
    zoom: int,
    predicate: str = "intersects",
    left_id: str = "geom_id",
    right_id: str = "geom_id",
    left_rings: str = "rings",
    right_rings: str = "rings",
    max_cover_cells: int = 4096,
) -> DataFrame:
    """Join two polygon lakes on a spatial predicate. Returns the
    matching id pairs ``[left_id_out, right_id_out]`` (caller joins
    payloads back by key — pairs shuffle light, payloads once).

    Output column names: ``<left_id>_l`` and ``<right_id>_r`` (always
    suffixed, so self-joins are well-formed)."""
    if predicate not in _PREDICATES:
        raise ValueError(f"predicate must be one of {_PREDICATES}, got {predicate!r}")
    if not 0 <= int(zoom) <= 30:
        raise ValueError(f"zoom must be in [0, 30], got {zoom}")
    lc = _explode_cover(
        with_polygon_bbox(left, rings_col=left_rings),
        zoom=zoom,
        max_cover_cells=max_cover_cells,
        keep=[left_id, left_rings],
        tag="_l_",
    )
    rc = _explode_cover(
        with_polygon_bbox(right, rings_col=right_rings),
        zoom=zoom,
        max_cover_cells=max_cover_cells,
        keep=[right_id, right_rings],
        tag="_r_",
    )
    pred = predicate

    @F.pandas_udf("boolean")
    def refine(
        lid: pd.Series, rid: pd.Series, lr: pd.Series, rr: pd.Series
    ) -> pd.Series:
        out = np.zeros(len(lr), dtype=bool)
        memo_l: dict = {}
        memo_r: dict = {}

        def prep_of(memo, key, raw):
            got = memo.get(key)
            if got is None:
                got = memo[key] = _prepare(raw)
            return got

        for i, (ka, kb, a, b) in enumerate(zip(lid, rid, lr, rr)):
            out[i] = _refine_pair(
                prep_of(memo_l, ka, a), prep_of(memo_r, kb, b), pred
            )
        return pd.Series(out, index=lr.index)

    # pure-Catalyst filter stage ahead of the Arrow refine (the classic
    # filter-refine discipline): sharing a cover cell is necessary but
    # tile-granular — exact bbox overlap prunes the refine input for
    # free, and containment predicates additionally require the inner
    # bbox inside the outer one
    bbox_filter = (
        (F.col("_l__minx") <= F.col("_r__maxx"))
        & (F.col("_r__minx") <= F.col("_l__maxx"))
        & (F.col("_l__miny") <= F.col("_r__maxy"))
        & (F.col("_r__miny") <= F.col("_l__maxy"))
    )
    if predicate == "contains":
        bbox_filter = (
            (F.col("_r__minx") >= F.col("_l__minx"))
            & (F.col("_r__maxx") <= F.col("_l__maxx"))
            & (F.col("_r__miny") >= F.col("_l__miny"))
            & (F.col("_r__maxy") <= F.col("_l__maxy"))
        )
    elif predicate == "within":
        bbox_filter = (
            (F.col("_l__minx") >= F.col("_r__minx"))
            & (F.col("_l__maxx") <= F.col("_r__maxx"))
            & (F.col("_l__miny") >= F.col("_r__miny"))
            & (F.col("_l__maxy") <= F.col("_r__maxy"))
        )
    pairs = (
        lc.join(rc, ["_cx", "_cy"])
        # exactly-once: keep the pair only in the min-corner cell of the
        # two covers' intersection (that cell is in both covers, and the
        # predicate below is a pure function of the pair)
        .filter(
            (F.col("_cx") == F.greatest("_l_tx0", "_r_tx0"))
            & (F.col("_cy") == F.greatest("_l_ty0", "_r_ty0"))
        )
        .filter(bbox_filter)
        .filter(
            refine(
                F.col(f"_l_{left_id}"),
                F.col(f"_r_{right_id}"),
                F.col(f"_l_{left_rings}"),
                F.col(f"_r_{right_rings}"),
            )
        )
        .select(
            F.col(f"_l_{left_id}").alias(f"{left_id}_l"),
            F.col(f"_r_{right_id}").alias(f"{right_id}_r"),
        )
    )
    return pairs


def _merc_xy(pts: np.ndarray) -> np.ndarray:
    """EPSG:4326 (N,2) lon/lat -> EPSG:3857 meters, the engine's forward
    projection (kernels/geo.py contract)."""
    out = np.empty_like(pts)
    out[:, 0] = WGS84_RADIUS * np.radians(pts[:, 0])
    lat = np.radians(pts[:, 1])
    out[:, 1] = WGS84_RADIUS * np.log(np.tan(0.25 * math.pi + 0.5 * lat))
    return out


def tile_polygon_areas(
    polys: DataFrame,
    *,
    zoom: int,
    id_col: str = "geom_id",
    rings_col: str = "rings",
    max_cover_cells: int = 4096,
) -> DataFrame:
    """Exact EPSG:3857 intersection area of each polygon with each XYZ
    tile it touches at ``zoom``: ``[<id_col>, z, x, y, area_m2]``
    (area_m2 > 0 rows only).

    Per covered tile the polygon's rings project to Mercator and clip
    against the tile's meter box (Sutherland–Hodgman — exact for the
    convex box); outer area minus hole areas. One Arrow-batched
    projection over the cover-exploded rows — the shuffle is the cover
    explode's repartition only; no pair join at all."""
    if not 0 <= int(zoom) <= 30:
        raise ValueError(f"zoom must be in [0, 30], got {zoom}")
    cover = _explode_cover(
        with_polygon_bbox(polys, rings_col=rings_col),
        zoom=zoom,
        max_cover_cells=max_cover_cells,
        keep=[id_col, rings_col],
        tag="_g_",
    )
    ext = WEB_MERCATOR_EXTENT
    ts = 2.0 * ext / float(1 << int(zoom))

    @F.pandas_udf("double")
    def tile_area(rings: pd.Series, cx: pd.Series, cy: pd.Series) -> pd.Series:
        xs = cx.to_numpy(np.int64)
        ys = cy.to_numpy(np.int64)
        out = np.zeros(len(rings), dtype=np.float64)
        for i, r in enumerate(rings):
            merc = [_merc_xy(np.asarray([[p[0], p[1]] for p in ring], dtype=np.float64))
                    for ring in r]
            bx0 = -ext + xs[i] * ts
            by1 = ext - ys[i] * ts
            out[i] = polygon_box_area(merc, bx0, by1 - ts, bx0 + ts, by1)
        return pd.Series(out, index=rings.index)

    return (
        cover.withColumn(
            "area_m2", tile_area(F.col(f"_g_{rings_col}"), F.col("_cx"), F.col("_cy"))
        )
        .filter(F.col("area_m2") > 0.0)
        .select(
            F.col(f"_g_{id_col}").alias(id_col),
            F.lit(int(zoom)).alias("z"),
            F.col("_cx").alias("x"),
            F.col("_cy").alias("y"),
            "area_m2",
        )
    )


def areal_interpolate(
    zones: DataFrame,
    *,
    zoom: int,
    value_cols: Sequence[str],
    id_col: str = "geom_id",
    rings_col: str = "rings",
    intensive: bool = False,
    max_cover_cells: int = 4096,
) -> DataFrame:
    """Re-aggregate zone attributes onto the tile grid by exact
    intersection-area weighting.

    extensive (default): each zone's value splits across its tiles
    proportional to area — tile value = Σ_z v_z · area(z∩t)/area(z);
    tile totals sum back to the zone totals (mass-preserving).
    ``intensive=True``: tile value = area-weighted mean of overlapping
    zones — Σ v_z·area(z∩t) / Σ area(z∩t) (rates/densities).

    Plan: one Arrow area projection (tile_polygon_areas), one tiny
    per-zone total (extensive only — a pure-Catalyst shoelace over the
    ring arrays would be possible but the Arrow kernel is already
    paid), one groupBy(tile). No joins beyond the broadcast-sized zone
    totals."""
    value_cols = list(value_cols)
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    areas = tile_polygon_areas(
        zones,
        zoom=zoom,
        id_col=id_col,
        rings_col=rings_col,
        max_cover_cells=max_cover_cells,
    )

    @F.pandas_udf("double")
    def total_area(rings: pd.Series) -> pd.Series:
        out = np.zeros(len(rings), dtype=np.float64)
        for i, r in enumerate(rings):
            merc = [_merc_xy(np.asarray([[p[0], p[1]] for p in ring], dtype=np.float64))
                    for ring in r]
            out[i] = polygon_area(merc)
        return pd.Series(out, index=rings.index)

    vals = zones.select(
        F.col(id_col),
        *[F.col(c).cast("double").alias(c) for c in value_cols],
        total_area(F.col(rings_col)).alias("_zone_area"),
    )
    joined = areas.join(F.broadcast(vals), id_col)
    if intensive:
        aggs = [
            (
                F.sum(F.col(c) * F.col("area_m2")) / F.sum("area_m2")
            ).alias(c)
            for c in value_cols
        ]
    else:
        w = F.col("area_m2") / F.col("_zone_area")
        aggs = [F.sum(F.col(c) * w).alias(c) for c in value_cols]
    return joined.groupBy("z", "x", "y").agg(*aggs)
