"""Snap points to polylines — the map-matching primitive.

"Attach each GPS fix / detection to the nearest road / track / boundary
within r meters" is the first stage of every map-matching and
linear-referencing pipeline. The naive form is a point × segment
cross join; this one is blocked exactly like grid_dbscan:

1. polylines explode to SEGMENTS (pure Catalyst: zip consecutive
   vertices, posexplode), long segments SUBDIVIDE into ``radius_m``-
   length chunks (a second bounded sequence explode — min-over-chunks
   distance equals the full-segment distance exactly because the
   chunks partition the segment), and each chunk registers in the ≤9
   grid cells its padded bbox touches. Registration cost is
   O(segment length / radius) — the supercover shape, NOT O(bbox
   area), so a 3 km diagonal road at a 50 m radius emits ~60 chunk
   rows, not ~3600 bbox cells. An in-expression guard raises on
   degenerate continent-length segments;
2. points land in exactly ONE cell each — candidates come from a
   single equi-join on the cell key (cost O(points × chunks per
   cell), never all-pairs); registering the PADDED chunk bbox instead
   of 9-cell-probing the points keeps the probe side (the 10^12-row
   point lake) explode-free;
3. the exact point→segment distance is PURE CATALYST scalar
   arithmetic (clamped projection onto the segment) — whole-stage
   codegen, no Python anywhere in this operator;
4. the nearest candidate per point is one ``min_by`` aggregation with
   a deterministic (d², line_id, seg_idx) tie-break.

Everything is EPSG:3857 planar meters (the engine's contract —
kernels/geo.py): distances stretch by 1/cos(lat) away from the
equator, same caveat as grid_dbscan's eps. Inputs must lie in the
Mercator band (|lat| <= 85.051129).

Output per matched point: ``line_id``, ``seg_idx`` (0-based segment in
the polyline), ``dist_m`` (planar Mercator meters), ``snap_lon`` /
``snap_lat`` (the closest point on the segment, back-projected), and
``seg_t`` (position along the segment in [0,1] — the linear-referencing
measure). ``how='left'`` keeps unmatched points with NULLs; ``'inner'``
drops them.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from tilegrab_spark.kernels.geo import WGS84_RADIUS

__all__ = ["candidate_segments", "explode_segments", "snap_points_to_lines"]


def _merc_x(lon):
    return F.lit(WGS84_RADIUS) * F.radians(lon.cast("double"))


def _merc_y(lat):
    return F.lit(WGS84_RADIUS) * F.log(
        F.tan(F.lit(math.pi / 4.0) + F.radians(lat.cast("double")) / F.lit(2.0))
    )


def explode_segments(
    lines: DataFrame,
    *,
    line_id: str = "line_id",
    coords_col: str = "coords",
) -> DataFrame:
    """Polylines (``coords``: array of [lon, lat]) -> one row per
    segment: ``[<line_id>, seg_idx, ax, ay, bx, by]`` in Mercator
    meters. Pure Catalyst (zip_with over shifted slices + posexplode)."""
    n = F.size(F.col(coords_col))
    segs = F.zip_with(
        F.slice(F.col(coords_col), 1, n - 1),
        F.slice(F.col(coords_col), 2, n - 1),
        lambda a, b: F.struct(
            a[0].alias("alon"), a[1].alias("alat"),
            b[0].alias("blon"), b[1].alias("blat"),
        ),
    )
    out = lines.select(
        F.col(line_id), F.posexplode(segs).alias("seg_idx", "_s")
    )
    return out.select(
        line_id,
        "seg_idx",
        _merc_x(F.col("_s.alon")).alias("ax"),
        _merc_y(F.col("_s.alat")).alias("ay"),
        _merc_x(F.col("_s.blon")).alias("bx"),
        _merc_y(F.col("_s.blat")).alias("by"),
    )


def snap_points_to_lines(
    points: DataFrame,
    lines: DataFrame,
    *,
    radius_m: float,
    point_id: str = "point_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    line_id: str = "line_id",
    coords_col: str = "coords",
    how: str = "left",
    max_chunks_per_segment: int = 65536,
) -> DataFrame:
    """Nearest polyline segment within ``radius_m`` Mercator meters for
    each point (see module docstring for semantics and output columns).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    pts, cand = candidate_segments(
        points, lines, radius_m=radius_m, point_id=point_id,
        lon_col=lon_col, lat_col=lat_col, line_id=line_id,
        coords_col=coords_col, max_chunks_per_segment=max_chunks_per_segment,
    )
    best = cand.groupBy("_pid").agg(
        F.min(
            F.struct(
                F.col("_d2"), F.col(line_id), F.col("seg_idx"),
                F.col("_t"), F.col("_sx"), F.col("_sy"),
            )
        ).alias("_b")
    ).select(
        F.col("_pid"),
        F.col(f"_b.{line_id}").alias(line_id),
        F.col("_b.seg_idx").alias("seg_idx"),
        F.sqrt("_b._d2").alias("dist_m"),
        F.col("_b._t").alias("seg_t"),
        # back-project the snapped Mercator point to lon/lat
        F.degrees(F.col("_b._sx") / F.lit(WGS84_RADIUS)).alias("snap_lon"),
        F.degrees(
            F.lit(2.0) * F.atan(F.exp(F.col("_b._sy") / F.lit(WGS84_RADIUS)))
            - F.lit(math.pi / 2.0)
        ).alias("snap_lat"),
    )
    out = pts.drop("_px", "_py", "_cx", "_cy").join(
        best.withColumnRenamed("_pid", point_id), point_id, how
    )
    return out


def candidate_segments(
    points: DataFrame,
    lines: DataFrame,
    *,
    radius_m: float,
    point_id: str = "point_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    line_id: str = "line_id",
    coords_col: str = "coords",
    max_chunks_per_segment: int = 65536,
) -> tuple[DataFrame, DataFrame]:
    """The shared blocking + exact-distance stage: returns ``(pts,
    cand)`` where ``pts`` is the point frame with Mercator/cell columns
    attached and ``cand`` holds one row per (point, chunk) candidate
    within ``radius_m`` — columns ``_pid``, ``line_id``, ``seg_idx``,
    ``_t``, ``_sx``, ``_sy``, ``_d2``.  ``snap_points_to_lines``
    reduces it to the global nearest; ``operators/matching.py`` keeps
    the per-line bests as HMM emission candidates."""
    if radius_m <= 0:
        raise ValueError(f"radius_m must be positive, got {radius_m}")
    cell = float(radius_m)

    segs = explode_segments(lines, line_id=line_id, coords_col=coords_col)
    # subdivide each segment into ~cell-length chunks; a chunk's padded
    # bbox then touches at most 9 cells regardless of segment length
    sdx = F.col("bx") - F.col("ax")
    sdy = F.col("by") - F.col("ay")
    seg_len = F.sqrt(sdx * sdx + sdy * sdy)
    k = F.greatest(F.lit(1).cast("long"), F.ceil(seg_len / F.lit(cell)))
    guard_k = F.when(
        k > F.lit(int(max_chunks_per_segment)),
        F.raise_error(
            F.format_string(
                "snap_points_to_lines: a segment subdivides into %s "
                f"chunks at radius {cell}m (> max_chunks_per_segment="
                f"{int(max_chunks_per_segment)}); split degenerate "
                "segments or raise the radius",
                k,
            )
        ).cast("long"),
    ).otherwise(k)
    chunks = segs.withColumn("_k", guard_k).select(
        line_id, "seg_idx", "ax", "ay", "bx", "by", "_k",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("_k") - 1)).alias("_j"),
    )
    jf = F.col("_j").cast("double") / F.col("_k").cast("double")
    jf1 = (F.col("_j") + 1).cast("double") / F.col("_k").cast("double")
    chunks = chunks.withColumns(
        {
            "_c0x": F.col("ax") + jf * sdx,
            "_c0y": F.col("ay") + jf * sdy,
            "_c1x": F.col("ax") + jf1 * sdx,
            "_c1y": F.col("ay") + jf1 * sdy,
        }
    )
    # register each chunk in the <=9 cells its radius-padded bbox touches
    cx0 = F.floor((F.least("_c0x", "_c1x") - F.lit(cell)) / F.lit(cell))
    cx1 = F.floor((F.greatest("_c0x", "_c1x") + F.lit(cell)) / F.lit(cell))
    cy0 = F.floor((F.least("_c0y", "_c1y") - F.lit(cell)) / F.lit(cell))
    cy1 = F.floor((F.greatest("_c0y", "_c1y") + F.lit(cell)) / F.lit(cell))
    seg_cells = (
        chunks.withColumns({"_cx0": cx0, "_cx1": cx1, "_cy0": cy0, "_cy1": cy1})
        .select(
            line_id, "seg_idx", "ax", "ay", "bx", "by",
            "_c0x", "_c0y", "_c1x", "_c1y", "_j", "_k",
            F.explode(F.sequence("_cx0", "_cx1")).alias("_cx"),
            F.col("_cy0"), F.col("_cy1"),
        )
        .select(
            line_id, "seg_idx", "ax", "ay", "bx", "by",
            "_c0x", "_c0y", "_c1x", "_c1y", "_j", "_k", "_cx",
            F.explode(F.sequence("_cy0", "_cy1")).alias("_cy"),
        )
    )

    px = _merc_x(F.col(lon_col))
    py = _merc_y(F.col(lat_col))
    pts = points.withColumns(
        {
            "_px": px,
            "_py": py,
            "_cx": F.floor(px / F.lit(cell)),
            "_cy": F.floor(py / F.lit(cell)),
        }
    )
    probe = pts.select(
        F.col(point_id).alias("_pid"), "_px", "_py", "_cx", "_cy"
    )

    # exact point->chunk distance, all scalar Catalyst arithmetic; the
    # chunk-local parameter maps back to the FULL segment as
    # t = (j + t_local) / k, and min-over-chunks distance equals the
    # full-segment distance because the chunks partition the segment
    dx = F.col("_c1x") - F.col("_c0x")
    dy = F.col("_c1y") - F.col("_c0y")
    seg_len2 = dx * dx + dy * dy
    t_raw = (
        (F.col("_px") - F.col("_c0x")) * dx + (F.col("_py") - F.col("_c0y")) * dy
    ) / seg_len2
    tl = F.when(seg_len2 <= 0, F.lit(0.0)).otherwise(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), t_raw))
    )
    t = (F.col("_j").cast("double") + tl) / F.col("_k").cast("double")
    sx = F.col("_c0x") + tl * dx
    sy = F.col("_c0y") + tl * dy
    ddx = F.col("_px") - sx
    ddy = F.col("_py") - sy
    d2 = ddx * ddx + ddy * ddy

    cand = (
        probe.join(seg_cells, ["_cx", "_cy"])
        .withColumns({"_t": t, "_sx": sx, "_sy": sy, "_d2": d2})
        .filter(F.col("_d2") <= F.lit(cell * cell))
        .select("_pid", line_id, "seg_idx", "_t", "_sx", "_sy", "_d2")
    )
    return pts, cand
