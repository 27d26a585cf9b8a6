"""Within-distance spatial join: all (left, right) point pairs within
``d`` meters, great-circle exact.

The blocked shape every distributed engine uses (and the reference's
PIL/requests downloader has no analogue for): key BOTH sides by their
XYZ cell at a zoom where the tile size ≈ d, explode the LEFT side over
the neighbor disk that provably covers a d-radius ball, equi-join on the
cell key, refine with the exact haversine predicate. Candidates per left
row ≈ (2r+1)² cells with r ∈ {1, 2} at the auto-picked zoom, so the one
exchange carries O(|L| + |R|) rows — never a cross product.

Exactness (the disk-radius bound): a right point within ground distance
d of left point ℓ at latitude φ has |Δφ| ≤ d/R, so its latitude is
inside φ* = min(|φ| + d/R, MERCATOR_LAT_LIMIT). Web-Mercator is
conformal with local scale sec(lat) ≤ sec(φ*) along the whole geodesic,
hence both Mercator displacement components are ≤ d·sec(φ*). With tile
side ts (Mercator meters) the cell-index delta is ≤ ceil(d·sec(φ*)/ts)
(+1 guard for edge placement within the cell) — computed PER ROW from
the row's own latitude, so equatorial rows pay r=1 while polar rows pay
the sec-inflated disk only for themselves.

Deduplication is structural: each right row lives in exactly ONE cell
and each left row explodes each disk cell once, so a qualifying pair is
emitted exactly once (the self-join variant keeps ``id_a < id_b``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from tilegrab_spark.functions.cells import cell_encode_cols
from tilegrab_spark.kernels.geo import MERCATOR_LAT_LIMIT, WEB_MERCATOR_EXTENT, WGS84_RADIUS
from tilegrab_spark.operators.trajectory import haversine_m

__all__ = [
    "auto_block_zoom",
    "adaptive_disk_radius",
    "within_distance_join",
    "within_distance_pairs",
]


def adaptive_disk_radius(abs_lat, d_meters: float, tile_side: float):
    """Per-row latitude-adaptive neighbor-disk radius in CELLS (module
    doc): ``ceil(d·sec(φ*)/ts) + 1`` with ``φ* = min(|φ| + d/R, lat
    limit)`` — the never-loss bound shared by ``within_distance_join``
    and the trajectory blocking (operators/tracksim.py); both MUST use
    this one definition or a tightening here would silently break the
    other's candidate completeness. ``abs_lat`` is the row's |latitude|
    column (for aggregated cells, the max |lat| of the cell's rows —
    the conservative choice)."""
    from tilegrab_spark.operators.trajectory import _EARTH_R

    phi_star = F.least(
        abs_lat + F.lit(math.degrees(d_meters / _EARTH_R)),
        F.lit(MERCATOR_LAT_LIMIT),
    )
    d_merc = d_meters * (WGS84_RADIUS / _EARTH_R)
    return (
        F.ceil(F.lit(d_merc / tile_side) / F.cos(F.radians(phi_star))).cast("int")
        + F.lit(1)
    )


def auto_block_zoom(d_meters: float) -> int:
    """Smallest zoom whose (equatorial) tile side is >= d — candidate
    disks are r=1..2 cells there; clamped to [0, 22]."""
    if d_meters <= 0:
        raise ValueError(f"d_meters must be positive, got {d_meters}")
    z = int(math.floor(math.log2(2.0 * WEB_MERCATOR_EXTENT / d_meters)))
    return max(0, min(22, z))


def _keyed(df: DataFrame, lon_col: str, lat_col: str, zoom: int, suffix: str) -> DataFrame:
    out = df.select([F.col(c).alias(c + suffix) for c in df.columns])
    cx, cy = cell_encode_cols(F.col(lon_col + suffix), F.col(lat_col + suffix), zoom)
    return out.withColumn("_cx" + suffix, cx.cast("long")).withColumn(
        "_cy" + suffix, cy.cast("long")
    )


def within_distance_join(
    left: DataFrame,
    right: DataFrame,
    d_meters: float,
    *,
    zoom: int | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """All (left, right) pairs with great-circle distance ≤ ``d_meters``.
    Output: left columns suffixed ``suffixes[0]``, right columns suffixed
    ``suffixes[1]``, plus exact ``dist_m``. Both inputs need lon/lat."""
    if d_meters <= 0:
        raise ValueError(f"d_meters must be positive, got {d_meters}")
    sl, sr = suffixes
    if sl == sr:
        raise ValueError(f"suffixes must differ, got {suffixes!r}")
    z = auto_block_zoom(d_meters) if zoom is None else int(zoom)
    if not 0 <= z <= 30:
        raise ValueError(f"zoom must be in [0, 30], got {z}")
    ts = 2.0 * WEB_MERCATOR_EXTENT / (1 << z)
    n_cells = 1 << z

    L = _keyed(left, lon_col, lat_col, z, sl)
    R = _keyed(right, lon_col, lat_col, z, sr)

    # per-row disk radius from the row's own latitude (see module doc).
    # the refine predicate measures ground distance on the IUGG mean
    # sphere (trajectory._EARTH_R) while the Mercator grid lives on the
    # WGS84 sphere — the ratio scales the disk bound, and Δφ uses the
    # SMALLER radius (the conservative direction for both)
    r = adaptive_disk_radius(F.abs(F.col(lat_col + sl)), d_meters, ts)
    disk = (
        L.withColumn("_r", r)
        .withColumn("_dx", F.explode(F.sequence(-F.col("_r"), F.col("_r"))))
        .withColumn("_dy", F.explode(F.sequence(-F.col("_r"), F.col("_r"))))
        # x wraps at the antimeridian (pmod) — haversine's sin²(Δλ/2)
        # is wrap-periodic, so cross-dateline pairs come out exact; y
        # clamps (Mercator has no pole wrap)
        .withColumn("_cx", F.pmod(F.col("_cx" + sl) + F.col("_dx"), F.lit(n_cells)))
        .withColumn("_cy", F.col("_cy" + sl) + F.col("_dy"))
        .filter((F.col("_cy") >= 0) & (F.col("_cy") < n_cells))
        .drop("_r", "_dx", "_dy", "_cx" + sl, "_cy" + sl)
    )
    dist = haversine_m(
        F.col(lon_col + sl), F.col(lat_col + sl),
        F.col(lon_col + sr), F.col(lat_col + sr),
    )
    return (
        disk.join(
            R,
            (F.col("_cx") == F.col("_cx" + sr)) & (F.col("_cy") == F.col("_cy" + sr)),
            "inner",
        )
        .withColumn("dist_m", dist)
        .filter(F.col("dist_m") <= F.lit(float(d_meters)))
        .drop("_cx", "_cy", "_cx" + sr, "_cy" + sr)
    )


def within_distance_pairs(
    df: DataFrame,
    d_meters: float,
    *,
    id_col: str = "id",
    zoom: int | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Unordered self-join pairs within ``d_meters``, each emitted once
    (``id_a < id_b``), with exact ``dist_m``."""
    out = within_distance_join(
        df, df, d_meters, zoom=zoom, lon_col=lon_col, lat_col=lat_col,
        suffixes=("_a", "_b"),
    )
    return out.filter(F.col(id_col + "_a") < F.col(id_col + "_b"))
