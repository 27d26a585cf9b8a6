"""Trajectory analytics over (track, ts, lon, lat) fix streams.

GPS/telemetry fixes are the point-lake sibling of the event table the
engine already sessionizes (operators/sessions.py); these operators
answer the standard track questions relationally:

- ``with_legs`` / ``track_stats`` — consecutive-fix legs (haversine
  ground distance, time delta, speed) via ONE ``lag`` window per
  track, then a per-track rollup. Pure Catalyst: the haversine is
  sin/cos/atan2 column math, so the whole pass stays in whole-stage
  codegen; the only shuffle is the window partition on the track key.
- ``stay_points`` — the classic stay-point detection (the
  Li/Zheng/Xie/Ma 2008 formulation used everywhere): a maximal run of
  consecutive fixes that stays within ``radius_m`` of the run's FIRST
  fix for at least ``min_duration_s`` collapses to one stay point
  (centroid, dwell interval). The scan is inherently sequential per
  track, so it runs as one Arrow grouped map per track — bounded by a
  single track's fixes, the same per-group bound every operator here
  accepts (mosaic groups, contour components).

Scale shape: one shuffle on the track key for either operator; leg
math never leaves the JVM; the stay-point kernel receives (ts, lon,
lat) scalars only. Skewed track lengths (one vehicle logging for
years) are the usual axis — split upstream with ``sessionize`` (gap
splitting) when a track must be bounded.

Determinism: ties in ``ts`` are ordered by (ts, lon, lat) so repeated
runs and repartitionings agree; verified against scalar oracles in
tests/test_trajectory.py.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F, types as T

__all__ = ["haversine_m", "with_legs", "track_stats", "stay_points", "od_matrix"]

_EARTH_R = 6371008.8  # mean earth radius, meters (IUGG)


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters between two lon/lat points —
    pure Catalyst (sin/cos/asin/sqrt), mean-earth-radius sphere."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = p2 - p1
    dlmb = F.radians(lon2) - F.radians(lon1)
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(p1) * F.cos(p2) * F.sin(dlmb / 2) * F.sin(dlmb / 2)
    )
    # clamp a<=1 against float overshoot; F.least would swallow NULL
    # inputs (least/greatest skip NULLs) and return pi*R instead of NULL
    a_c = F.when(a > 1.0, F.lit(1.0)).otherwise(a)
    return F.lit(2.0 * _EARTH_R) * F.asin(F.sqrt(a_c))


def _order_cols(ts_col: str, lon_col: str, lat_col: str):
    return [F.col(ts_col), F.col(lon_col), F.col(lat_col)]


def with_legs(
    fixes: DataFrame,
    *,
    track_cols: Sequence[str] = ("track_id",),
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Input rows + the leg FROM the previous fix of the same track:
    ``leg_m`` (haversine meters), ``leg_s`` (seconds), ``speed_mps``
    (NULL on each track's first fix and on zero-duration legs)."""
    w = Window.partitionBy(*track_cols).orderBy(*_order_cols(ts_col, lon_col, lat_col))
    plon = F.lag(lon_col).over(w)
    plat = F.lag(lat_col).over(w)
    pts = F.lag(ts_col).over(w)
    leg_m = haversine_m(plon, plat, F.col(lon_col), F.col(lat_col))
    leg_s = F.col(ts_col).cast("double") - pts.cast("double")
    return (
        fixes.withColumn("leg_m", leg_m)
        .withColumn("leg_s", leg_s)
        .withColumn(
            "speed_mps",
            F.when(F.col("leg_s") > 0, F.col("leg_m") / F.col("leg_s")),
        )
    )


def track_stats(
    fixes: DataFrame,
    *,
    track_cols: Sequence[str] = ("track_id",),
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Per-track rollup: ``[track cols..., n_fixes, total_m,
    duration_s, avg_speed_mps, max_speed_mps, min_lon, min_lat,
    max_lon, max_lat]``. ``avg_speed_mps`` is total distance over
    total duration (not the mean of leg speeds), NULL for
    zero-duration tracks."""
    legs = with_legs(
        fixes, track_cols=track_cols, ts_col=ts_col, lon_col=lon_col, lat_col=lat_col
    )
    dur = F.max(F.col(ts_col).cast("double")) - F.min(F.col(ts_col).cast("double"))
    total = F.coalesce(F.sum("leg_m"), F.lit(0.0))
    return legs.groupBy(*track_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_fixes"),
        total.alias("total_m"),
        dur.alias("duration_s"),
        F.when(dur > 0, total / dur).alias("avg_speed_mps"),
        F.max("speed_mps").alias("max_speed_mps"),
        F.min(lon_col).alias("min_lon"),
        F.min(lat_col).alias("min_lat"),
        F.max(lon_col).alias("max_lon"),
        F.max(lat_col).alias("max_lat"),
    )


def stay_points(
    fixes: DataFrame,
    *,
    radius_m: float,
    min_duration_s: float,
    track_cols: Sequence[str] = ("track_id",),
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Stay points per track: ``[track cols..., stay_idx, n_fixes,
    lon, lat, ts_in, ts_out, dwell_s]`` — a maximal run of consecutive
    fixes all within ``radius_m`` (haversine) of the run's FIRST fix,
    dwelling at least ``min_duration_s``; (lon, lat) is the run
    centroid. Greedy left-to-right, the standard formulation — one
    deterministic sequential scan per track inside an Arrow grouped
    map (grouped work bounded by one track's fixes)."""
    if radius_m <= 0 or min_duration_s < 0:
        raise ValueError("radius_m must be > 0 and min_duration_s >= 0")
    tks = list(track_cols)
    key_fields = [fixes.schema[c] for c in tks]
    out_schema = T.StructType(
        key_fields
        + [
            T.StructField("stay_idx", T.IntegerType(), False),
            T.StructField("n_fixes", T.IntegerType(), False),
            T.StructField("lon", T.DoubleType(), False),
            T.StructField("lat", T.DoubleType(), False),
            T.StructField("ts_in", T.DoubleType(), False),
            T.StructField("ts_out", T.DoubleType(), False),
            T.StructField("dwell_s", T.DoubleType(), False),
        ]
    )
    r = float(radius_m)
    dmin = float(min_duration_s)

    def _hav(lon0, lat0, lons, lats):
        p1, p2 = np.radians(lat0), np.radians(lats)
        a = (
            np.sin((p2 - p1) / 2) ** 2
            + np.cos(p1) * np.cos(p2) * np.sin((np.radians(lons) - np.radians(lon0)) / 2) ** 2
        )
        return 2.0 * _EARTH_R * np.arcsin(np.sqrt(np.minimum(1.0, a)))

    def scan(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf.sort_values([ts_col, lon_col, lat_col], kind="mergesort")
        ts = p[ts_col].astype("float64").to_numpy()
        lons = p[lon_col].to_numpy()
        lats = p[lat_col].to_numpy()
        n = ts.shape[0]
        rows = []
        i = 0
        while i < n:
            d = _hav(lons[i], lats[i], lons[i:], lats[i:])
            out = np.nonzero(d > r)[0]
            j_end = (i + out[0]) if out.size else n  # first fix OUTSIDE the run
            if ts[j_end - 1] - ts[i] >= dmin and j_end - i >= 2:
                rows.append(
                    (
                        len(rows),
                        int(j_end - i),
                        float(lons[i:j_end].mean()),
                        float(lats[i:j_end].mean()),
                        float(ts[i]),
                        float(ts[j_end - 1]),
                        float(ts[j_end - 1] - ts[i]),
                    )
                )
                i = j_end
            else:
                i += 1
        cols = {c: [key[k]] * len(rows) for k, c in enumerate(tks)}
        for k, name in enumerate(
            ("stay_idx", "n_fixes", "lon", "lat", "ts_in", "ts_out", "dwell_s")
        ):
            cols[name] = [row[k] for row in rows]
        return pd.DataFrame(cols, columns=tks + ["stay_idx", "n_fixes", "lon", "lat", "ts_in", "ts_out", "dwell_s"])

    src = fixes.select(*tks, F.col(ts_col).cast("double").alias(ts_col), lon_col, lat_col)
    return src.groupBy(*tks).applyInPandas(scan, out_schema)


def od_matrix(
    fixes: DataFrame,
    zoom: int,
    *,
    track_cols: Sequence[str] = ("track_id",),
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Origin-destination flow matrix at tile-cell resolution: each
    track contributes one (origin cell, destination cell) trip — origin
    = the track's FIRST fix, destination = its LAST (by (ts, lon, lat),
    the module's deterministic order) — rolled up to ``[o_x, o_y, d_x,
    d_y, n_trips, avg_duration_s]`` at ``zoom``.

    The flow-aggregation primitive behind every mobility matrix
    (transport planning, tile-demand forecasting). Two exchanges, both
    keyed and output-bounded: one ``min_by``/``max_by`` per-track agg
    (map-side combinable — first/last fixes combine associatively), one
    OD-pair rollup over the (much smaller) trip table. Pure Catalyst;
    the cell encode is functions/cells.py codegen.
    """
    if not 0 <= int(zoom) <= 29:
        raise ValueError(f"zoom must be in [0, 29], got {zoom}")
    from tilegrab_spark.functions.cells import cell_encode_cols

    ordk = F.struct(
        F.col(ts_col).alias("_t"), F.col(lon_col).alias("_lo"), F.col(lat_col).alias("_la")
    )
    pt = F.struct(F.col(lon_col).alias("lon"), F.col(lat_col).alias("lat"))
    trips = fixes.groupBy(*track_cols).agg(
        F.min_by(pt, ordk).alias("_o"),
        F.max_by(pt, ordk).alias("_d"),
        (F.max(F.col(ts_col).cast("double")) - F.min(F.col(ts_col).cast("double"))).alias(
            "_dur"
        ),
    )
    ox, oy = cell_encode_cols(F.col("_o.lon"), F.col("_o.lat"), int(zoom))
    dx, dy = cell_encode_cols(F.col("_d.lon"), F.col("_d.lat"), int(zoom))
    return (
        trips.select(
            ox.alias("o_x"), oy.alias("o_y"), dx.alias("d_x"), dy.alias("d_y"), "_dur"
        )
        .groupBy("o_x", "o_y", "d_x", "d_y")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trips"),
            F.avg("_dur").alias("avg_duration_s"),
        )
    )
