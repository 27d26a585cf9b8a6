"""Ordinary kriging — geostatistical surface interpolation tiles.

The classic companion to IDW (``render.interpolate_idw_tiles``): instead
of fixed ``1/d^p`` weights, kriging derives weights from the data's own
spatial covariance structure (the variogram), giving the best linear
unbiased predictor under the intrinsic-stationarity model — the
``gdal_grid``/``v.krige``/ArcGIS "Kriging" operation, Spark-first.
All formulas are the textbook public ones (Matheron 1963; Cressie,
*Statistics for Spatial Data*, 1993).

Three stages, each independently usable:

1. :func:`empirical_variogram` — the pair sweep, fully relational:
   points project to world-pixel coordinates (the engine's P1 Mercator
   math), block into ``max_lag_px``-sized cells, and pair ONLY within a
   cell and its forward half-plane neighbors (E, SE, S, SW) so each
   unordered pair is produced exactly once and no pair beyond the lag
   cutoff is ever materialized — the same bounded blocked-join
   discipline as grid_dbscan / the within-distance join, never
   all-pairs. Per-cell sampling (deterministic hash order, capped at
   ``max_points_per_cell``) bounds the quadratic in-block term, the
   standard estimator practice (a variogram needs unbiased pair
   coverage, not every pair). Output: ``[lag_px, gamma, n_pairs]``
   (Matheron estimator: gamma(h) = mean of squared diffs / 2 per lag
   bin), at most ``n_lags`` rows.
2. :func:`fit_variogram` — driver-side weighted least squares over
   those <= ``n_lags`` rows (tiny by construction): grid-search the
   range, closed-form solve nugget+partial-sill per candidate, weights
   = pair counts. Returns the ``(model, nugget, psill, range_px)``
   parameter dict that :func:`krige_tiles` consumes; models are the
   standard spherical / exponential / gaussian forms.
3. :func:`krige_tiles` — the interpolation itself, shaped exactly like
   the IDW painter: samples explode to the tiles whose ``radius_px``
   disc they touch (bounded Catalyst ``sequence`` explode), then one
   Arrow grouped map per tile solves ONE ordinary-kriging system for
   all pixels at once: the (n+1)x(n+1) augmented semivariance matrix
   (Lagrange row enforces sum(w)=1) is factorized once per tile and
   solved against a (n+1, tile_px^2) right-hand side — O(n^3 +
   n^2*px^2) vectorized numpy per tile, with n capped at
   ``max_samples`` nearest the tile center (deterministic order).
   Output rows are IMAGE_SCHEMA grayscale tiles on the explicit
   ``[vmin, vmax]`` scale (same nodata/black + byte-determinism
   contract as IDW, so export/mosaic/pyramid consume them unchanged).

Properties the tests pin: sum-to-one weights make a constant field
reproduce exactly; with ``nugget=0`` the predictor honors sample
values at sample pixel centers (exact interpolator); output bytes are
a pure function of the input rows (partitioning-independent).

Scale shape: the pair stage shuffles only (cell, capped points) and
aggregates map-side to <= n_lags rows; the paint stage is
embarrassingly parallel over touched tiles with per-tile memory
O(max_samples * tile_px^2 * 8) — the 100 TB knobs are radius/zoom
(fan-in) and max_samples (solve cost), both explicit.

The reference has no interpolation analogue; this extends the raster
suite alongside IDW per the round-4 geospatial-analytics brief.
"""

from __future__ import annotations

import math
from typing import Iterable, Mapping, Optional, Sequence, Tuple, Union

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from tilegrab_spark.sources.images import IMAGE_SCHEMA

__all__ = [
    "empirical_variogram",
    "fit_variogram",
    "variogram_gamma",
    "krige_tiles",
    "VARIOGRAM_MODELS",
]

VARIOGRAM_MODELS = ("spherical", "exponential", "gaussian")


def _world_px_cols(lon_col: str, lat_col: str, zoom: int, tile_px: int):
    """Fractional world-pixel coordinates (same P1 Mercator math and
    clamps as render.bin_points / interpolate_idw_tiles)."""
    n_px = float((1 << zoom) * tile_px)
    nx = F.col(lon_col).cast("double") / F.lit(360.0) + F.lit(0.5)
    sinlat = F.sin(F.radians(F.col(lat_col).cast("double")))
    ny = (
        F.lit(0.5)
        - F.lit(0.25)
        * F.log((F.lit(1.0) + sinlat) / (F.lit(1.0) - sinlat))
        / F.lit(math.pi)
    )
    fx = F.least(F.lit(n_px - 1e-9), F.greatest(F.lit(0.0), nx * F.lit(n_px)))
    fy = F.least(F.lit(n_px - 1e-9), F.greatest(F.lit(0.0), ny * F.lit(n_px)))
    return fx, fy


def empirical_variogram(
    points: DataFrame,
    *,
    zoom: int,
    value_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    n_lags: int = 12,
    max_lag_px: float = 128.0,
    tile_px: int = 256,
    max_points_per_cell: int = 64,
) -> DataFrame:
    """Matheron empirical semivariogram binned into ``n_lags`` equal
    distance classes up to ``max_lag_px`` world pixels:
    ``[lag_px, gamma, n_pairs]`` (lag_px = bin center), ordered by lag.

    Blocked exactly-once pairing: cells of side ``max_lag_px``; a point
    pairs with later points in its own cell (hash-rank order) and with
    every sampled point in its E / SE / S / SW neighbor cells — the
    half-plane trick, so the cross-cell join emits each unordered pair
    once without a global dedup. Cells are capped at
    ``max_points_per_cell`` points chosen in deterministic hash order
    (sampling thins pairs uniformly; the estimator stays unbiased).
    """
    if not (0 <= zoom <= 22):
        raise ValueError(f"zoom must be in [0, 22], got {zoom}")
    if n_lags < 1:
        raise ValueError(f"n_lags must be >= 1, got {n_lags}")
    if max_lag_px <= 0:
        raise ValueError(f"max_lag_px must be positive, got {max_lag_px}")
    if max_points_per_cell < 2:
        raise ValueError(
            f"max_points_per_cell must be >= 2, got {max_points_per_cell}"
        )
    fx, fy = _world_px_cols(lon_col, lat_col, zoom, tile_px)
    cell = float(max_lag_px)
    proj = points.select(
        fx.alias("fx"),
        fy.alias("fy"),
        F.col(value_col).cast("double").alias("v"),
    ).where(F.col("v").isNotNull())
    proj = proj.withColumn("cx", F.floor(F.col("fx") / cell).cast("long"))
    proj = proj.withColumn("cy", F.floor(F.col("fy") / cell).cast("long"))
    # deterministic per-cell thinning + a stable in-cell rank for the
    # same-cell half-pairing (hash of the full coordinate/value tuple —
    # stable across partitionings, independent of input order)
    hsh = F.xxhash64(F.col("fx"), F.col("fy"), F.col("v"))
    w = Window.partitionBy("cx", "cy").orderBy(hsh.asc(), F.col("fx").asc(), F.col("fy").asc())
    proj = (
        proj.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= int(max_points_per_cell))
    )
    a = proj.select(
        F.col("cx"), F.col("cy"), F.col("rnk"),
        F.col("fx").alias("fxa"), F.col("fy").alias("fya"),
        F.col("v").alias("va"),
    )
    b = proj.select(
        F.col("cx").alias("bcx"), F.col("cy").alias("bcy"),
        F.col("rnk").alias("brnk"),
        F.col("fx").alias("fxb"), F.col("fy").alias("fyb"),
        F.col("v").alias("vb"),
    )
    # same-cell (rank-ordered) + forward half-plane neighbors:
    # (dx, dy) in {(1,0), (1,1), (0,1), (-1,1)}. The neighbor probe is
    # an OFFSET EXPLODE on the a-side followed by one equi-join on the
    # shifted cell key — an OR-of-conjunctions join condition would
    # plan as a nested-loop join (quadratic); this stays a hash join
    same = a.join(
        b,
        (F.col("cx") == F.col("bcx"))
        & (F.col("cy") == F.col("bcy"))
        & (F.col("rnk") < F.col("brnk")),
    ).drop("bcx", "bcy")
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in ((1, 0), (1, 1), (0, 1), (-1, 1))
        ]
    )
    probe = (
        a.withColumn("_o", F.explode(offsets))
        .withColumn("_px", F.col("cx") + F.col("_o.dx"))
        .withColumn("_py", F.col("cy") + F.col("_o.dy"))
        .drop("_o")
    )
    half = probe.join(
        b,
        (F.col("_px") == F.col("bcx")) & (F.col("_py") == F.col("bcy")),
    ).drop("_px", "_py", "bcx", "bcy")
    pairs = same.unionByName(half, allowMissingColumns=True)
    d = F.sqrt(
        (F.col("fxa") - F.col("fxb")) * (F.col("fxa") - F.col("fxb"))
        + (F.col("fya") - F.col("fyb")) * (F.col("fya") - F.col("fyb"))
    )
    lag_w = float(max_lag_px) / int(n_lags)
    sq = (F.col("va") - F.col("vb")) * (F.col("va") - F.col("vb"))
    binned = (
        pairs.select(d.alias("d"), sq.alias("sq"))
        .where((F.col("d") > 0) & (F.col("d") <= float(max_lag_px)))
        .withColumn(
            "lag",
            F.least(
                F.lit(int(n_lags) - 1),
                F.floor(F.col("d") / F.lit(lag_w)).cast("int"),
            ),
        )
        .groupBy("lag")
        .agg(
            (F.avg("sq") / F.lit(2.0)).alias("gamma"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .select(
            ((F.col("lag") + F.lit(0.5)) * F.lit(lag_w)).alias("lag_px"),
            "gamma",
            "n_pairs",
        )
        .orderBy("lag_px")
    )
    return binned


def variogram_gamma(h: np.ndarray, params: Mapping) -> np.ndarray:
    """Model semivariance gamma(h) for the standard public forms.
    ``params``: mapping with model / nugget / psill / range_px.
    gamma(0) = 0 by convention (the nugget is a limit, not a value)."""
    model = params["model"]
    c0 = float(params["nugget"])
    c1 = float(params["psill"])
    a = float(params["range_px"])
    h = np.asarray(h, dtype=np.float64)
    if model == "spherical":
        r = np.clip(h / a, 0.0, 1.0)
        g = c0 + c1 * (1.5 * r - 0.5 * r**3)
    elif model == "exponential":
        g = c0 + c1 * (1.0 - np.exp(-3.0 * h / a))
    elif model == "gaussian":
        g = c0 + c1 * (1.0 - np.exp(-3.0 * (h / a) ** 2))
    else:
        raise ValueError(f"unknown variogram model {model!r}")
    return np.where(h <= 0.0, 0.0, g)


def fit_variogram(
    emp: Union[DataFrame, Sequence],
    *,
    model: str = "spherical",
    n_range_candidates: int = 64,
) -> dict:
    """Fit (nugget, psill, range_px) to an empirical variogram by
    pair-count-weighted least squares: closed-form solve of the two
    linear coefficients for each of ``n_range_candidates`` ranges on a
    uniform grid over (0, 2*max observed lag], keep the smallest SSE.
    ``emp`` is the :func:`empirical_variogram` output (DataFrame —
    collected here, it is <= n_lags rows — or any sequence of
    (lag_px, gamma, n_pairs) rows). Deterministic; no iterative
    optimizer. Returns ``{model, nugget, psill, range_px, sse}``."""
    if model not in VARIOGRAM_MODELS:
        raise ValueError(f"model must be one of {VARIOGRAM_MODELS}, got {model!r}")
    if isinstance(emp, DataFrame):
        rows = [(r[0], r[1], r[2]) for r in emp.collect()]
    else:
        rows = [(r[0], r[1], r[2]) for r in emp]
    rows = [r for r in rows if r[1] is not None and r[2] and r[2] > 0]
    if len(rows) < 2:
        raise ValueError(f"need >= 2 non-empty lag bins to fit, got {len(rows)}")
    h = np.array([r[0] for r in rows], dtype=np.float64)
    g = np.array([r[1] for r in rows], dtype=np.float64)
    wt = np.array([r[2] for r in rows], dtype=np.float64)
    hmax = float(h.max())
    best = None
    for a in np.linspace(hmax * 2.0 / n_range_candidates, hmax * 2.0, n_range_candidates):
        base = variogram_gamma(h, {"model": model, "nugget": 0.0, "psill": 1.0, "range_px": a})
        # weighted lsq for g ~ c0 + c1 * base, then clamp to >= 0 (a
        # negative nugget/sill is non-physical; re-solve the boundary)
        X = np.stack([np.ones_like(base), base], axis=1)
        W = wt[:, None]
        coef, *_ = np.linalg.lstsq(X * np.sqrt(W), g * np.sqrt(wt), rcond=None)
        c0, c1 = float(coef[0]), float(coef[1])
        if c0 < 0.0:
            c0 = 0.0
            c1 = float(np.sum(wt * base * g) / max(np.sum(wt * base * base), 1e-300))
        if c1 < 0.0:
            c1 = 0.0
            c0 = float(np.sum(wt * g) / np.sum(wt))
        resid = g - (c0 + c1 * base)
        sse = float(np.sum(wt * resid * resid))
        if best is None or sse < best[0] - 1e-15:
            best = (sse, c0, c1, float(a))
    sse, c0, c1, a = best
    return {"model": model, "nugget": c0, "psill": c1, "range_px": a, "sse": sse}


def krige_tiles(
    points: DataFrame,
    *,
    zoom: int,
    value_col: str,
    variogram: Mapping,
    vmin: float,
    vmax: float,
    radius_px: float = 64.0,
    max_samples: int = 64,
    lon_col: str = "lon",
    lat_col: str = "lat",
    tile_px: int = 256,
    src: int = 7,
    n_buckets: int = 16,
) -> DataFrame:
    """Ordinary-kriging surface tiles from scattered samples:
    IMAGE_SCHEMA grayscale rows on the explicit ``[vmin, vmax]`` scale
    (module docstring for the plan shape and the per-tile solve).

    ``variogram``: the :func:`fit_variogram` dict (or any mapping with
    model / nugget / psill / range_px). Pixels farther than
    ``radius_px`` from every sample are nodata (black), matching IDW's
    coverage rule; tiles with no sample in reach are absent.
    """
    if vmax <= vmin:
        raise ValueError(f"vmax must exceed vmin, got [{vmin}, {vmax}]")
    if radius_px <= 0:
        raise ValueError(f"radius_px must be positive, got {radius_px}")
    if max_samples < 1:
        raise ValueError(f"max_samples must be >= 1, got {max_samples}")
    if not (0 <= zoom <= 22):
        raise ValueError(f"zoom must be in [0, 22], got {zoom}")
    vg = {
        "model": variogram["model"],
        "nugget": float(variogram["nugget"]),
        "psill": float(variogram["psill"]),
        "range_px": float(variogram["range_px"]),
    }
    if vg["model"] not in VARIOGRAM_MODELS:
        raise ValueError(f"unknown variogram model {vg['model']!r}")
    if vg["range_px"] <= 0 or vg["psill"] < 0 or vg["nugget"] < 0:
        raise ValueError(f"non-physical variogram parameters {vg!r}")
    fx, fy = _world_px_cols(lon_col, lat_col, zoom, tile_px)
    tp = int(tile_px)
    r_px = float(radius_px)
    max_tile = (1 << zoom) - 1
    proj = points.select(
        fx.alias("_fx"), fy.alias("_fy"),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull())
    span = (
        proj.withColumn(
            "x",
            F.explode(
                F.sequence(
                    F.greatest(F.lit(0).cast("long"),
                               F.floor((F.col("_fx") - r_px) / tp).cast("long")),
                    F.least(F.lit(max_tile).cast("long"),
                            F.floor((F.col("_fx") + r_px) / tp).cast("long")),
                )
            ),
        )
        .withColumn(
            "y",
            F.explode(
                F.sequence(
                    F.greatest(F.lit(0).cast("long"),
                               F.floor((F.col("_fy") - r_px) / tp).cast("long")),
                    F.least(F.lit(max_tile).cast("long"),
                            F.floor((F.col("_fy") + r_px) / tp).cast("long")),
                )
            ),
        )
    )
    z = int(zoom)
    lo, hi = float(vmin), float(vmax)
    n_b = int(n_buckets)
    src_i = int(src)
    cap = int(max_samples)

    def paint(key, pdf):
        import pandas as pd

        from tilegrab_spark.kernels.png import encode_png, phash64

        x, y = int(key[0]), int(key[1])
        # deterministic neighborhood: nearest-to-tile-center first,
        # lexicographic tie-break, capped at max_samples
        cx0, cy0 = x * tp + tp / 2.0, y * tp + tp / 2.0
        pdf = pdf.assign(
            _dc=(pdf["_fx"] - cx0) ** 2 + (pdf["_fy"] - cy0) ** 2
        ).sort_values(["_dc", "_fx", "_fy", "_v"], kind="mergesort")
        # coincident sample locations make the system singular: average
        # them (the standard pre-processing for exact interpolators)
        pdf = (
            pdf.groupby(["_fx", "_fy"], as_index=False, sort=False)
            .agg(_v=("_v", "mean"), _dc=("_dc", "first"))
            .sort_values(["_dc", "_fx", "_fy"], kind="mergesort")
            .head(cap)
        )
        sx = pdf["_fx"].to_numpy() - x * tp
        sy = pdf["_fy"].to_numpy() - y * tp
        vals = pdf["_v"].to_numpy()
        n = sx.shape[0]
        # pixel centers
        gx = np.arange(tp) + 0.5
        gy = np.arange(tp) + 0.5
        px = np.broadcast_to(gx[None, :], (tp, tp))
        py = np.broadcast_to(gy[:, None], (tp, tp))
        # sample -> pixel distances, (n, tp*tp)
        dxp = sx[:, None] - px.ravel()[None, :]
        dyp = sy[:, None] - py.ravel()[None, :]
        dpix = np.sqrt(dxp * dxp + dyp * dyp)
        reach = (dpix <= r_px).any(axis=0)
        field = np.full(tp * tp, np.nan)
        if n > 0 and reach.any():
            # augmented ordinary-kriging system on semivariances
            dss = np.sqrt(
                (sx[:, None] - sx[None, :]) ** 2 + (sy[:, None] - sy[None, :]) ** 2
            )
            A = np.empty((n + 1, n + 1))
            A[:n, :n] = variogram_gamma(dss, vg)
            A[:n, n] = 1.0
            A[n, :n] = 1.0
            A[n, n] = 0.0
            B = np.empty((n + 1, int(reach.sum())))
            B[:n, :] = variogram_gamma(dpix[:, reach], vg)
            B[n, :] = 1.0
            try:
                Wgt = np.linalg.solve(A, B)
            except np.linalg.LinAlgError:
                Wgt, *_ = np.linalg.lstsq(A, B, rcond=None)
            field[reach] = vals @ Wgt[:n, :]
        field = field.reshape(tp, tp)
        idx = np.zeros((tp, tp), dtype=np.uint8)
        ok = ~np.isnan(field)
        idx[ok] = np.clip(
            np.round((field[ok] - lo) / (hi - lo) * 255.0), 0, 255
        ).astype(np.uint8)
        rgb = np.repeat(idx[:, :, None], 3, axis=2)
        data = encode_png(rgb, filter_type=2)
        cell = (z << 58) | (x << 29) | y
        cap_s = "krige z=%d model=%s c0=%s c1=%s a=%s r=%s range=[%s,%s] n=%d" % (
            z, vg["model"], repr(vg["nugget"]), repr(vg["psill"]),
            repr(vg["range_px"]), repr(r_px), repr(lo), repr(hi), n,
        )
        return pd.DataFrame(
            {
                "image_id": [f"{z}_{x}_{y}_{src_i}"],
                "bytes": [data],
                "w": [tp],
                "h": [tp],
                "fmt": ["png"],
                "caption": [cap_s],
                "phash": [phash64(rgb)],
                "zoom": [z],
                "bucket": [int(cell % n_b)],
            }
        )

    return span.groupBy("x", "y").applyInPandas(paint, IMAGE_SCHEMA)
