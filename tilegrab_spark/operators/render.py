"""Density tile rendering — turn a point lake into a heat-tile layer.

The reference CONSUMES tile layers; the inverse operation a tile
pipeline needs at scale is PRODUCING one: given billions of lon/lat
points (detections, fixes, events), render per-tile density images —
the standard heatmap tile layer — in the engine's own image-table
schema so every downstream stage (mosaic stitch, pyramid rollup,
PNG/GeoTIFF export, change detection) consumes the rendered layer
unchanged.

Two-stage plan, sized so pixels — not points — cross the Python
boundary:

1. **bin** (pure Catalyst): each point maps to a world pixel with the
   engine's P1 Mercator-encode formulas at ``zoom`` (same 1e-14
   epsilon-floor and edge clamps, functions/cells.py), split into
   (tile x, tile y, in-tile px, py) by integer div/mod; one
   ``groupBy(x, y, px, py).count()`` collapses arbitrarily many points
   into at most ``tile_px^2`` rows per tile MAP-SIDE — the shuffle
   after this is bounded by touched pixels, never by input rows.
2. **paint** (one Arrow grouped map per tile): scatter the counts into
   a ``tile_px x tile_px`` array, normalize (log1p by default — raw
   counts span orders of magnitude), color with a fixed piecewise-
   linear fire ramp (black -> deep red -> orange -> light yellow),
   PNG-encode (kernels/png.py) and emit an IMAGE_SCHEMA row
   (``image_id = "{z}_{x}_{y}_{src}"``, bucket = pmod(cell_id, N) —
   the bucketed-layout contract of sources/images.py).

Normalization: ``vmax=None`` scales each tile by its own max (self-
contained, no extra pass); pass an explicit ``vmax`` for a consistent
scale across tiles/epochs (the choice a real layer build makes —
derive it once from ``bin_points`` stats if needed). Determinism:
counts, ramp, and PNG bytes are pure functions of the input rows, so
re-runs re-ship byte-identical tiles (the same resume property the
export path has).

Scale shape: one map-side-combinable aggregation + one grouped map
whose groups are single tiles (bounded memory), then whatever sink the
caller picks. Empty tiles are simply absent — mosaic paints them
black, matching the reference's missing-tile semantics (SURVEY §8 Q10).
"""

from __future__ import annotations

import math
from typing import Iterable, Optional, Tuple

import numpy as np
from pyspark.sql import DataFrame, functions as F

from tilegrab_spark.sources.images import IMAGE_SCHEMA

__all__ = [
    "bin_points",
    "render_binned",
    "render_density_tiles",
    "interpolate_idw_tiles",
    "FIRE_RAMP",
]

_EPSILON = 1e-14  # reference: tiles/collection.py:13

# (position, (r, g, b)) stops of the default ramp — piecewise-linear,
# black at zero through deep red / orange to light yellow at max.
FIRE_RAMP: Tuple[Tuple[float, Tuple[int, int, int]], ...] = (
    (0.00, (0, 0, 0)),
    (0.35, (128, 0, 38)),
    (0.65, (227, 26, 28)),
    (0.85, (253, 141, 60)),
    (1.00, (255, 255, 204)),
)


def bin_points(
    points: DataFrame,
    *,
    zoom: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    weight_col: Optional[str] = None,
    tile_px: int = 256,
) -> DataFrame:
    """Per-pixel weights: ``[x, y, px, py, weight]`` — the pure-Catalyst
    binning stage (exposed separately so callers can derive a global
    ``vmax`` or feed a different renderer). ``weight`` is the point
    count, or ``sum(weight_col)`` when given."""
    if not (0 <= zoom <= 22):
        raise ValueError(f"zoom must be in [0, 22], got {zoom}")
    if tile_px < 1 or tile_px & (tile_px - 1):
        raise ValueError(f"tile_px must be a power of two, got {tile_px}")
    n_px = float((1 << zoom) * tile_px)  # world size in pixels
    nx = F.col(lon_col).cast("double") / F.lit(360.0) + F.lit(0.5)
    sinlat = F.sin(F.radians(F.col(lat_col).cast("double")))
    ny = (
        F.lit(0.5)
        - F.lit(0.25)
        * F.log((F.lit(1.0) + sinlat) / (F.lit(1.0) - sinlat))
        / F.lit(math.pi)
    )

    def world_px(v):
        raw = F.floor((v + F.lit(_EPSILON)) * F.lit(n_px)).cast("long")
        return F.greatest(F.lit(0).cast("long"), F.least(F.lit(int(n_px) - 1).cast("long"), raw))

    wx, wy = world_px(nx), world_px(ny)
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    binned = points.select(
        (wx / tile_px).cast("long").alias("x"),
        (wy / tile_px).cast("long").alias("y"),
        (wx % tile_px).cast("int").alias("px"),
        (wy % tile_px).cast("int").alias("py"),
        w.alias("_w"),
    )
    return binned.groupBy("x", "y", "px", "py").agg(F.sum("_w").alias("weight"))


def _ramp_lut(ramp) -> np.ndarray:
    """(256, 3) uint8 lookup table from piecewise-linear ramp stops."""
    pos = np.array([p for p, _ in ramp])
    cols = np.array([c for _, c in ramp], dtype=float)
    t = np.linspace(0.0, 1.0, 256)
    lut = np.stack([np.interp(t, pos, cols[:, i]) for i in range(3)], axis=1)
    return np.round(lut).astype(np.uint8)


def render_density_tiles(
    points: DataFrame,
    *,
    zoom: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    weight_col: Optional[str] = None,
    tile_px: int = 256,
    log_scale: bool = True,
    vmax: Optional[float] = None,
    ramp: Iterable = FIRE_RAMP,
    src: int = 9,
    n_buckets: int = 16,
) -> DataFrame:
    """Render points into IMAGE_SCHEMA density tiles at ``zoom``.

    Output rows are drop-in image-table rows (``image_id, bytes, w, h,
    fmt, caption, phash, zoom, bucket``; caption records the render
    parameters) — feed them to ``mosaic``/``export_mosaics``/
    ``build_pyramid`` unchanged. Only touched tiles are emitted.
    """
    binned = bin_points(
        points,
        zoom=zoom,
        lon_col=lon_col,
        lat_col=lat_col,
        weight_col=weight_col,
        tile_px=tile_px,
    )
    return render_binned(
        binned,
        zoom=zoom,
        tile_px=tile_px,
        log_scale=log_scale,
        vmax=vmax,
        ramp=ramp,
        src=src,
        n_buckets=n_buckets,
    )


def render_binned(
    binned: DataFrame,
    *,
    zoom: int,
    tile_px: int = 256,
    log_scale: bool = True,
    vmax: Optional[float] = None,
    ramp: Iterable = FIRE_RAMP,
    src: int = 9,
    n_buckets: int = 16,
) -> DataFrame:
    """Paint stage over an existing per-pixel weight frame (the
    ``bin_points`` shape ``[x, y, px, py, weight]``) — exposed so
    incremental maintainers (streaming/density_stream.py) can merge
    binned deltas relationally and repaint only touched tiles."""
    lut = _ramp_lut(tuple(ramp))
    z = int(zoom)
    tp = int(tile_px)
    vmax_f = None if vmax is None else float(vmax)
    if vmax_f is not None and vmax_f <= 0:
        raise ValueError(f"vmax must be positive, got {vmax}")
    use_log = bool(log_scale)
    n_b = int(n_buckets)
    src_i = int(src)

    def paint(key, pdf):
        import pandas as pd

        from tilegrab_spark.kernels.png import encode_png, phash64

        x, y = int(key[0]), int(key[1])
        canvas = np.zeros((tp, tp), dtype=np.float64)
        canvas[pdf["py"].to_numpy(), pdf["px"].to_numpy()] = pdf["weight"].to_numpy()
        top = vmax_f if vmax_f is not None else float(canvas.max())
        if top <= 0:
            top = 1.0
        if use_log:
            intensity = np.log1p(np.clip(canvas, 0.0, None)) / np.log1p(top)
        else:
            intensity = canvas / top
        idx = np.clip(np.round(intensity * 255.0), 0, 255).astype(np.uint8)
        rgb = lut[idx]
        data = encode_png(rgb, filter_type=2)
        cell = (z << 58) | (x << 29) | y
        cap = "density z=%d vmax=%s scale=%s" % (
            z,
            "tile" if vmax_f is None else repr(vmax_f),
            "log1p" if use_log else "linear",
        )
        return pd.DataFrame(
            {
                "image_id": [f"{z}_{x}_{y}_{src_i}"],
                "bytes": [data],
                "w": [tp],
                "h": [tp],
                "fmt": ["png"],
                "caption": [cap],
                "phash": [phash64(rgb)],
                "zoom": [z],
                "bucket": [int(cell % n_b)],
            }
        )

    return binned.groupBy("x", "y").applyInPandas(paint, IMAGE_SCHEMA)


def interpolate_idw_tiles(
    points: DataFrame,
    *,
    zoom: int,
    value_col: str,
    vmin: float,
    vmax: float,
    radius_px: float = 64.0,
    power: float = 2.0,
    lon_col: str = "lon",
    lat_col: str = "lat",
    tile_px: int = 256,
    src: int = 8,
    n_buckets: int = 16,
) -> DataFrame:
    """Inverse-distance-weighted surface tiles from scattered point
    samples (the gdal_grid/`r.surf.idw` operation, Spark-first): each
    output pixel is the ``1/d^power``-weighted mean of the samples
    within ``radius_px`` world pixels; pixels with no sample in range
    stay black (nodata). Output rows are IMAGE_SCHEMA grayscale tiles
    (value linearly mapped from the REQUIRED explicit ``[vmin, vmax]``
    — an explicit scale is what keeps tiles comparable across the
    layer and re-runs byte-identical).

    Plan shape: points project to fractional world-pixel coordinates
    (pure Catalyst, same P1 math as ``bin_points``) and EXPLODE to the
    tiles their radius disc touches — a bounded ``sequence`` explode of
    ``(1 + 2·radius/tile_px)²`` candidates (1-4 rows at the default
    radius), the same blocked-join discipline as grid_dbscan's 9-cell
    probe. One Arrow grouped map per tile then evaluates the IDW field
    vectorized. Per-tile cost is O(tile_px² × local samples); dense
    hot tiles are the skew axis (same knob as everywhere: radius and
    zoom bound the fan-in; upstream aggregation/sampling bounds points
    per pixel).

    A sample exactly on a pixel center (d = 0) pins that pixel to its
    value (ties: mean of the zero-distance samples).
    """
    if vmax <= vmin:
        raise ValueError(f"vmax must exceed vmin, got [{vmin}, {vmax}]")
    if radius_px <= 0 or power <= 0:
        raise ValueError("radius_px and power must be positive")
    if not (0 <= zoom <= 22):
        raise ValueError(f"zoom must be in [0, 22], got {zoom}")
    n_px = float((1 << zoom) * tile_px)
    nx = F.col(lon_col).cast("double") / F.lit(360.0) + F.lit(0.5)
    sinlat = F.sin(F.radians(F.col(lat_col).cast("double")))
    ny = (
        F.lit(0.5)
        - F.lit(0.25)
        * F.log((F.lit(1.0) + sinlat) / (F.lit(1.0) - sinlat))
        / F.lit(math.pi)
    )
    # fractional world-pixel position (pixel (r, c) covers
    # [c, c+1) x [r, r+1); its center sits at +0.5)
    fx = F.least(F.lit(n_px - 1e-9), F.greatest(F.lit(0.0), nx * F.lit(n_px)))
    fy = F.least(F.lit(n_px - 1e-9), F.greatest(F.lit(0.0), ny * F.lit(n_px)))
    tp = int(tile_px)
    r_px = float(radius_px)
    max_tile = (1 << zoom) - 1
    proj = points.select(
        fx.alias("_fx"),
        fy.alias("_fy"),
        F.col(value_col).cast("double").alias("_v"),
    )
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
    pw = float(power)
    n_b = int(n_buckets)
    src_i = int(src)

    def paint(key, pdf):
        import pandas as pd

        from tilegrab_spark.kernels.png import encode_png, phash64

        x, y = int(key[0]), int(key[1])
        # float accumulation is order-sensitive: pin a deterministic
        # sample order so output bytes don't depend on partitioning
        pdf = pdf.sort_values(["_fx", "_fy", "_v"], kind="mergesort")
        px = pdf["_fx"].to_numpy() - x * tp
        py = pdf["_fy"].to_numpy() - y * tp
        vals = pdf["_v"].to_numpy()
        gx = np.arange(tp) + 0.5
        gy = (np.arange(tp) + 0.5)[:, None]
        num = np.zeros((tp, tp))
        den = np.zeros((tp, tp))
        exact_sum = np.zeros((tp, tp))
        exact_cnt = np.zeros((tp, tp))
        r2 = r_px * r_px
        for i in range(px.shape[0]):
            d2 = (gx - px[i]) ** 2 + (gy - py[i]) ** 2
            m = d2 <= r2
            zero = m & (d2 == 0.0)
            if zero.any():
                exact_sum[zero] += vals[i]
                exact_cnt[zero] += 1
                m &= ~zero
            w = np.zeros_like(d2)
            w[m] = d2[m] ** (-pw / 2.0)
            num += w * vals[i]
            den += w
        field = np.full((tp, tp), np.nan)
        hit = den > 0
        field[hit] = num[hit] / den[hit]
        ex = exact_cnt > 0
        field[ex] = exact_sum[ex] / exact_cnt[ex]
        idx = np.zeros((tp, tp), dtype=np.uint8)
        ok = ~np.isnan(field)
        idx[ok] = np.clip(
            np.round((field[ok] - lo) / (hi - lo) * 255.0), 0, 255
        ).astype(np.uint8)
        rgb = np.repeat(idx[:, :, None], 3, axis=2)
        data = encode_png(rgb, filter_type=2)
        cell = (z << 58) | (x << 29) | y
        cap = "idw z=%d r=%s p=%s range=[%s,%s] n=%d" % (
            z, repr(r_px), repr(pw), repr(lo), repr(hi), px.shape[0]
        )
        return pd.DataFrame(
            {
                "image_id": [f"{z}_{x}_{y}_{src_i}"],
                "bytes": [data],
                "w": [tp],
                "h": [tp],
                "fmt": ["png"],
                "caption": [cap],
                "phash": [phash64(rgb)],
                "zoom": [z],
                "bucket": [int(cell % n_b)],
            }
        )

    return span.groupBy("x", "y").applyInPandas(paint, IMAGE_SCHEMA)
