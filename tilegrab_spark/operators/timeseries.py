"""Epoch-stack raster time series — temporal compositing + per-pixel
trend over N crawls of a tile lake.

change.py handles the 2-epoch zipper (A vs B); the N-epoch questions a
monitored layer actually asks are:

- **composite**: collapse the stack into one clean tile per cell — the
  standard EO "median composite" (median is the robust cloud/outlier
  killer; mean is the cheap smoother). Output rows are real encoded
  tiles, so the whole downstream raster suite (mosaic stitch, pyramid,
  change detection, GeoTIFF/COG export) consumes the composite layer
  unchanged.
- **trend**: per-pixel ordinary-least-squares slope of the elevation
  proxy (max-channel, the same convention the focal/zonal/terrain
  suite uses) against the epoch value — "which cells are getting
  systematically brighter/darker, and how fast", summarized per cell.

Plan shape (both operators): ONE shuffle, keyed by the spatial cell —
``groupBy(key).applyInPandas`` where a group is one cell's epoch stack.
Group size is bounded by the EPOCH COUNT (dozens), never by the corpus,
so executor memory is n_epochs × tile bytes regardless of table size;
payload bytes move exactly once and pixels never shuffle — trend stats
leave the kernel as eight scalars per cell, composites as one encoded
tile. At 10^12 rows the shuffle is the unavoidable co-location of a
cell's epochs; with both epochs' tables written bucketed by ``key_col``
(sources/images.py layout contract) even that exchange disappears.

Kernel contracts (deterministic, pinned against independent numpy in
tests/test_timeseries.py):

- usable row = payload decodes AND dims match the group's FIRST usable
  row in ascending ``epoch_col`` order (ties broken by ascending
  image_id when present); others count in ``n_bad``. Ordering the
  stack by epoch makes "first usable" — and hence the reference dims —
  a pure function of the rows, independent of partitioning.
- composite ``median``: per pixel per channel, exact integer median of
  the uint8 stack; even-count middles average with round-half-up (so
  the result is again uint8, and a 2-epoch composite of (10, 11) is
  11, not numpy's 10.5 float). ``mean``: round-half-up of the exact
  rational mean.
- trend: per pixel, slope of z (max-channel, float64) on epoch value
  e: ``slope_p = Σ_t (e_t - ē) z_pt / Σ_t (e_t - ē)²`` over the cell's
  usable epochs (all pixels of a cell share the same epoch weights by
  the dims rule). Requires ≥2 usable epochs with distinct e, else the
  row reports status='short' with null stats.

The reference has no temporal analogue (one-shot fetch tool); this
extends the raster suite's temporal axis the way EO compositing
pipelines do, Spark-first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from tilegrab_spark.kernels import png
from tilegrab_spark.operators.multimodal import decode_payload

__all__ = ["epoch_composite", "raster_trend"]

COMPOSITE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("n_epochs", T.IntegerType(), False),
        T.StructField("n_used", T.IntegerType(), False),
        T.StructField("n_bad", T.IntegerType(), False),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("fmt", T.StringType(), True),
    ]
)

TREND_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("n_epochs", T.IntegerType(), False),
        T.StructField("n_used", T.IntegerType(), False),
        T.StructField("n_bad", T.IntegerType(), False),
        T.StructField("slope_mean", T.DoubleType(), True),
        T.StructField("slope_min", T.DoubleType(), True),
        T.StructField("slope_max", T.DoubleType(), True),
        T.StructField("frac_inc", T.DoubleType(), True),
        T.StructField("frac_dec", T.DoubleType(), True),
    ]
)


def _decode_stack(pdf: pd.DataFrame):
    """Shared group prologue: epoch-sorted decode with the first-usable
    dims rule. Returns (epochs list, arrays list, n_bad) — arrays all
    share the reference (H, W, 3) shape."""
    order_cols = ["epoch_v"] + (["image_id"] if "image_id" in pdf.columns else [])
    p = pdf.sort_values(order_cols, kind="mergesort")
    arrays, epochs, n_bad = [], [], 0
    ref_shape = None
    for row in p.itertuples(index=False):
        try:
            arr = decode_payload(bytes(row.bytes), row.fmt, int(row.w), int(row.h))
        except Exception:
            n_bad += 1
            continue
        if ref_shape is None:
            ref_shape = arr.shape
        if arr.shape != ref_shape:
            n_bad += 1
            continue
        arrays.append(arr)
        epochs.append(float(row.epoch_v))
    return epochs, arrays, n_bad


def epoch_composite(
    images: DataFrame,
    *,
    key_col: str = "cell_id",
    epoch_col: str = "epoch",
    stat: str = "median",
) -> DataFrame:
    """Per-cell temporal composite tile over all epochs (module
    docstring for the exact pixel rules). ``stat`` ∈ {'median',
    'mean'}. Output payloads are PNG (lossless — a composite layer
    must not re-introduce codec noise)."""
    if stat not in ("median", "mean"):
        raise ValueError(f"stat must be 'median' or 'mean', got {stat!r}")

    sel = [
        F.col(key_col).cast("long").alias("key"),
        F.col(epoch_col).cast("double").alias("epoch_v"),
        F.col("bytes"),
        F.col("w"),
        F.col("h"),
        F.col("fmt"),
    ]
    if "image_id" in images.columns:
        sel.append(F.col("image_id"))
    src = images.select(*sel)

    def composite(key_tuple: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        key = int(key_tuple[0])
        n_epochs = len(pdf)
        epochs, arrays, n_bad = _decode_stack(pdf)
        base = {
            "key": key,
            "status": "empty",
            "n_epochs": n_epochs,
            "n_used": len(arrays),
            "n_bad": n_bad,
            "w": None,
            "h": None,
            "bytes": None,
            "fmt": None,
        }
        if arrays:
            stack = np.stack(arrays).astype(np.int64)  # (n, H, W, 3)
            if stat == "median":
                s = np.sort(stack, axis=0)
                n = s.shape[0]
                if n % 2:
                    comp = s[n // 2]
                else:
                    # exact integer round-half-up of (lo + hi) / 2
                    comp = (s[n // 2 - 1] + s[n // 2] + 1) // 2
            else:
                comp = (stack.sum(axis=0) * 2 + len(arrays)) // (2 * len(arrays))
            comp = comp.astype(np.uint8)
            base.update(
                status="ok",
                w=comp.shape[1],
                h=comp.shape[0],
                bytes=png.encode_png(comp),
                fmt="png",
            )
        return pd.DataFrame([base], columns=[f.name for f in COMPOSITE_SCHEMA.fields])

    return src.groupBy("key").applyInPandas(composite, COMPOSITE_SCHEMA)


def raster_trend(
    images: DataFrame,
    *,
    key_col: str = "cell_id",
    epoch_col: str = "epoch",
    threshold: float = 0.0,
) -> DataFrame:
    """Per-cell summary of the per-pixel OLS slope of max-channel
    intensity against ``epoch_col`` (module docstring for the formula).
    ``threshold`` sets the dead band for ``frac_inc``/``frac_dec``
    (fraction of pixels with slope > +threshold / < -threshold)."""
    if threshold < 0:
        raise ValueError(f"threshold must be >= 0, got {threshold}")

    sel = [
        F.col(key_col).cast("long").alias("key"),
        F.col(epoch_col).cast("double").alias("epoch_v"),
        F.col("bytes"),
        F.col("w"),
        F.col("h"),
        F.col("fmt"),
    ]
    if "image_id" in images.columns:
        sel.append(F.col("image_id"))
    src = images.select(*sel)
    thr = float(threshold)

    def trend(key_tuple: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        key = int(key_tuple[0])
        n_epochs = len(pdf)
        epochs, arrays, n_bad = _decode_stack(pdf)
        base = {
            "key": key,
            "status": "short",
            "n_epochs": n_epochs,
            "n_used": len(arrays),
            "n_bad": n_bad,
            "slope_mean": None,
            "slope_min": None,
            "slope_max": None,
            "frac_inc": None,
            "frac_dec": None,
        }
        e = np.asarray(epochs, dtype=np.float64)
        if len(arrays) >= 2 and np.unique(e).size >= 2:
            z = np.stack(
                [a.max(axis=2).astype(np.float64) for a in arrays]
            )  # (n, H, W)
            w = e - e.mean()
            denom = float((w * w).sum())
            slopes = np.tensordot(w, z, axes=(0, 0)) / denom  # (H, W)
            base.update(
                status="ok",
                slope_mean=float(slopes.mean()),
                slope_min=float(slopes.min()),
                slope_max=float(slopes.max()),
                frac_inc=float((slopes > thr).mean()),
                frac_dec=float((slopes < -thr).mean()),
            )
        return pd.DataFrame([base], columns=[f.name for f in TREND_SCHEMA.fields])

    return src.groupBy("key").applyInPandas(trend, TREND_SCHEMA)
