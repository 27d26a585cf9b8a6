"""Z-order spatial data layout (the 100 TB file-layout primitive).

The reference never persists tile tables — it streams tiles through a
single process (reference src/tilegrab/tilegrab.py download loop), so
layout is moot.  At cluster scale the dominant cost of every spatial
query in this engine (bbox enumeration joins, kNN cell-ring probes,
mosaic group shuffles) is how many files a cell-key range touches.
``cluster_by_space`` rewrites a tile/point DataFrame into Morton
(Z-order) ranges so spatially-near rows land in the same partitions —
the same idea as Delta's OPTIMIZE ZORDER, built from the engine's own
key math (functions/interop.py).

Why ``repartitionByRange`` and not hash/bucketing: range boundaries
are picked from a reservoir sample of the actual key distribution
(Spark's RangePartitioner), so a skewed estate — the usual case: cities
are dense, oceans empty — still yields balanced partitions, with no
manual salt tuning.  Writing the result partitioned-by nothing but
sorted within files gives parquet min/max statistics on the key
column, so a bbox scan (a small set of Morton ranges) prunes row
groups server-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tilegrab_spark.functions.interop import hilbert_key_col, morton_key_col


def with_morton_key(
    df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    zoom: str | int | Column = "z",
    key_col: str = "morton_key",
) -> DataFrame:
    """Append the Z-order key column for (x_col, y_col) at ``zoom``
    (a column name, a literal int, or a Column)."""
    z = F.col(zoom) if isinstance(zoom, str) else zoom
    return df.withColumn(key_col, morton_key_col(F.col(x_col), F.col(y_col), z))


def with_hilbert_key(
    df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    zoom: str | int | Column = "z",
    key_col: str = "hilbert_key",
) -> DataFrame:
    """Append the Hilbert-curve key column for (x_col, y_col) at
    ``zoom`` — Morton's locality-optimal sibling (consecutive keys are
    always grid-adjacent, so sorted files get tighter bounding boxes;
    see functions/interop.py::hilbert_key_col for the trade-off: no
    ``parent = child >> 2`` identity, so pyramid range math stays with
    Morton)."""
    z = F.col(zoom) if isinstance(zoom, str) else zoom
    return df.withColumn(key_col, hilbert_key_col(F.col(x_col), F.col(y_col), z))


def cluster_by_space(
    df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    zoom: str | int | Column = "z",
    num_partitions: int | None = None,
    key_col: str | None = None,
    keep_key: bool = True,
    curve: str = "morton",
) -> DataFrame:
    """Range-partition + sort the frame along a space-filling curve.

    One shuffle (the range exchange); the within-partition sort rides
    the same exchange's sort, so a following ``.write.parquet`` emits
    files whose key min/max spans are tight and disjoint.  Partition
    count defaults to the session's shuffle parallelism.

    ``curve``: ``"morton"`` (default — keys also serve bbox range
    pruning via :func:`morton_ranges_for_bbox`) or ``"hilbert"``
    (strictly better locality — every key step is grid-adjacent, so
    partition bounding boxes are tighter on seam-heavy estates; use
    when the key is layout-only).  ``key_col`` defaults to
    ``"<curve>_key"``.
    """
    if curve == "morton":
        keyed = with_morton_key(df, x_col, y_col, zoom, key_col or "morton_key")
        key_col = key_col or "morton_key"
    elif curve == "hilbert":
        keyed = with_hilbert_key(df, x_col, y_col, zoom, key_col or "hilbert_key")
        key_col = key_col or "hilbert_key"
    else:
        raise ValueError(f"curve must be 'morton' or 'hilbert', got {curve!r}")
    if num_partitions is None:
        parts = keyed.repartitionByRange(key_col)
    else:
        parts = keyed.repartitionByRange(num_partitions, key_col)
    out = parts.sortWithinPartitions(key_col)
    return out if keep_key else out.drop(key_col)


def morton_ranges_for_bbox(
    x0: int, y0: int, x1: int, y1: int, zoom: int, max_ranges: int = 64
) -> list[tuple[int, int]]:
    """Decompose an inclusive tile bbox into contiguous Morton key
    ranges — the *read side* of cluster_by_space.

    A quadtree block (an axis-aligned 2^k square at an aligned origin)
    is exactly one contiguous Z-order range, so the bbox is covered by
    recursively splitting quads: quads fully inside emit their range,
    quads fully outside are dropped, straddling quads recurse.  Ranges
    are merged when adjacent and coarsened (coalesced with the gap
    between them) if the count would exceed ``max_ranges`` — extra keys
    only cost a little over-scan, never correctness, because callers
    still apply the exact predicate.

    Driver-side by design: the bbox is query metadata (a handful of
    ints), the output feeds a pushed-down ``key BETWEEN lo AND hi``
    disjunction; no data moves through Python.
    """
    if x1 < x0 or y1 < y0:
        return []
    out: list[tuple[int, int]] = []

    def _cover(qx: int, qy: int, level: int) -> None:
        # quad at aligned origin (qx, qy) with side 2^level
        side = 1 << level
        lo_x, lo_y = qx, qy
        hi_x, hi_y = qx + side - 1, qy + side - 1
        if lo_x > x1 or hi_x < x0 or lo_y > y1 or hi_y < y0:
            return
        if x0 <= lo_x and hi_x <= x1 and y0 <= lo_y and hi_y <= y1:
            base = _morton_py(qx >> level, qy >> level) << (2 * level)
            out.append((base, base + (1 << (2 * level)) - 1))
            return
        half = level - 1
        h = 1 << half
        _cover(qx, qy, half)
        _cover(qx + h, qy, half)
        _cover(qx, qy + h, half)
        _cover(qx + h, qy + h, half)

    _cover(0, 0, zoom)
    out.sort()
    # merge touching ranges
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    # coalesce smallest gaps until under budget (over-scan, never loss)
    while len(merged) > max_ranges:
        gaps = [
            (merged[i + 1][0] - merged[i][1], i) for i in range(len(merged) - 1)
        ]
        _, i = min(gaps)
        merged[i] = (merged[i][0], merged[i + 1][1])
        del merged[i + 1]
    return merged


def _morton_py(x: int, y: int) -> int:
    m = 0
    for i in range(max(x.bit_length(), y.bit_length()) - 1, -1, -1):
        m = m * 4 + 2 * ((y >> i) & 1) + ((x >> i) & 1)
    return m


def morton_bbox_predicate(
    key: Column, x0: int, y0: int, x1: int, y1: int, zoom: int, max_ranges: int = 64
) -> Column:
    """A Catalyst predicate selecting the bbox's Morton ranges —
    ``key BETWEEN lo AND hi OR ...`` — which parquet row-group min/max
    stats (written by cluster_by_space) prune server-side.  Callers
    should AND the exact x/y bbox test on top; the ranges may over-scan
    slightly when coalesced under ``max_ranges``."""
    ranges = morton_ranges_for_bbox(x0, y0, x1, y1, zoom, max_ranges)
    if not ranges:
        return F.lit(False)
    pred = key.between(ranges[0][0], ranges[0][1])
    for lo, hi in ranges[1:]:
        pred = pred | key.between(lo, hi)
    return pred


def partition_extent_stats(
    df: DataFrame, x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """Per-partition bounding-box stats — the locality measure tests
    and operators use to judge a layout (smaller boxes = better
    pruning).  One narrow mapPartitions-free pass: spark_partition_id
    + groupBy, all Catalyst."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min(x_col).alias("min_x"),
            F.max(x_col).alias("max_x"),
            F.min(y_col).alias("min_y"),
            F.max(y_col).alias("max_y"),
        )
        .withColumn(
            "bbox_area",
            (F.col("max_x") - F.col("min_x") + 1)
            * (F.col("max_y") - F.col("min_y") + 1),
        )
    )
