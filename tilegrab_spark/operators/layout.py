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

from tilegrab_spark.functions.interop import morton_key_col


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


def cluster_by_space(
    df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    zoom: str | int | Column = "z",
    num_partitions: int | None = None,
    key_col: str = "morton_key",
    keep_key: bool = True,
) -> DataFrame:
    """Range-partition + sort the frame along the Z-order curve.

    One shuffle (the range exchange); the within-partition sort rides
    the same exchange's sort, so a following ``.write.parquet`` emits
    files whose key min/max spans are tight and disjoint.  Partition
    count defaults to the session's shuffle parallelism.
    """
    keyed = with_morton_key(df, x_col, y_col, zoom, key_col)
    if num_partitions is None:
        parts = keyed.repartitionByRange(key_col)
    else:
        parts = keyed.repartitionByRange(num_partitions, key_col)
    out = parts.sortWithinPartitions(key_col)
    return out if keep_key else out.drop(key_col)


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
