"""Deterministic shard packing — the training-export layout step.

A 100 TB corpus is consumed by trainers as fixed-size shards (the
webdataset/tfrecord shape: ~shard_bytes of samples per file, readable
independently, deterministic membership so a re-run resumes/re-ships the
same shards). Assigning rows to shards is a PREFIX SUM over a global
order — the naive Spark form (one Window over everything) collapses to a
single task and dies at scale.

``pack_shards`` computes the same assignment with the classic
distributed two-level scan:

1. range-repartition + sort by the (unique) order key — Spark's
   RangePartitioner samples the key distribution, so partitions are
   balanced without tuning and partition ids are ordered by key;
2. per-partition local running totals (a window WITHIN each partition —
   parallel, no global collapse);
3. per-partition totals (one tiny row per partition) prefix-summed with
   a window over that TINY frame and broadcast-joined back.

Every row's global byte offset = partition offset + local running total,
all relational, no driver loop, no ``collect``. A row lands in the shard
containing its START offset (``offset DIV shard_bytes``) — rows larger
than ``shard_bytes`` occupy their own shard span, never split.

The reference has no analogue (it writes one file per tile); this is
part of the training-data operator suite from the driver brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["pack_shards", "shard_manifest"]


def pack_shards(
    df: DataFrame,
    *,
    size_col: str,
    order_col: str,
    shard_bytes: int,
) -> DataFrame:
    """Assign each row a ``shard_id`` + ``start_offset`` by packing rows
    in ``order_col`` order into ``shard_bytes``-sized shards.

    ``order_col`` must be a unique key (doc ids, image ids, Morton keys —
    the natural export orders all are): uniqueness is what makes the
    assignment a pure function of the data, independent of partitioning.
    Output: input columns + ``start_offset`` (global byte offset of the
    row, 0-based) + ``shard_id`` (``start_offset DIV shard_bytes``).
    """
    if shard_bytes <= 0:
        raise ValueError(f"shard_bytes must be positive, got {shard_bytes}")
    ranged = df.repartitionByRange(F.col(order_col)).sortWithinPartitions(order_col)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    # 2. local inclusive running total per partition (parallel windows)
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = with_pid.withColumn(
        "_local_end", F.sum(F.col(size_col).cast("long")).over(local_w)
    )
    # 3. exclusive prefix over the per-partition totals — one row per
    # partition, so the single-task window is over a frame of size
    # O(num partitions), not O(rows); broadcast it back
    totals = local.groupBy("_pid").agg(F.sum(F.col(size_col).cast("long")).alias("_tot"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_poff", F.coalesce(F.sum("_tot").over(off_w), F.lit(0))
    ).select("_pid", "_poff")
    out = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(
            "start_offset",
            F.col("_poff") + F.col("_local_end") - F.col(size_col).cast("long"),
        )
        .withColumn("shard_id", F.expr(f"start_offset DIV {int(shard_bytes)}"))
        .drop("_pid", "_local_end", "_poff")
    )
    return out


def shard_manifest(
    packed: DataFrame,
    *,
    size_col: str,
    order_col: str,
) -> DataFrame:
    """Per-shard manifest from a ``pack_shards`` output: item count,
    payload bytes, and the key range ``[first_key, last_key]`` a reader
    needs to locate a sample without scanning. One map-side-combinable
    aggregation."""
    return packed.groupBy("shard_id").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col(size_col).cast("long")).alias("bytes"),
        F.min(order_col).alias("first_key"),
        F.max(order_col).alias("last_key"),
    )
