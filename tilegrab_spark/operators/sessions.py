"""Sessionization (gaps-and-islands) over event streams — a
training-data-pipeline staple (driver brief: beyond-reference operators;
extends §2.6 window coverage). Pure Catalyst: lag + conditional flag +
running sum, no UDF, one shuffle on the user key.

At 10^12 events this is the canonical windowed shape: partition by
user, sort within partition, two window passes that Spark pipelines in
a single sort — the same query the stateful-streaming rollup
(streaming/stateful.py) maintains incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple = ("event_id",),
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign a per-user ``session_idx`` (0-based): a new session starts
    when the gap to the previous event exceeds ``gap_minutes``.
    ``order_cols`` break timestamp ties deterministically (engines must
    agree on event order for cross-engine parity)."""
    # parquet event times are TIMESTAMP_NTZ; the session TZ is pinned to
    # UTC (session.py), so the cast is the identity mapping to epoch time
    ts_us_col = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_us = int(gap_minutes * 60 * 1_000_000)
    prev_us = F.lag(ts_us_col).over(w)
    new_session = (
        prev_us.isNull() | (ts_us_col - prev_us > gap_us)
    ).cast("int")
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("_ns", new_session).withColumn(
        "session_idx", (F.sum("_ns").over(running) - 1).cast("int")
    ).drop("_ns")


def session_summary(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session rollup: event count, start/end (epoch microseconds —
    integer, so independent engines hash identically), and — when
    ``value_col`` names a column present in ``df`` — its per-session sum
    as ``sum_<value_col>``. Pass ``value_col=None`` (or a name absent
    from the schema) for schema-generic event tables; the sum column is
    then omitted instead of raising AnalysisException."""
    s = sessionize(df, user_col=user_col, ts_col=ts_col, gap_minutes=gap_minutes)
    aggs = [
        F.count("*").alias("n_events"),
        F.min(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("start_us"),
        F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("end_us"),
    ]
    if value_col is not None and value_col in df.columns:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(25,6)"))
            .cast("double")
            .alias(f"sum_{value_col}")
        )
    return s.groupBy(user_col, "session_idx").agg(*aggs)
