"""One-pass table profiling — the ANALYZE/data-quality sweep a pipeline
runs before touching 100 TB: per column, row/null counts, min/max,
(approximate) distinct count and string length stats, computed as ONE
aggregation over ONE scan.

Shape notes for scale:
- everything folds into a single ``agg`` row: the scan is one pass,
  every statistic partially aggregates map-side, and the exchange
  carries exactly one row;
- distinct counts default to ``approx_count_distinct`` (Spark's HLL++,
  mergeable, fixed-size state). ``exact=True`` switches to
  ``countDistinct`` — which Catalyst plans as one expand + shuffle PER
  COLUMN — only for small tables or oracle tests;
- the single stats row is melted to one OUTPUT row per column on the
  driver (bounded by column count, never data-sized).

The per-column output is the natural input for manifest-level pruning
stats, mixture weighting (null/short-text rates), and drift checks
between ingest days (profile rows diff relationally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["profile_table"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    exact: bool = False,
) -> DataFrame:
    """``[column, dtype, n_rows, n_null, n_distinct, min_value,
    max_value, avg_str_len]`` — one row per profiled column, one scan.
    min/max are stringified (a mixed-type profile needs one schema);
    ``avg_str_len`` is NULL for non-string columns; complex-typed
    columns (array/struct/map/binary) get counts only. ``n_distinct``
    is approximate unless ``exact=True`` (see module docstring)."""
    cols = columns if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    if not cols:
        raise ValueError("no columns to profile")
    by_name = {f.name: f.dataType for f in df.schema.fields}

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = by_name[c]
        simple = isinstance(dt, (T.StringType, T.BooleanType,
                                 T.DateType, T.TimestampType) + _NUMERIC)
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        if simple:
            dist = (F.countDistinct(F.col(c)) if exact
                    else F.approx_count_distinct(F.col(c)))
            aggs.append(dist.alias(f"__nd_{c}"))
            aggs.append(F.min(F.col(c)).cast("string").alias(f"__mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("string").alias(f"__mx_{c}"))
        if isinstance(dt, T.StringType):
            aggs.append(F.avg(F.length(F.col(c))).alias(f"__al_{c}"))
    row = df.agg(*aggs).collect()[0]

    out = []
    for c in cols:
        dt = by_name[c]
        d = row.asDict()
        out.append(
            (
                c,
                dt.simpleString(),
                int(row["__n"]),
                int(row["__n"]) - int(d[f"__nn_{c}"]),
                int(d[f"__nd_{c}"]) if f"__nd_{c}" in d else None,
                d.get(f"__mn_{c}"),
                d.get(f"__mx_{c}"),
                float(d[f"__al_{c}"]) if d.get(f"__al_{c}") is not None else None,
            )
        )
    schema = T.StructType(
        [
            T.StructField("column", T.StringType(), False),
            T.StructField("dtype", T.StringType(), False),
            T.StructField("n_rows", T.LongType(), False),
            T.StructField("n_null", T.LongType(), False),
            T.StructField("n_distinct", T.LongType(), True),
            T.StructField("min_value", T.StringType(), True),
            T.StructField("max_value", T.StringType(), True),
            T.StructField("avg_str_len", T.DoubleType(), True),
        ]
    )
    return df.sparkSession.createDataFrame(out, schema)
