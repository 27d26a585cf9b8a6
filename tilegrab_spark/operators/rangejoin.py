"""Range joins (point-in-interval, interval-overlap) — bucketized.

Spark has no range-join operator: ``l JOIN r ON p >= lo AND p < hi``
plans as BroadcastNestedLoopJoin (fine only while one side broadcasts)
or a cartesian product — dead at 100 TB. Both operators here rewrite the
inequality join as an EQUI-join on a derived bucket key, which Catalyst
shuffles/broadcasts like any other join:

- ``range_join``: intervals explode to the ``bucket_width`` buckets they
  cover; a point lives in exactly ONE bucket, so after the equi-join +
  exact predicate every matching pair appears exactly once — no dedup.
- ``interval_join``: both sides explode; a pair would meet in every
  shared bucket, so it is kept only in the bucket of
  ``greatest(lo_l, lo_r)`` (the classic MapReduce spatial-join
  dedup rule) — again exactly once, no distinct pass.

Pick ``bucket_width`` near the median interval length: each interval
then explodes to ~2 rows, and every bucket's population stays bounded —
the same granularity trade-off as the tile grid in operators/tiles.py
(a bbox IS a 2-D range join against the implicit tile lattice; this is
the 1-D relational form of the same design).

Cost: one shuffle on the bucket key (or a broadcast when the exploded
interval side is small). Skewed buckets fall out of AQE skew-join
handling like any equi-join — which is the point of the rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["range_join", "interval_join"]

_PREDS = {
    "left": lambda p, lo, hi: (p >= lo) & (p < hi),
    "both": lambda p, lo, hi: (p >= lo) & (p <= hi),
    "right": lambda p, lo, hi: (p > lo) & (p <= hi),
    "neither": lambda p, lo, hi: (p > lo) & (p < hi),
}


def _buckets(lo, hi, width):
    # covered-bucket superset (the exact predicate filters after the
    # join, so the closed-ness of the interval doesn't matter here)
    return F.sequence(
        F.floor(lo / F.lit(width)).cast("long"),
        F.floor(hi / F.lit(width)).cast("long"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    closed: str = "left",
    how: str = "inner",
) -> DataFrame:
    """Join points (``left.point_col``) to the intervals
    ``[right.lo_col, right.hi_col)`` containing them. ``closed`` picks
    the boundary rule (``left`` = lo inclusive, hi exclusive). ``how``:
    ``inner`` or ``left`` (unmatched points kept with NULL right side).
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    if closed not in _PREDS:
        raise ValueError(f"closed must be one of {sorted(_PREDS)}, got {closed!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    r2 = right.withColumn(
        "_tg_b", F.explode(_buckets(F.col(lo_col), F.col(hi_col), bucket_width))
    )
    l2 = left.withColumn(
        "_tg_b", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    pred = _PREDS[closed](F.col(point_col), F.col(lo_col), F.col(hi_col))
    if how == "inner":
        return l2.join(r2, on=["_tg_b"], how="inner").filter(pred).drop("_tg_b")
    # left join: the exact predicate must ride the join condition so
    # unmatched points survive with NULLs instead of being filtered away
    return l2.join(
        r2, on=(l2["_tg_b"] == r2["_tg_b"]) & pred, how="left"
    ).drop("_tg_b")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    lo_left: str,
    hi_left: str,
    lo_right: str,
    hi_right: str,
    bucket_width: float,
) -> DataFrame:
    """Pairs of overlapping half-open intervals:
    ``lo_l < hi_r AND lo_r < hi_l``. Each overlapping pair is emitted
    exactly once (kept only in the bucket of ``greatest(lo_l, lo_r)``).
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    l2 = left.withColumn(
        "_tg_b", F.explode(_buckets(F.col(lo_left), F.col(hi_left), bucket_width))
    )
    r2 = right.withColumn(
        "_tg_b", F.explode(_buckets(F.col(lo_right), F.col(hi_right), bucket_width))
    )
    overlap = (F.col(lo_left) < F.col(hi_right)) & (F.col(lo_right) < F.col(hi_left))
    anchor = F.col("_tg_b") == F.floor(
        F.greatest(F.col(lo_left), F.col(lo_right)) / F.lit(bucket_width)
    ).cast("long")
    return l2.join(r2, on=["_tg_b"], how="inner").filter(overlap & anchor).drop("_tg_b")
