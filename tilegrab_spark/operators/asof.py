"""As-of join — "for each left row, the latest right row at or before
it" — without a range-explosion join.

The telemetry/lineage question (which fetch attempt produced this tile?
what was the last config change before this failure? which view
preceded this purchase?) is a non-equi join Spark has no operator for;
the naive form (`l JOIN r ON key AND r.ts <= l.ts` + max-window) builds
every (left × earlier-right) pair first — quadratic per key, dead at
scale. This is the classic union-window rewrite instead:

1. tag right rows side=0 carrying a payload struct, left rows side=1
   with a NULL payload (one ``unionByName``, no join);
2. ONE window per key ordered by (ts, side):
   ``last(payload, ignorenulls=True)`` over the unbounded-preceding
   frame hands every left row the most recent right payload — right
   sorts before left at equal ts, so the match is ``r.ts <= l.ts``
   exactly (DuckDB ``ASOF JOIN`` semantics; the `asof_join_events`
   contract oracle IS a native ASOF JOIN);
3. unmatched / out-of-tolerance left rows keep NULLs (left-join shape).

Cost: one shuffle on the key, O(n log n) per key — each row is touched
once. Rows per key bound the window partition (time-bucket pre-split is
the escape hatch for a pathological single key, same note as
sessionize). Right rows are deduplicated to one per (key, ts) by
greatest payload struct — put a unique id first in ``right_cols`` and
ties are fully deterministic (mirrors the oracle's ``ORDER BY id DESC``
pre-dedup).

The reference's progress lookup (/root/reference/src/tilegrab/utils/
progress.py) is a point-get; this generalizes it to the temporal
"state as of" form a lineage table needs. ``direction="forward"`` flips
to earliest-at-or-after by reversing the window order.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join"]

# tolerance is interpolated into F.expr(f"INTERVAL {tolerance}"), so it
# must be a strict interval literal, never an arbitrary expression —
# config-sourced strings would otherwise be an injection surface (same
# whitelisting policy as algebra.py's expression surface).
_INTERVAL_RE = re.compile(
    r"^\d+\s+(microsecond|millisecond|second|minute|hour|day|week)s?$",
    re.IGNORECASE,
)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str],
    ts_col: str = "ts",
    right_cols: Sequence[str] | None = None,
    suffix: str = "_r",
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: all left columns + each ``right_cols`` column
    (suffixed on collision) + ``{ts_col}{suffix}`` (the matched right
    timestamp; NULL when no match).

    ``tolerance`` is a SQL interval literal (e.g. ``"10 minutes"``) —
    matches older (newer, for ``direction="forward"``) than that are
    nulled out. ``on`` may be one key or several.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if tolerance is not None and not _INTERVAL_RE.match(tolerance.strip()):
        raise ValueError(
            f"tolerance must be a plain interval literal like '10 minutes', "
            f"got {tolerance!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != ts_col]
    right_cols = list(right_cols)
    bad = [c for c in (*keys, ts_col) if c not in left.columns or c not in right.columns]
    if bad:
        raise ValueError(f"key/ts columns missing from an input: {bad}")

    pay = F.struct(
        F.col(ts_col).alias("_tg_rts"), *[F.col(c).alias(c) for c in right_cols]
    )
    # NULL keys never satisfy an equi-join and a NULL right ts never
    # satisfies r.ts <= l.ts, so such right rows can match nothing —
    # drop them up front (otherwise NULLS FIRST ordering would hand a
    # NULL-ts payload to every left row)
    r_valid = right.filter(F.col(ts_col).isNotNull())
    for kcol in keys:
        r_valid = r_valid.filter(F.col(kcol).isNotNull())
    r2 = (
        r_valid.groupBy(*keys, ts_col)
        .agg(F.max(pay).alias("_tg_pay"))
        .withColumn("_tg_side", F.lit(0))
    )
    l2 = left.withColumn("_tg_side", F.lit(1))
    unioned = l2.unionByName(r2, allowMissingColumns=True)

    # nulls-FIRST in both directions: a left row with NULL ts sorts
    # before every right row and therefore matches nothing (SQL
    # comparison with NULL is never true)
    order = (
        [F.col(ts_col).asc_nulls_first(), F.col("_tg_side").asc()]
        if direction == "backward"
        else [F.col(ts_col).desc_nulls_first(), F.col("_tg_side").asc()]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        unioned.withColumn("_tg_m", F.last("_tg_pay", ignorenulls=True).over(w))
        .filter(F.col("_tg_side") == 1)
        .drop("_tg_side", "_tg_pay")
    )
    if tolerance is not None:
        delta = F.expr(f"INTERVAL {tolerance}")
        in_tol = (
            F.col("_tg_m._tg_rts") >= F.col(ts_col) - delta
            if direction == "backward"
            else F.col("_tg_m._tg_rts") <= F.col(ts_col) + delta
        )
        out = out.withColumn(
            "_tg_m", F.when(in_tol, F.col("_tg_m"))
        )
    taken = set(left.columns)
    cols = [F.col(c) for c in left.columns]
    cols.append(F.col("_tg_m._tg_rts").alias(f"{ts_col}{suffix}"))
    for c in right_cols:
        name = f"{c}{suffix}" if c in taken else c
        cols.append(F.col(f"_tg_m.{c}").alias(name))
    return out.select(*cols)
