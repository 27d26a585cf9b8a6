"""Exact heavy hitters at scale — Misra-Gries candidates + verify pass.

"Which keys make up more than f of this 100 TB table?" is the question
behind skew handling (salt exactly the hot join keys —
``operators/image_join.py`` takes the hot-key list this operator
produces), frequent-token accounting, and hot-cell densification
(``operators/knn.py``). The naive answer — ``groupBy(key).count()`` —
shuffles one row per DISTINCT key: at 10^10 distinct keys that is the
biggest exchange in the job, spent almost entirely on keys that could
never be heavy.

This operator is the classic two-pass exact algorithm:

1. **Candidate pass — per-partition Misra-Gries** (``mg_candidates``):
   each input partition is summarized by a bounded frequency table of
   ``capacity`` entries (Arrow-batched ``mapInPandas``; state is one
   dict of at most ``capacity`` counters regardless of partition size).
   The MG invariant per partition p: every key's estimate undercounts
   its true partition count by at most ``D_p <= N_p/(capacity+1)``, and
   any key with partition count > ``D_p`` survives. Summed over
   partitions, any key with GLOBAL count > ``N/(capacity+1)`` must
   survive in at least one partition — so with
   ``capacity >= ceil(1/min_frac)`` the candidate set provably contains
   every key with frequency >= ``min_frac`` (NO false negatives; false
   positives are fine, the verify pass removes them). The exchange
   after this pass carries at most ``n_partitions * capacity`` rows —
   independent of both row count and key cardinality.

2. **Verify pass** — exact counts for candidates only: the candidate
   key set (small by construction) is **broadcast**, the corpus is
   semi-joined map-side (never shuffled), and the groupBy shuffles only
   rows whose key is a candidate, partially aggregated map-side.
   Output counts are EXACT, so the final ``>= threshold`` filter is
   exact: the result equals ``GROUP BY key HAVING count >= t`` — the
   DuckDB oracle in ``tests/test_heavyhitters.py`` — at a fraction of
   the shuffle.

The reference has no analogue (its hottest loop is a sequential
download queue); this extends the sketch suite
(``operators/sketches.py``) with the EXACT frequent-items shape that
CMS estimates can't provide (CMS gives a frequency for a key you name;
it cannot enumerate the heavy keys).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["mg_candidates", "heavy_hitters", "skew_profile"]


def _mg_shrink(counts: dict, capacity: int) -> None:
    """Misra-Gries decrement step: shrink ``counts`` to ``capacity``
    entries by subtracting the smallest value that zeroes out the
    excess (the batched form of 'decrement all by 1'). Mass removed is
    >= t*(len+1) per shrink of t, which preserves the classic bound:
    total decrement D <= N_partition / (capacity + 1)."""
    if len(counts) <= capacity:
        return
    vals = sorted(counts.values())
    t = vals[len(counts) - capacity - 1]
    dead = [k for k, v in counts.items() if v <= t]
    for k in dead:
        del counts[k]
    for k in counts:
        counts[k] -= t


def mg_candidates(df: DataFrame, key_col: str, capacity: int) -> DataFrame:
    """``[key, est_count]`` — per-partition Misra-Gries summaries, at
    most ``capacity`` rows per input partition. ``est_count`` is a
    LOWER bound on the key's count within its partition (undercount
    <= N_p/(capacity+1)); any key with global count > N/(capacity+1)
    is guaranteed to appear. Null keys are ignored (count them
    separately if they matter). The only state is one bounded dict —
    a 10^9-row partition summarizes in O(capacity) memory."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    field = df.schema[key_col]
    out_schema = T.StructType(
        [field, T.StructField("est_count", T.LongType(), False)]
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in batches:
            vc = pdf[key_col].dropna().value_counts()
            for k, v in vc.items():
                counts[k] = counts.get(k, 0) + int(v)
            _mg_shrink(counts, capacity)
        if counts:
            yield pd.DataFrame(
                {key_col: list(counts.keys()), "est_count": list(counts.values())}
            )

    return df.select(key_col).mapInPandas(summarize, out_schema)


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    *,
    min_frac: float | None = None,
    min_count: int | None = None,
    capacity: int | None = None,
) -> DataFrame:
    """EXACT ``[key, cnt]`` for every non-null key with
    ``cnt >= min_count`` (or ``cnt >= ceil(min_frac * N)``) — identical
    to ``GROUP BY key HAVING count >= t`` without shuffling the key
    space. Give exactly one of ``min_frac`` / ``min_count``.

    ``capacity`` defaults to ``ceil(2 / min_frac)`` (the 2x slack keeps
    candidate estimates comfortably above the per-partition decrement
    noise; correctness only needs ``> 1/min_frac``). With ``min_count``
    the default is derived from the total the same way. Oversizing
    capacity only grows the (tiny) candidate exchange.

    Plan shape: candidate exchange <= n_partitions * capacity rows; the
    corpus-side verify is a broadcast semi-join (zero corpus shuffle)
    + map-side partial count on candidate keys only.
    """
    if (min_frac is None) == (min_count is None):
        raise ValueError("give exactly one of min_frac / min_count")
    if min_frac is not None and not 0.0 < min_frac <= 1.0:
        raise ValueError(f"min_frac must be in (0, 1], got {min_frac}")
    if min_count is not None and min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")

    from tilegrab_spark.operators.dedup import _with_min_parallelism

    df = _with_min_parallelism(df)  # single-file scan -> serial MG otherwise
    total = df.filter(F.col(key_col).isNotNull()).count()
    if total == 0:
        return (
            df.select(key_col)
            .limit(0)
            .withColumn("cnt", F.lit(0).cast("long"))
        )
    threshold = min_count if min_count is not None else int(math.ceil(min_frac * total))
    threshold = max(threshold, 1)
    if capacity is None:
        # guarantee needs capacity + 1 > total/threshold
        capacity = max(1, int(math.ceil(2.0 * total / threshold)))

    cand = mg_candidates(df, key_col, capacity).select(key_col).distinct()
    exact = (
        df.join(F.broadcast(cand), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return exact.filter(F.col("cnt") >= threshold)


def skew_profile(
    df: DataFrame, key_col: str, *, min_frac: float = 0.01, top: int = 20
) -> DataFrame:
    """``[key, cnt, frac]`` for the ``top`` heaviest keys at or above
    ``min_frac`` — the skew diagnosis that decides which join keys to
    salt (feed the key list to ``image_join``'s skew handling or salt
    manually). Exact, ordered heaviest-first."""
    total = df.filter(F.col(key_col).isNotNull()).count()
    hh = heavy_hitters(df, key_col, min_frac=min_frac)
    return (
        hh.withColumn("frac", F.col("cnt") / F.lit(float(max(total, 1))))
        .orderBy(F.desc("cnt"), F.col(key_col))
        .limit(top)
    )
