"""Mergeable distinct-count sketches (HyperLogLog) — pure Catalyst.

"How many distinct URLs / tokens / users are in this 100 TB table, per
group?" is the canonical corpus-accounting question; exact
``countDistinct`` shuffles every distinct key. An HLL register table is
a fixed 2^p-row summary per group that (a) answers the question within
~1.04/sqrt(2^p) relative error, (b) MERGES across partitions, days and
tables by a plain ``MAX`` per bucket — the shape a daily-ingest pipeline
persists and rolls up, never rescanning history.

Everything here is built from JVM-side expressions (md5, conv,
shift/bit ops) — no Python in the hot path, and the whole computation
is re-derivable in ANSI SQL, which the ``hll_register_summary`` contract
oracle does end-to-end (bucket, rho, harmonic sum re-computed in DuckDB
from the same md5-low-8 hash contract as `dedup._stable_hash64`).

Design notes for the 100 TB case:
- one shuffle on (group, bucket): partial ``MAX(rho)`` combines
  map-side, so the exchange carries at most |groups| * 2^p rows
  regardless of input size;
- the register table is the persistable artifact: unioning two register
  tables and re-aggregating MAX(rho) is EXACTLY the sketch of the
  unioned inputs (`test_sketches.py::test_merge_is_exact`), so
  incremental ingest never touches old raw data;
- rho uses the TRAILING-zero rank of the non-bucket hash bits
  (Flajolet-Martin orientation). For uniform hash bits this is
  distributionally identical to the leading-zero form and is exactly
  expressible in portable SQL as ``bit_count((w & -w) - 1) + 1``.

The reference has no sketch analogue (it enumerates eagerly; see
/root/reference/src/tilegrab/tiles/collection.py); this is part of the
training-data operator suite from the driver brief.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "hll_registers",
    "hll_summary",
    "hll_distinct",
    "hll_merge",
    "kmv_sketch",
    "kmv_estimate",
    "kmv_merge",
    "kmv_set_estimates",
]

#: scale exponent for the integer harmonic sum: each register contributes
#: ``2^(HARM_SCALE - rho)`` (0 when rho > HARM_SCALE — a deterministic
#: truncation both engines apply identically; a rho that deep implies a
#: cardinality far beyond the estimator's range anyway).
HARM_SCALE = 40


def _hash_cols(key_col: str, p: int):
    """(bucket, rho) expressions under the md5-low-8 contract.

    The 64-bit hash is the big-endian first 8 bytes of md5(utf8(key)) —
    the same value ``dedup._stable_hash64`` produces in Python and the
    DuckDB oracles produce as ``('0x' || substr(md5(s),1,16))::UBIGINT``.
    Low ``p`` bits pick the bucket; the remaining 64-p bits (zero-filled
    shift) feed the trailing-zero rank.
    """
    hexd = F.md5(F.encode(F.col(key_col).cast("string"), "UTF-8"))
    hi = F.conv(F.substring(hexd, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hexd, 9, 8), 16, 10).cast("long")
    full = F.shiftleft(hi, 32).bitwiseOR(lo)
    bucket = lo.bitwiseAND(F.lit((1 << p) - 1)).cast("int")
    w = F.shiftrightunsigned(full, p)
    rho = (
        F.when(w == 0, F.lit(64 - p + 1))
        .otherwise(F.bit_count((w.bitwiseAND(-w)) - F.lit(1)) + F.lit(1))
        .cast("int")
    )
    return bucket, rho


def hll_registers(
    df: DataFrame,
    *,
    key_col: str,
    group_cols: Sequence[str] = (),
    p: int = 12,
) -> DataFrame:
    """Sparse HLL register table: one row per (group, occupied bucket)
    with the max rank — ``[*group_cols, bucket:int, rho:int]``.

    This is the mergeable/persistable artifact (absent buckets mean
    rho=0). One shuffle; map-side partial MAX keeps the exchange at
    ≤ |groups|·2^p rows. NULL keys are ignored (SQL COUNT DISTINCT
    semantics).
    """
    if not 4 <= p <= 26:
        raise ValueError(f"p must be in [4, 26], got {p}")
    gcols = list(group_cols)
    bucket, rho = _hash_cols(key_col, p)
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*gcols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*gcols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame, *, group_cols: Sequence[str] = ()) -> DataFrame:
    """Merge two register tables built with the same ``p`` (union +
    per-bucket MAX). Exactly equals the sketch of the unioned inputs."""
    gcols = list(group_cols)
    return (
        a.unionByName(b)
        .groupBy(*gcols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_summary(
    registers: DataFrame,
    *,
    group_cols: Sequence[str] = (),
    p: int = 12,
) -> DataFrame:
    """Collapse a register table to per-group scalars:

    - ``zeros`` (long) — empty buckets,
    - ``sum_rho`` (long) — diagnostic register mass,
    - ``harm_s40`` (long) — the harmonic denominator as an exact integer
      at scale 2^40 (empty buckets contribute 2^40 each), so the whole
      sketch state is integer-reproducible by an independent engine,
    - ``n_distinct_est`` (double) — the HLL estimate with the standard
      small-range (linear counting) correction.

    The tiny second aggregation (≤ 2^p rows per group in, 1 out).
    """
    m = 1 << p
    gcols = list(group_cols)
    harm_term = F.expr(
        f"CASE WHEN rho <= {HARM_SCALE} THEN shiftleft(1L, {HARM_SCALE} - rho) "
        "ELSE 0L END"
    )
    agg = registers.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("_nb"),
        F.sum("rho").cast("long").alias("sum_rho"),
        F.sum(harm_term).cast("long").alias("_harm_nz"),
    )
    zeros = (F.lit(m) - F.col("_nb")).cast("long")
    harm = (F.col("_harm_nz") + zeros * F.lit(1 << HARM_SCALE)).cast("long")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = F.lit(alpha * m * m * float(1 << HARM_SCALE)) / F.col("harm_s40").cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("zeros") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros").cast("double")),
    ).otherwise(raw)
    return (
        agg.withColumn("zeros", zeros)
        .withColumn("harm_s40", harm)
        .withColumn("n_distinct_est", est)
        .select(*gcols, "zeros", "sum_rho", "harm_s40", "n_distinct_est")
    )


def hll_distinct(
    df: DataFrame,
    *,
    key_col: str,
    group_cols: Sequence[str] = (),
    p: int = 12,
) -> DataFrame:
    """Per-group approximate COUNT(DISTINCT key) in two aggregations —
    see ``hll_registers`` / ``hll_summary``."""
    return hll_summary(
        hll_registers(df, key_col=key_col, group_cols=group_cols, p=p),
        group_cols=group_cols,
        p=p,
    )


def hll_error_bound(p: int) -> float:
    """The sketch's standard relative error, 1.04 / sqrt(2^p)."""
    return 1.04 / math.sqrt(1 << p)
