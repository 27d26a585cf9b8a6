"""Distributed Bloom filter — the fixed-size membership sketch that
turns "is this key in that other 10^12-row table?" into a map-side
bitmask test (Bloom 1970).  The pipeline uses it as a PREFILTER: an
incremental dedup/decontamination batch probes the historical key set
without joining it, and only the (rare) maybe-present keys pay the
exact verify join.

Representation: a relational register table ``[*group_cols, word_idx,
bits]`` — ``m_bits`` packed into int64 words, one row per non-zero
word.  Hash contract: position ``j`` of a key is ``md5_60(key || salt
|| j) % m_bits`` (the suite's engine-independent md5 contract — an
external engine re-derives every bit; the contract row pins the full
register table in DuckDB).

Shape notes for scale (the 100 TB argument):
- **Build is one map-side-combinable aggregation**: keys explode to k
  position rows (scalars, never payloads), ``bit_or`` partials
  collapse per partition, and the exchange is bounded by
  ``groups x m_bits/64`` rows — fixed size, independent of row count.
  Merging two filters of the same shape is the same ``bit_or``.
- **Probe never shuffles the sketch**: the register table (MBs even
  for billions of keys at 1% fpp) broadcasts; probe keys explode to k
  (word_idx, mask) rows, hit the broadcast map, and collapse back with
  a map-side-combined count — the one exchange is probe-sized.
- False positives only, never false negatives: ``bloom_anti_join``
  (definitely-absent rows) is EXACT; ``maybe_present`` rows go to the
  caller's exact verify.

The reference has no analogue; part of the training-data operator
suite from the driver brief.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from tilegrab_spark.operators.sampling import sample_hash

__all__ = [
    "bloom_parameters",
    "bloom_build",
    "bloom_merge",
    "bloom_probe",
    "bloom_anti_join",
]


def bloom_parameters(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard sizing: ``(m_bits, k_hashes)`` for an expected item
    count at a target false-positive rate.  ``m_bits`` is rounded up
    to a multiple of 64 (whole words)."""
    if n_items < 1:
        raise ValueError(f"n_items must be >= 1, got {n_items}")
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _position_cols(key, m_bits: int, k_hashes: int, salt: str):
    return [
        (sample_hash(key, f"{salt}{j}") % m_bits).alias(f"_p{j}")
        for j in range(k_hashes)
    ]


def _validate(m_bits: int, k_hashes: int) -> tuple[int, int]:
    m_bits, k_hashes = int(m_bits), int(k_hashes)
    if m_bits < 64 or m_bits % 64:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    return m_bits, k_hashes


def bloom_build(
    df: DataFrame,
    key_col: str,
    *,
    m_bits: int,
    k_hashes: int,
    salt: str = "bloom",
    group_cols: tuple = (),
) -> DataFrame:
    """``[*group_cols, word_idx, bits]`` register table over the
    distinct keys of ``df`` (per group with ``group_cols``).  Null
    keys are ignored (they have no membership semantics)."""
    m_bits, k_hashes = _validate(m_bits, k_hashes)
    pos = (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, *_position_cols(F.col(key_col), m_bits, k_hashes, salt))
        .select(
            *group_cols,
            F.explode(F.array(*[F.col(f"_p{j}") for j in range(k_hashes)])).alias(
                "_pos"
            ),
        )
    )
    return (
        pos.select(
            *group_cols,
            F.shiftright("_pos", 6).cast("int").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").alias(
                "_mask"
            ),
        )
        .groupBy(*group_cols, "word_idx")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame, *, group_cols: tuple = ()) -> DataFrame:
    """Union of two filters BUILT WITH THE SAME (m_bits, k_hashes,
    salt) — the caller owns that contract (register tables carry no
    parameters)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    sketch: DataFrame,
    key_col: str,
    *,
    m_bits: int,
    k_hashes: int,
    salt: str = "bloom",
    out_col: str = "maybe_present",
) -> DataFrame:
    """``df`` + boolean ``out_col``: False means DEFINITELY absent from
    the filtered key set; True means present-or-false-positive (route
    to an exact verify).  The sketch broadcasts; the one exchange is
    probe-sized (see module docstring)."""
    m_bits, k_hashes = _validate(m_bits, k_hashes)
    key = F.col(key_col)
    probes = (
        df.select(key.alias("_k"))
        .distinct()
        .select("_k", *_position_cols(F.col("_k"), m_bits, k_hashes, salt))
        .select(
            "_k",
            F.explode(F.array(*[F.col(f"_p{j}") for j in range(k_hashes)])).alias(
                "_pos"
            ),
        )
        .select(
            "_k",
            F.shiftright("_pos", 6).cast("int").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").alias(
                "_mask"
            ),
        )
    )
    hits = (
        probes.join(F.broadcast(sketch.select("word_idx", "bits")), "word_idx", "left")
        .select(
            "_k",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_mask")) != 0
            ).cast("int").alias("_hit"),
        )
        .groupBy("_k")
        .agg((F.sum("_hit") == k_hashes).alias(out_col))
    )
    return df.join(hits, df[key_col] == hits["_k"], "left").drop("_k")


def bloom_anti_join(
    df: DataFrame,
    sketch: DataFrame,
    key_col: str,
    *,
    m_bits: int,
    k_hashes: int,
    salt: str = "bloom",
) -> DataFrame:
    """Rows of ``df`` whose key is DEFINITELY not in the filtered set
    (exact — Bloom filters have no false negatives).  Null keys pass
    through (they were never inserted)."""
    probed = bloom_probe(
        df, sketch, key_col,
        m_bits=m_bits, k_hashes=k_hashes, salt=salt, out_col="_maybe",
    )
    return probed.filter(
        F.col(key_col).isNull() | ~F.coalesce(F.col("_maybe"), F.lit(False))
    ).drop("_maybe")
