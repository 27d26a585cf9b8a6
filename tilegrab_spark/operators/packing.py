"""Deterministic shard packing — the training-export layout step.

A 100 TB corpus is consumed by trainers as fixed-size shards (the
webdataset/tfrecord shape: ~shard_bytes of samples per file, readable
independently, deterministic membership so a re-run resumes/re-ships the
same shards). Assigning rows to shards is a PREFIX SUM over a global
order — the naive Spark form (one Window over everything) collapses to a
single task and dies at scale.

``pack_shards`` computes the same assignment with the classic
distributed two-level scan:

1. assign each row a range BUCKET by comparing its (unique) order key
   against boundaries computed ONCE on the driver from a seeded sample —
   the bucket id is a pure function of the key, so every sub-plan that
   re-derives it agrees by construction (no reliance on Spark exchange
   reuse, AQE replanning, or ``spark_partition_id`` stability — the
   nondeterminism class that made the repartitionByRange formulation of
   this operator flaky);
2. per-bucket local running totals (a window WITHIN each bucket —
   parallel, no global collapse);
3. per-bucket totals (one tiny row per bucket) prefix-summed with a
   window over that TINY frame and broadcast-joined back.

Every row's global byte offset = bucket offset + local running total,
all relational, no driver loop over data. The only driver-side work is
one ``count()`` and one bounded boundary-sample collect (≤ ~128 keys
per bucket). Output is a pure function of the input rows: independent
of input partitioning, AQE, ``spark.sql.shuffle.partitions``, and task
retries. A row lands in the shard containing its START offset
(``offset DIV shard_bytes``) — rows larger than ``shard_bytes`` occupy
their own shard span, never split.

The reference has no analogue (it writes one file per tile); this is
part of the training-data operator suite from the driver brief.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "pack_shards",
    "shard_manifest",
    "range_bucket_boundaries",
    "pack_sequences",
    "grouped_rank",
    "aspect_bucket_batches",
    "sequence_manifest",
]

# Sample keys per bucket when deriving boundaries — 128 gives equal-
# frequency cuts within a few percent of exact, which only affects
# balance, never correctness (offsets are boundary-invariant).
_OVERSAMPLE = 128


def range_bucket_boundaries(
    df: DataFrame,
    order_col: str,
    n_buckets: int,
    *,
    seed: int = 42,
) -> list:
    """Compute ``n_buckets - 1`` ascending cut keys for ``order_col`` by
    equal-frequency cuts over a seeded sample, collected once on the
    driver. Works for any orderable column type (ints, strings, Morton
    keys). The sample size is bounded at ``n_buckets * 128`` expected
    keys, so the collect is tiny regardless of table size."""
    n = df.count()
    if n == 0 or n_buckets <= 1:
        return []
    target = n_buckets * _OVERSAMPLE
    fraction = min(1.0, target / n)
    keys = sorted(
        r[0]
        for r in df.select(order_col).sample(False, fraction, seed=seed).collect()
        if r[0] is not None
    )
    if not keys:
        return []
    cuts = []
    for i in range(1, n_buckets):
        cut = keys[min(len(keys) - 1, (i * len(keys)) // n_buckets)]
        if not cuts or cut > cuts[-1]:
            cuts.append(cut)
    return cuts


def _bucket_expr(order_col: str, boundaries: Sequence) -> Column:
    """Bucket id = number of boundaries strictly below the key — a pure
    deterministic expression (chained comparisons, whole-stage codegen).
    O(len(boundaries)) per row; boundary counts track cluster
    parallelism (hundreds to low thousands), not data size."""
    b: Column = F.lit(0)
    for cut in boundaries:
        b = b + F.when(F.col(order_col) > F.lit(cut), F.lit(1)).otherwise(F.lit(0))
    return b


def pack_shards(
    df: DataFrame,
    *,
    size_col: str,
    order_col: str,
    shard_bytes: int,
    n_buckets: Optional[int] = None,
    boundaries: Optional[Sequence] = None,
) -> DataFrame:
    """Assign each row a ``shard_id`` + ``start_offset`` by packing rows
    in ``order_col`` order into ``shard_bytes``-sized shards.

    ``order_col`` must be a unique key (doc ids, image ids, Morton keys —
    the natural export orders all are): uniqueness is what makes the
    assignment a pure function of the data, independent of partitioning.
    Output: input columns + ``start_offset`` (global byte offset of the
    row, 0-based) + ``shard_id`` (``start_offset DIV shard_bytes``).

    ``boundaries`` (optional, ascending) lets callers supply precomputed
    range cuts (e.g. reused across epochs of the same corpus); otherwise
    they are derived once on the driver via
    :func:`range_bucket_boundaries`. Either way the bucket assignment is
    a deterministic expression over ``order_col``, so the output is
    byte-identical across runs, AQE settings, and shuffle-partition
    counts.
    """
    if shard_bytes <= 0:
        raise ValueError(f"shard_bytes must be positive, got {shard_bytes}")
    if boundaries is None:
        if n_buckets is None:
            n_buckets = max(int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")), 1)
        boundaries = range_bucket_boundaries(df, order_col, n_buckets)
    else:
        boundaries = list(boundaries)
        if any(boundaries[i] >= boundaries[i + 1] for i in range(len(boundaries) - 1)):
            raise ValueError("boundaries must be strictly ascending")
    bucketed = df.withColumn("_bkt", _bucket_expr(order_col, boundaries))
    # 2. local inclusive running total per bucket (parallel windows)
    local_w = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn(
        "_local_end", F.sum(F.col(size_col).cast("long")).over(local_w)
    )
    # 3. exclusive prefix over the per-bucket totals — one row per
    # bucket, so the single-task window is over a frame of size
    # O(num buckets), not O(rows); broadcast it back. Both this branch
    # and the probe side recompute `_bkt` from the same literal
    # boundaries, so they agree even without exchange reuse.
    totals = bucketed.groupBy("_bkt").agg(
        F.sum(F.col(size_col).cast("long")).alias("_tot")
    )
    off_w = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_boff", F.coalesce(F.sum("_tot").over(off_w), F.lit(0))
    ).select("_bkt", "_boff")
    out = (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "start_offset",
            F.col("_boff") + F.col("_local_end") - F.col(size_col).cast("long"),
        )
        .withColumn("shard_id", F.expr(f"start_offset DIV {int(shard_bytes)}"))
        .drop("_bkt", "_local_end", "_boff")
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


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str,
    token_col: str,
    context_len: int,
    n_buckets: Optional[int] = None,
    boundaries: Optional[Sequence] = None,
) -> DataFrame:
    """Sequence packing — bin documents into fixed ``context_len``-token
    training sequences (the pretraining batch-assembly step: concatenate
    short documents so ~every context is full instead of padded).

    Output: input columns + ``seq_id`` (long, globally unique) +
    ``seq_pos`` (0-based slot of the doc within its sequence) +
    ``oversize`` (doc longer than the context: it gets a sequence of its
    own, flagged — truncation policy belongs to the trainer, not the
    packer).

    Distribution and determinism use the same recipe as
    :func:`pack_shards`: documents are range-bucketed by the unique
    ``id_col`` against driver-derived literal boundaries (bucket = pure
    function of the id), and each bucket runs first-fit-decreasing in
    one Arrow-grouped pass — so the packing is byte-identical across
    partitionings, AQE settings and retries, and resumable exports
    re-ship the same sequences. FFD is applied PER BUCKET: each bucket
    independently carries the FFD guarantee (<= 11/9 OPT + 1 bins), and
    cross-bucket waste stays bounded because every bucket but its last
    open bins are near-full; global-optimal packing would serialize the
    corpus and is not the trade a 10^12-row export wants.

    Cost note: the in-bucket first-fit scan is O(docs x open bins); size
    ``n_buckets`` so a bucket holds ~10^4-10^5 docs (open-bin counts stay
    small because decreasing order closes bins quickly). Buckets are
    independent tasks — more buckets = more parallelism AND cheaper FFD.
    """
    import pandas as pd

    if context_len <= 0:
        raise ValueError(f"context_len must be positive, got {context_len}")
    if boundaries is None:
        if n_buckets is None:
            n_buckets = max(
                int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")),
                1,
            )
        boundaries = range_bucket_boundaries(df, id_col, n_buckets)
    else:
        boundaries = list(boundaries)
        if any(boundaries[i] >= boundaries[i + 1] for i in range(len(boundaries) - 1)):
            raise ValueError("boundaries must be strictly ascending")
    bucketed = df.withColumn("_bkt", _bucket_expr(id_col, boundaries))

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("seq_id", T.LongType(), False),
            T.StructField("seq_pos", T.IntegerType(), False),
            T.StructField("oversize", T.BooleanType(), False),
        ]
    )

    L = int(context_len)

    def ffd(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bkt = int(key[0])
        base = bkt << 40
        p = pdf.sort_values(
            [token_col, id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        fills: list = []   # remaining capacity per open bin
        counts: list = []  # docs placed per bin
        seq_ids, seq_poss, overs = [], [], []
        for tok in p[token_col].astype("int64"):
            t = int(tok)
            if t > L:
                fills.append(-1)  # oversize bin: never reused
                counts.append(1)
                seq_ids.append(base + len(fills) - 1)
                seq_poss.append(0)
                overs.append(True)
                continue
            placed = False
            for b in range(len(fills)):
                if fills[b] >= t:
                    seq_ids.append(base + b)
                    seq_poss.append(counts[b])
                    overs.append(False)
                    fills[b] -= t
                    counts[b] += 1
                    placed = True
                    break
            if not placed:
                fills.append(L - t)
                counts.append(1)
                seq_ids.append(base + len(fills) - 1)
                seq_poss.append(0)
                overs.append(False)
        p["seq_id"] = pd.Series(seq_ids, dtype="int64")
        p["seq_pos"] = pd.Series(seq_poss, dtype="int32")
        p["oversize"] = pd.Series(overs, dtype="bool")
        return p.drop(columns=["_bkt"])

    return bucketed.groupBy("_bkt").applyInPandas(ffd, out_schema)


def sequence_manifest(packed: DataFrame, *, token_col: str, context_len: int) -> DataFrame:
    """Per-sequence rollup of a :func:`pack_sequences` output:
    ``[seq_id, n_docs, fill_tokens, waste_tokens, oversize]`` — the
    padding-efficiency report (sum(waste)/sum(L) is the padding rate a
    trainer would eat)."""
    return packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("fill_tokens"),
        F.greatest(
            F.lit(0).cast("long"),
            F.lit(int(context_len)) - F.sum(F.col(token_col).cast("long")),
        ).alias("waste_tokens"),
        F.max("oversize").alias("oversize"),
    )


def grouped_rank(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    *,
    rank_col: str = "rank",
    n_buckets: Optional[int] = None,
    boundaries: Optional[Sequence] = None,
) -> DataFrame:
    """1-based rank of each row WITHIN its key group, ordered by the
    (unique) ``order_col`` — without the per-key single-task Window
    that sinks ``row_number() OVER (PARTITION BY key)`` at scale when
    keys are few and fat (40 aspect buckets x 10^12 rows = 40 tasks).

    Same two-level scan as :func:`pack_shards`, generalized per key:
    range-chunk the order key with driver-derived boundaries (chunk id
    is a pure expression, deterministic across runs/AQE), count rows
    per (chunk, key) — a tiny frame — prefix-sum those counts per key
    with a window over that tiny frame, and add the within-chunk rank
    (a Window partitioned by (chunk, key): parallelism = chunks x
    keys, each task bounded by chunk size). Output = input columns +
    ``rank_col``.

    Fit: FEW fat keys (aspect buckets, language buckets — tens to
    thousands). The offsets broadcast is chunks x keys rows; at very
    high key cardinality use a plain per-key Window instead (keys are
    small there, so the partition-collapse hazard this function exists
    to avoid does not apply)."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty; use a constant key for global rank")
    if boundaries is None:
        if n_buckets is None:
            n_buckets = max(
                int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")), 1
            )
        boundaries = range_bucket_boundaries(df, order_col, n_buckets)
    local = df.withColumn("_rb", _bucket_expr(order_col, boundaries))
    counts = local.groupBy("_rb", *keys).agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = (
        Window.partitionBy(*keys)
        .orderBy("_rb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_rb", *keys, F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_koff")
    )
    w_loc = Window.partitionBy("_rb", *keys).orderBy(order_col)
    ranked = (
        local.join(F.broadcast(offsets), on=["_rb", *keys])
        .withColumn(rank_col, (F.col("_koff") + F.row_number().over(w_loc)).cast("long"))
        .drop("_rb", "_koff")
    )
    return ranked


def aspect_bucket_batches(
    df: DataFrame,
    buckets: Sequence[tuple],
    *,
    batch_size: int,
    order_col: str,
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Aspect-ratio bucketing + deterministic batch assembly — the
    image-training sibling of :func:`pack_sequences` (the SDXL-style
    bucketing recipe: group images by nearest aspect bucket so a batch
    resizes to one shape with minimal distortion, then cut each bucket
    into fixed-size batches in a stable order).

    ``buckets``: [(bw, bh), ...]. Assignment = argmin over
    ``|ln(w/h) - ln(bw/bh)|``, ties to the earliest bucket — computed
    as a pure Catalyst ``array_min`` over a literal struct array (no
    join, no UDF, whole-stage codegen). Batching = ``grouped_rank``
    per bucket (scale note there) and ``batch_id = (rank-1) DIV
    batch_size``; ``batch_full`` marks complete batches (the ragged
    tail per bucket is kept and flagged, a trainer can drop or pad).
    Output = input + [bucket_id, bucket_w, bucket_h, rank, batch_id,
    batch_full]. ``order_col`` must be unique (pack_shards contract) —
    output is byte-identical across runs and partitionings."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    bl = [(int(bw), int(bh)) for bw, bh in buckets]
    if not bl or any(bw <= 0 or bh <= 0 for bw, bh in bl):
        raise ValueError(f"buckets must be non-empty positive (w, h) pairs, got {buckets!r}")
    import math as _math

    la = F.log(F.col(w_col).cast("double") / F.col(h_col).cast("double"))
    cand = F.array(
        *[
            F.struct(
                F.abs(la - F.lit(_math.log(bw / bh))).alias("d"),
                F.lit(i).alias("i"),
            )
            for i, (bw, bh) in enumerate(bl)
        ]
    )
    best = F.array_min(cand)
    assigned = df.withColumn("bucket_id", best["i"])
    bw_arr = F.array(*[F.lit(bw) for bw, _ in bl])
    bh_arr = F.array(*[F.lit(bh) for _, bh in bl])
    assigned = assigned.withColumn(
        "bucket_w", F.element_at(bw_arr, F.col("bucket_id") + 1)
    ).withColumn("bucket_h", F.element_at(bh_arr, F.col("bucket_id") + 1))
    ranked = grouped_rank(assigned, ["bucket_id"], order_col, rank_col="rank")
    totals = ranked.groupBy("bucket_id").agg(F.count(F.lit(1)).alias("_btot"))
    out = (
        ranked.join(F.broadcast(totals), on="bucket_id")
        .withColumn(
            "batch_id", ((F.col("rank") - 1) / batch_size).cast("long")
        )
        .withColumn(
            "batch_full",
            F.col("batch_id") < F.floor(F.col("_btot") / batch_size),
        )
        .drop("_btot")
    )
    return out
