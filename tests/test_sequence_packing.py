"""Sequence packing: python FFD oracle parity, capacity/oversize
invariants, partition/AQE invariance, and padding-rate sanity."""

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.packing import (
    pack_sequences,
    range_bucket_boundaries,
    sequence_manifest,
)

L = 100


def _docs(spark, n=200, seed=3):
    import random

    rng = random.Random(seed)
    rows = [(i, rng.choice([5, 9, 17, 33, 48, 60, 95, 130])) for i in range(n)]
    return rows, spark.createDataFrame(rows, "doc_id long, n_tokens int")


def _oracle(rows, boundaries, L=L):
    """Independent python recompute: same bucketing, same FFD order."""
    import bisect

    out = {}
    buckets: dict = {}
    for i, t in rows:
        # _bucket_expr counts boundaries STRICTLY below the key
        b = bisect.bisect_left(boundaries, i)
        buckets.setdefault(b, []).append((i, t))
    for b, docs in buckets.items():
        base = b << 40
        fills, counts = [], []
        for i, t in sorted(docs, key=lambda r: (-r[1], r[0])):
            if t > L:
                fills.append(-1)
                counts.append(1)
                out[i] = (base + len(fills) - 1, 0, True)
                continue
            for k in range(len(fills)):
                if fills[k] >= t:
                    out[i] = (base + k, counts[k], False)
                    fills[k] -= t
                    counts[k] += 1
                    break
            else:
                fills.append(L - t)
                counts.append(1)
                out[i] = (base + len(fills) - 1, 0, False)
    return out


def test_matches_python_ffd_oracle(spark):
    rows, df = _docs(spark)
    bnd = range_bucket_boundaries(df, "doc_id", 4)
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_pos"], r["oversize"])
        for r in pack_sequences(
            df, id_col="doc_id", token_col="n_tokens", context_len=L,
            boundaries=bnd,
        ).collect()
    }
    assert got == _oracle(rows, bnd)


def test_capacity_and_oversize_invariants(spark):
    rows, df = _docs(spark, n=300, seed=11)
    packed = pack_sequences(
        df, id_col="doc_id", token_col="n_tokens", context_len=L, n_buckets=3
    )
    man = sequence_manifest(packed, token_col="n_tokens", context_len=L).collect()
    for r in man:
        if r["oversize"]:
            assert r["n_docs"] == 1 and r["fill_tokens"] > L
        else:
            assert r["fill_tokens"] <= L
    # every doc lands in exactly one sequence
    assert packed.count() == 300
    assert packed.select("doc_id").distinct().count() == 300
    # contiguous seq_pos within each sequence
    bad = (
        packed.groupBy("seq_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("seq_pos").alias("mx"))
        .filter(F.col("mx") != F.col("n") - 1)
        .count()
    )
    assert bad == 0


def test_partition_invariance(spark):
    rows, df = _docs(spark, n=150, seed=7)
    bnd = range_bucket_boundaries(df, "doc_id", 5)

    def run(d):
        return sorted(
            (r["doc_id"], r["seq_id"], r["seq_pos"])
            for r in pack_sequences(
                d, id_col="doc_id", token_col="n_tokens", context_len=L,
                boundaries=bnd,
            ).collect()
        )

    assert run(df.repartition(1)) == run(df.repartition(13)) == run(df.coalesce(2))


def test_padding_rate_beats_one_doc_per_context(spark):
    rows, df = _docs(spark, n=400, seed=5)
    small = [t for _, t in rows if t <= L]
    packed = pack_sequences(
        df, id_col="doc_id", token_col="n_tokens", context_len=L, n_buckets=2
    )
    man = sequence_manifest(packed, token_col="n_tokens", context_len=L)
    agg = man.filter(~F.col("oversize")).agg(
        F.sum("waste_tokens").alias("w"), F.count(F.lit(1)).alias("n")
    ).first()
    packed_rate = agg["w"] / (agg["n"] * L)
    naive_rate = sum(L - t for t in small) / (len(small) * L)
    assert packed_rate < naive_rate / 3  # FFD crushes one-doc-per-context


def test_validation(spark):
    _, df = _docs(spark, n=5)
    with pytest.raises(ValueError, match="context_len"):
        pack_sequences(df, id_col="doc_id", token_col="n_tokens", context_len=0)
    with pytest.raises(ValueError, match="ascending"):
        pack_sequences(
            df, id_col="doc_id", token_col="n_tokens", context_len=10,
            boundaries=[5, 5],
        )
