"""Connected components vs a pure-python union-find oracle, and the
stateful streaming rollup."""

import numpy as np
from pyspark.sql import functions as F

from tilegrab_spark.operators.components import (
    connected_components,
    dedup_by_components,
)


def _uf_oracle(pairs):
    parent = {}

    def find(a):
        parent.setdefault(a, a)
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_vs_union_find(spark):
    rng = np.random.default_rng(11)
    # several chains + a star + isolated pairs
    pairs = [(i, i + 1) for i in range(0, 20, 1)]          # one long chain 0..20
    pairs += [(100, 100 + i) for i in range(1, 8)]          # star at 100
    pairs += [(1000 + 2 * i, 1001 + 2 * i) for i in range(10)]  # pairs
    pairs += [(int(a), int(b)) for a, b in rng.integers(2000, 2050, (30, 2)) if a != b]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    want = _uf_oracle(pairs)
    assert got == want


def test_dedup_by_components_transitive(spark):
    # A~B, B~C: transitive closure must drop B AND C
    docs = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c"), (9, "z")], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    kept = sorted(r.doc_id for r in dedup_by_components(docs, pairs).collect())
    assert kept == [1, 9]


def test_stream_cell_stats_stateful(spark, tmp_path):
    from tilegrab_spark.sources.images import write_synthetic_image_table
    from tilegrab_spark.streaming.stateful import stream_cell_stats

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "stats")
    write_synthetic_image_table(
        spark, landing, [(16, 1, 1, 0), (16, 1, 1, 1), (16, 2, 2, 0)], n_buckets=2
    )
    q = stream_cell_stats(spark, landing, ckpt, out_dir)
    q.awaitTermination(120)
    out = {(r.x, r.y): r for r in spark.read.parquet(out_dir).collect()}
    assert out[(1, 1)].n_images == 2 and out[(2, 2)].n_images == 1
    assert out[(1, 1)].total_bytes > 0

    # second drop: GroupState recovers from the checkpoint across a
    # restarted query; only the updated cell is emitted, with the running
    # count continuing from prior state
    write_synthetic_image_table(
        spark, landing, [(16, 1, 1, 2)], n_buckets=2, mode="append"
    )
    q2 = stream_cell_stats(spark, landing, ckpt, out_dir)
    q2.awaitTermination(120)
    df = spark.read.parquet(out_dir)
    latest_batch = df.agg(F.max("batch_id")).collect()[0][0]
    out2 = {(r.x, r.y): r for r in df.filter(F.col("batch_id") == latest_batch).collect()}
    assert list(out2) == [(1, 1)]
    assert out2[(1, 1)].n_images == 3


def test_long_chain_converges_within_log_rounds(spark):
    """A 3000-node chain (worst-case diameter for naive min-propagation,
    which would need 3000 rounds and silently return WRONG labels at
    max_iter=20) converges exactly with pointer jumping."""
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.components import connected_components

    n = 3000
    edges = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    out = connected_components(edges, max_iter=20).collect()
    assert len(out) == n
    assert all(r.component == 0 for r in out)


def test_driver_cutoff_parity_and_probe_bound(spark):
    """The driver union-find shortcut returns exactly the distributed
    labeling; above the cutoff the probe falls through to the
    distributed rounds (same result either way)."""
    import numpy as np
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.components import connected_components

    rng = np.random.default_rng(17)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 400, (600, 2))
        if a != b
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {r.node: r.component for r in connected_components(df, driver_cutoff=10_000).collect()}
    slow = {r.node: r.component for r in connected_components(df, driver_cutoff=0).collect()}
    assert fast == slow
    # cutoff smaller than the edge list: the probe must NOT truncate —
    # it falls through to the distributed path and still matches
    over = {r.node: r.component for r in connected_components(df, driver_cutoff=10).collect()}
    assert over == slow


def test_dedup_by_components_keep_by_quality(spark):
    """keep_by keeps the highest-quality cluster member, ties to the
    smaller id; out-of-cluster rows always survive."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, q) for i, q in [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (9, 0.1)]],
        "doc_id long, quality double",
    )
    # cluster {1,2,3} via transitivity; {4} alone in a pair with itself? no: {4} unpaired
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    kept = sorted(
        r.doc_id
        for r in dedup_by_components(docs, pairs, keep_by="quality").collect()
    )
    # winner of {1,2,3}: quality 0.9 tie between 2 and 3 -> smaller id 2;
    # 4 and 9 are outside any cluster and survive
    assert kept == [2, 4, 9]
    # default min-id rule unchanged
    kept_min = sorted(r.doc_id for r in dedup_by_components(docs, pairs).collect())
    assert kept_min == [1, 4, 9]
