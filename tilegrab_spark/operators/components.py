"""Connected components over a pair/edge list — the clustering step that
turns near-duplicate PAIRS (minhash/simhash/jaccard output) into
duplicate GROUPS. Iterative label propagation ("small-star" style): every
node repeatedly adopts the minimum label in its neighborhood until no
label changes. Each iteration is two shuffles; convergence is checked
with a cheap aggregate — the standard Spark shape for iterative graph
algorithms (driver loop, distributed rounds).

At 10^12-row scale the pair list is the (much smaller) output of LSH
banding, so the iteration cost is bounded by true-duplicate density, not
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    *,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 20,
    driver_cutoff: int = 0,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    ``component`` = min node id of its connected component.

    ``driver_cutoff`` > 0 enables the standard small-graph hybrid: a
    ``limit(cutoff + 1).collect()`` probe (bounded driver memory even
    against a huge pair list) and, when the whole edge set fits, one
    driver-side union-find instead of N distributed rounds — each round
    costs 2 shuffles + a convergence job of FIXED overhead, which
    dominates end-to-end time when the pair list is merge-pair-sized
    (e.g. polygonize's border runs) rather than corpus-sized. Above the
    cutoff the distributed pointer-jumping path runs unchanged."""
    if driver_cutoff > 0:
        probe = pairs.select(a_col, b_col).limit(driver_cutoff + 1).collect()
        if len(probe) <= driver_cutoff:
            parent: dict = {}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for r in probe:
                a, b = r[0], r[1]
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo  # min-id root ⇒ component = min node
            from pyspark.sql import types as T

            dt = pairs.schema[a_col].dataType
            schema = T.StructType(
                [T.StructField("node", dt), T.StructField("component", dt)]
            )
            rows = [(n, find(n)) for n in parent]
            return pairs.sparkSession.createDataFrame(rows, schema)
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    store = labels  # the persisted/checkpointed frame to release each round
    for _ in range(max_iter):
        # every node proposes min(own label, neighbors' labels)
        neigh = (
            edges.join(labels, edges.dst == labels.node)
            .select(F.col("src").alias("node"), "component")
        )
        merged = (
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # pointer jump (path doubling): adopt the label OF one's label.
        # Pure neighbor propagation converges in O(diameter) rounds — a
        # duplicate CHAIN of length L (the gaps-and-islands shape) would
        # need L rounds; one jump per round makes it O(log L). Every
        # label is some node's id, so the self-join always resolves.
        parent = merged.select(
            F.col("node").alias("_pnode"), F.col("component").alias("_pcomp")
        )
        jumped = (
            merged.join(parent, merged.component == F.col("_pnode"), "left")
            .select(
                "node",
                F.coalesce(F.col("_pcomp"), F.col("component")).alias("component"),
            )
        )
        # carry a did-this-node-change flag INTO the checkpointed frame:
        # the convergence check then reads the (already materialized)
        # checkpoint with one agg instead of re-joining new vs old
        # labels in a separate job per round
        flagged = (
            jumped.join(
                labels.select("node", F.col("component").alias("_old")), on="node"
            )
            .withColumn("_chg", (F.col("component") != F.col("_old")).cast("long"))
            .select("node", "component", "_chg")
        )
        # localCheckpoint truncates the plan lineage — without it each
        # round's plan embeds all previous rounds and the driver OOMs on
        # exponential plan growth (the standard iterative-algorithm trap)
        new_store = flagged.localCheckpoint()
        changed = new_store.agg(F.sum("_chg")).collect()[0][0]
        store.unpersist()
        store = new_store
        labels = new_store.select("node", "component")
        if not changed:
            break
    edges.unpersist()
    return labels


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    keep_by: str | None = None,
) -> DataFrame:
    """Keep one representative per duplicate CLUSTER — the transitive-
    closure version of lsh_dedup (A~B, B~C drops both B and C even if
    A~C was never emitted as a pair).

    ``keep_by=None`` keeps the min id (cheap: no extra join against
    ``df``). ``keep_by="quality"`` keeps the member with the HIGHEST
    value of that ``df`` column instead — the curation rule real
    pipelines want (keep the sharpest image / longest document of a
    near-dup cluster, not an arbitrary one); ties break to the smaller
    id, so the choice stays deterministic. Cost: one extra scalar join
    (component, id, keep_by) + one max_by per cluster — cluster-keyed
    rows only, never payloads."""
    comp = connected_components(pairs)
    if keep_by is None:
        losers = comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias(id_col)
        )
        return df.join(losers, on=id_col, how="left_anti")
    scored = comp.join(
        df.select(F.col(id_col).alias("node"), F.col(keep_by).alias("_q")),
        on="node",
        how="inner",
    )
    # winner per cluster: max quality, ties to the SMALLER id — encode
    # as max(struct(q, -node)) so one aggregation decides
    winners = (
        scored.groupBy("component")
        .agg(F.max(F.struct(F.col("_q"), (-F.col("node")).alias("_negid"))).alias("_w"))
        .select((-F.col("_w._negid")).alias(id_col))
    )
    in_cluster = comp.select(F.col("node").alias(id_col))
    keep_outside = df.join(in_cluster, on=id_col, how="left_anti")
    keep_winners = df.join(winners, on=id_col, how="leftsemi")
    return keep_outside.unionByName(keep_winners)
