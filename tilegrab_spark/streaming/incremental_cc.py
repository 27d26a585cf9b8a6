"""Incremental connected components — the missing incremental form in
the dedup chain (minhash/simhash pairs → incremental_dedup → GROUPS).
A daily pipeline discovers new near-duplicate EDGES each batch; this
module maintains the duplicate-GROUP labeling across batches in
O(batch + merges) work, never re-clustering the historical graph.

State layout (all per-batch ``batch_id=N`` partition dirs — replays
overwrite their own partition byte-identically, the streaming/_state.py
idempotency contract; both tables are APPEND-ONLY, which is what makes
the replay story trivial):

- ``nodes/``  — ``(node, comp0)``: one row per node EVER seen, written
  by the batch that introduced it; ``comp0`` is the component root
  assigned at that moment and is never rewritten;
- ``remaps/`` — ``(old_root, new_root)``: the root merges each batch
  caused. The CURRENT label of any node is ``comp0`` chased through
  the accumulated remap graph (a functional forest over ROOT ids —
  merge-count-sized, orders of magnitude smaller than the node table);
  :func:`read_components` resolves it with pointer-doubling in
  O(log chain) root-table-sized joins.

Per batch (:func:`add_edges`):

1. the batch's edges are clustered TOGETHER WITH one virtual edge
   (node → current root) per already-known touched node — a semi-joined
   read of the node table (column-pruned; the historical corpus is
   never re-aggregated) plus a broadcast-sized remap resolution;
2. min-label CC over that batch-sized graph (operators/components.py —
   the driver-cutoff hybrid keeps merge-pair-sized batches off the
   2-shuffle-per-round distributed path) yields the exact new labels:
   the virtual edge carries each old component's MIN — so min over the
   merged component equals min over the full edge union, making the
   incremental labels IDENTICAL to a from-scratch recompute (the
   batch-equivalence oracle, tests/test_incremental_cc.py);
3. new nodes append to ``nodes/``; roots whose label changed append to
   ``remaps/``.

Reference parity: the reference has no graph surface at all; this
extends SURVEY.md §2.10's incremental family (dedup, decon, index,
spans, sketches, fingerprints) with the clustering step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

import math
import os

from tilegrab_spark.operators.components import connected_components
from tilegrab_spark.operators.dedup import _persist_owned, _release_owned
from tilegrab_spark.streaming._state import commit_batch, load_state

__all__ = ["add_edges", "read_components", "stream_components"]


def _resolve_remaps(remaps: DataFrame | None) -> DataFrame | None:
    """Collapse the accumulated (old_root, new_root) merge graph to its
    fixpoint (old_root → final_root) by pointer doubling. Acyclic by
    construction (a merge's new_root is always the smaller id, so hops
    strictly decrease); chains are at most R rows deep, so
    ceil(log2(R+1)) jumps — each one self-join of the merge-count-sized
    table — provably reach the fixpoint."""
    if remaps is None:
        return None
    cur = remaps.select("old_root", "new_root").distinct().localCheckpoint()
    n = cur.count()
    if n == 0:
        return None
    for _ in range(max(1, math.ceil(math.log2(n + 1)))):
        cur = (
            cur.alias("a")
            .join(cur.alias("b"), F.col("a.new_root") == F.col("b.old_root"), "left")
            .select(
                F.col("a.old_root").alias("old_root"),
                F.coalesce(F.col("b.new_root"), F.col("a.new_root")).alias("new_root"),
            )
            .localCheckpoint()
        )
    return cur


def _apply_remap(labeled: DataFrame, remap: DataFrame | None) -> DataFrame:
    """(node, comp0) -> (node, component) through the resolved remap."""
    if remap is None:
        return labeled.select("node", F.col("comp0").alias("component"))
    return labeled.join(
        F.broadcast(remap), labeled.comp0 == remap.old_root, "left"
    ).select(
        "node", F.coalesce("new_root", "comp0").alias("component")
    )


def read_components(spark: SparkSession, state_path: str) -> DataFrame | None:
    """Current ``(node, component)`` for every node ever ingested
    (component = min node id of its component, exactly as the one-shot
    operator labels it); None before the first batch."""
    nodes = load_state(spark, os.path.join(state_path, "nodes"))
    if nodes is None:
        return None
    remap = _resolve_remaps(load_state(spark, os.path.join(state_path, "remaps")))
    return _apply_remap(nodes.select("node", "comp0"), remap)


def add_edges(
    new_pairs: DataFrame,
    state_path: str,
    *,
    batch_id: int,
    a_col: str = "id_a",
    b_col: str = "id_b",
    driver_cutoff: int = 100_000,
    commit: bool = True,
) -> DataFrame:
    """Ingest one batch of edges; returns the ``(node, component)``
    labels OF THE TOUCHED SUBGRAPH after the merge (read the full
    labeling with :func:`read_components`). ``commit=False`` dry-runs
    without writing state."""
    spark = new_pairs.sparkSession
    nodes_path = os.path.join(state_path, "nodes")
    remaps_path = os.path.join(state_path, "remaps")
    owned: list = []

    edges = _persist_owned(
        new_pairs.select(F.col(a_col).alias("id_a"), F.col(b_col).alias("id_b")),
        owned,
    )
    touched = (
        edges.select(F.col("id_a").alias("node"))
        .unionByName(edges.select(F.col("id_b").alias("node")))
        .distinct()
    )

    # the state view EXCLUDES this batch's own batch_id partitions: an
    # at-least-once replay must see exactly the pre-batch state, or its
    # own earlier write would make every touched node "known", the
    # new_nodes anti-join would go empty, and the overwrite would ERASE
    # the nodes the original run committed
    old_nodes = load_state(spark, nodes_path)
    if old_nodes is not None:
        old_nodes = old_nodes.filter(F.col("batch_id") != int(batch_id))
        old_remaps = load_state(spark, remaps_path)
        if old_remaps is not None:
            old_remaps = old_remaps.filter(F.col("batch_id") != int(batch_id))
        remap = _resolve_remaps(old_remaps)
        known = _apply_remap(
            old_nodes.select("node", "comp0").join(touched, "node", "left_semi"),
            remap,
        )
    else:
        known = None

    graph = edges
    if known is not None:
        # one virtual edge per known touched node carries its current
        # root (= the MIN of its whole component) into the batch graph,
        # so min-label CC over this batch-sized graph reproduces the
        # exact labels of a full recompute over the edge union
        graph = graph.unionByName(
            known.select(
                F.col("node").alias("id_a"), F.col("component").alias("id_b")
            )
        )
    labels = _persist_owned(
        connected_components(graph, driver_cutoff=driver_cutoff), owned
    )

    # rows for nodes THIS batch introduces (their comp0 is fixed now)
    new_nodes = labels.join(touched, "node", "left_semi")
    if old_nodes is not None:
        new_nodes = new_nodes.join(
            old_nodes.select("node"), "node", "left_anti"
        )
    # root merges: an OLD root whose new label differs gets a remap row
    if known is not None:
        merges = (
            labels.withColumnRenamed("component", "new_root")
            .join(
                known.select(F.col("component").alias("node")).distinct(),
                "node",
            )
            .filter(F.col("node") != F.col("new_root"))
            .select(F.col("node").alias("old_root"), "new_root")
            .distinct()
        )
    else:
        merges = labels.filter(F.lit(False)).select(
            F.col("node").alias("old_root"), F.col("component").alias("new_root")
        )

    # materialize everything BEFORE the state writes: the parquet
    # commits below refreshByPath-invalidate any frame still reading
    # the state dirs (the tracksim_stream lesson)
    out = labels.select("node", "component").localCheckpoint(eager=True)
    new_nodes_m = new_nodes.select(
        "node", F.col("component").alias("comp0")
    ).localCheckpoint(eager=True)
    merges_m = merges.localCheckpoint(eager=True)
    if commit:
        commit_batch(new_nodes_m, nodes_path, batch_id)
        commit_batch(merges_m, remaps_path, batch_id)
    # release exactly THIS call's handles — identity-based, safe under
    # interleaved foreachBatch streams in one driver (review r5)
    _release_owned(owned)
    return out


def stream_components(
    spark: SparkSession,
    landing_dir: str,
    state_path: str,
    checkpoint_dir: str,
    *,
    schema,
    a_col: str = "id_a",
    b_col: str = "id_b",
    driver_cutoff: int = 100_000,
    trigger_once: bool = True,
):
    """Structured-Streaming composition (the stream_track_similarity
    convention): parquet drops of edge batches → :func:`add_edges` per
    micro-batch; the component state grows under ``state_path`` and is
    read back any time with :func:`read_components`. foreachBatch is
    at-least-once — add_edges' state view excludes the batch's own
    partitions, so a replay recomputes byte-identical state."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            add_edges(
                batch_df, state_path,
                batch_id=batch_id, a_col=a_col, b_col=b_col,
                driver_cutoff=driver_cutoff, commit=True,
            )
        finally:
            batch_df.unpersist()

    writer = (
        spark.readStream.schema(schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
