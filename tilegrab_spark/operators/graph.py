"""Distributed shortest paths over an edge table — frontier-pruned
multi-source Bellman-Ford (the Pregel SSSP shape), driver loop +
distributed rounds, same iteration discipline as
``components.connected_components``.

Geo relevance: road-network distance ("minutes to the nearest depot")
is the graph twin of ``distancejoin`` — as-the-crow-flies pairing
finds candidates, network distance ranks them. With every source
carrying its own id the result is the **graph Voronoi** (nearest-source
labeling), the standard facility-assignment primitive. The reference
(a tile downloader) has no analogue; this extends the analytics suite
alongside ``connected_components``.

Plan shape at 100 TB:

- each round relaxes ONLY the frontier (nodes improved last round):
  one join frontier⋈edges keyed by src (frontier is usually a small
  fraction of nodes — AQE broadcasts it when it is), one map-side
  pre-combined ``min(struct(dist, source))`` per candidate node, one
  node-keyed merge into the running distance table. Exchange sizes
  track the frontier's out-edges, never |E| per round.
- rounds = weighted diameter in hops (BFS layers); the loop
  ``localCheckpoint``s the distance table each round so plan lineage
  stays flat (the iterative-algorithm trap, see components.py).
- ties are deterministic: ``min`` over ``struct(dist, source)`` is
  lexicographic, so equal distances resolve to the smallest source id.

Negative weights are rejected up front (one bounded aggregate):
frontier pruning — like Dijkstra — assumes monotone relaxation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["shortest_paths", "hop_distance"]


def _relax_round(frontier: DataFrame, e: DataFrame, dist: DataFrame) -> DataFrame:
    """One relaxation round (lazy): candidate improvements from the
    frontier's out-edges, map-side pre-combined to one candidate per
    node, filtered to strict improvements over ``dist``."""
    cand = (
        frontier.join(e, frontier.node == e._s)
        .select(
            F.col("_d").alias("node"),
            (F.col("dist") + F.col("_w")).alias("dist"),
            "source",
        )
        # map-side pre-combine: one candidate per node leaves the round
        .groupBy("node")
        .agg(F.min(F.struct("dist", "source")).alias("_c"))
        .select("node", F.col("_c.dist").alias("dist"), F.col("_c.source").alias("source"))
    )
    return (
        cand.join(dist.select("node", F.col("dist").alias("_old")), "node", "left")
        .filter(F.col("_old").isNull() | (F.col("dist") < F.col("_old")))
        .select("node", "dist", "source")
    )


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    node_col: str = "node",
    directed: bool = False,
    max_iter: int = 50,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """(node, dist, source) for every node reachable from ``sources``:
    ``dist`` = cheapest path cost, ``source`` = the source node it is
    cheapest from (graph Voronoi). ``sources`` needs a ``node_col``
    column; ``weight_col=None`` counts hops (BFS). Unreachable nodes
    are absent. ``on_nonconverged``: 'raise' (default) or 'return'
    (partial distances after ``max_iter`` rounds — correct lower
    frontier, possibly missing far nodes)."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    if on_nonconverged not in ("raise", "return"):
        raise ValueError(f"on_nonconverged must be 'raise' or 'return', got {on_nonconverged!r}")
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"), w.alias("_w"))
    if not directed:
        e = e.unionByName(e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"), "_w"))
    if weight_col is not None:
        wmin = e.agg(F.min("_w")).first()[0]  # bounded scalar, one pass
        if wmin is not None and wmin < 0:
            raise ValueError(f"negative edge weight {wmin}: frontier relaxation requires w >= 0")
    e = e.persist()

    dist = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .select("node", F.lit(0.0).alias("dist"), F.col("node").alias("source"))
        .localCheckpoint()
    )
    frontier = dist
    converged = False
    for _ in range(max_iter):
        improved = _relax_round(frontier, e, dist).localCheckpoint()
        if improved.isEmpty():
            converged = True
            break
        new_dist = (
            dist.unionByName(improved)
            .groupBy("node")
            .agg(F.min(F.struct("dist", "source")).alias("_b"))
            .select("node", F.col("_b.dist").alias("dist"), F.col("_b.source").alias("source"))
            .localCheckpoint()
        )
        dist = new_dist
        frontier = improved
    e.unpersist()
    if not converged and on_nonconverged == "raise":
        raise RuntimeError(
            f"shortest_paths did not converge in {max_iter} rounds; "
            "raise max_iter or pass on_nonconverged='return'"
        )
    return dist


def hop_distance(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    directed: bool = False,
    max_iter: int = 50,
) -> DataFrame:
    """BFS layers: (node, dist, source) with ``dist`` = hop count from
    the nearest source (unit weights)."""
    return shortest_paths(
        edges,
        sources,
        src_col=src_col,
        dst_col=dst_col,
        weight_col=None,
        node_col=node_col,
        directed=directed,
        max_iter=max_iter,
    )
