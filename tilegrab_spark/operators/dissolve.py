"""Tile dissolve — merge adjacent tiles into connected regions, fully
relationally.

``coverage_footprints`` (footprint.py) deliberately leaves adjacent tile
boxes un-merged; this operator supplies the dissolve: 4-adjacency
connected components over the tile set, then per-region analytics. The
whole thing is relational — no geometry library, no driver loop:

1. neighbor EDGES come from one self-equi-join on the packed cell key
   (each tile probes its +x / +y neighbor key — two candidate keys per
   tile, bucketed join shape, no cross product);
2. regions come from ``connected_components`` (components.py — min-label
   + pointer jumping, O(log L) rounds, localCheckpoint lineage breaks);
   singleton tiles ride along as self-loop edges;
3. per-region aggregates are one groupBy: tile count, tile-coordinate
   bbox, and the EXACT dissolved perimeter in tile-side units from the
   handshake identity ``perimeter = 4·n_tiles − 2·internal_edges`` —
   no outline tracing needed (and ``boundary_sides`` per tile falls out
   the same way: sides not shared with a neighbor).

Scale shape: two shuffles (the neighbor join, the component agg) plus
the CC rounds, all on packed int64 keys. Works unchanged on a 10^12-row
tile lake because every stage is the same blocked equi-join the engine
uses everywhere; region count is data-dependent but the iterative step
runs on the EDGE list (sparse: ≤ 2 per tile).

The contract query ``dissolve_regions`` is FULLY oracled: DuckDB
re-derives adjacency, the components themselves (recursive-CTE min-label
fixpoint — an independent algorithm), and every aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tilegrab_spark.functions.cells import cell_id_col
from tilegrab_spark.operators.components import connected_components
from tilegrab_spark.operators.dedup import _persist_signatures

__all__ = ["adjacency_edges", "dissolve_tiles"]


def _cell_frame(tiles: DataFrame) -> DataFrame:
    """Distinct (z, x, y, cell) frame, cached through the tracked
    registry (dedup.py) — it feeds every probe direction AND the target
    side; release_signature_caches() drops it deterministically."""
    return _persist_signatures(
        tiles.select("z", "x", "y")
        .distinct()
        .withColumn("cell", cell_id_col("z", "x", "y"))
    )


def adjacency_edges(tiles: DataFrame, *, diagonal: bool = False) -> DataFrame:
    """Undirected 4-adjacency (8 with ``diagonal=True``) edge list over
    distinct (z, x, y) tiles as packed cell ids: one row (cell_a, cell_b)
    per adjacent pair, cell_a < cell_b, same zoom only. One self-join on
    the neighbor's packed key per direction (+x, +y, and the two
    down-diagonals when enabled) — probing only "forward" neighbors
    emits each pair exactly once with no dedup pass."""
    return _edges_from_cells(_cell_frame(tiles), diagonal).drop("diag")


def _edges_from_cells(cells: DataFrame, diagonal: bool) -> DataFrame:
    """Edge list with a ``diag`` flag (side-sharing vs corner-only) —
    CC uses every edge, the perimeter handshake only the sides."""
    shifts = [(1, 0, False), (0, 1, False)] + (
        [(1, 1, True), (1, -1, True)] if diagonal else []
    )
    targets = cells.select(F.col("cell").alias("cell_b"))
    out = None
    for dx, dy, diag in shifts:
        probe = cells.select(
            F.col("cell").alias("cell_a"),
            cell_id_col("z", F.col("x") + dx, F.col("y") + dy).alias("cell_b"),
            F.lit(diag).alias("diag"),
        ).filter((F.col("y") + dy >= 0) & (F.col("x") + dx >= 0))
        hit = probe.join(targets, "cell_b", "left_semi")
        out = hit if out is None else out.unionByName(hit)
    return out.select(
        F.least("cell_a", "cell_b").alias("cell_a"),
        F.greatest("cell_a", "cell_b").alias("cell_b"),
        "diag",
    )


def dissolve_tiles(tiles: DataFrame, *, diagonal: bool = False) -> DataFrame:
    """Dissolve a tile set into connected regions. Input: rows with
    (z, x, y). Output one row per region: ``region_id`` (min packed cell
    id in the region), ``n_tiles``, tile-coordinate bbox (minx/miny/
    maxx/maxy), ``z``, and ``perimeter`` in tile-side units — the
    handshake counts only side-sharing (4-adjacent) neighbors, so the
    perimeter stays geometric in ``diagonal=True`` mode too."""
    cells = _cell_frame(tiles)
    edges = _edges_from_cells(cells, diagonal)
    # self-loops keep singleton tiles in the node set; they add no
    # adjacency (src == dst contributes nothing to neighbor proposals)
    loops = cells.select(
        F.col("cell").alias("cell_a"), F.col("cell").alias("cell_b")
    )
    comp = connected_components(
        edges.select("cell_a", "cell_b").unionByName(loops),
        a_col="cell_a",
        b_col="cell_b",
    )
    labeled = cells.join(comp, cells.cell == comp.node).select(
        "z", "x", "y", "cell", "component"
    )
    # side-sharing edge count per region (each adjacency once)
    side_edges = edges.filter(~F.col("diag"))
    edge_comp = (
        side_edges.join(comp, side_edges.cell_a == comp.node)
        .groupBy("component")
        .agg(F.count("*").alias("_internal"))
    )
    agg = labeled.groupBy("component").agg(
        F.count("*").alias("n_tiles"),
        F.first("z").alias("z"),
        F.min("x").alias("minx"),
        F.min("y").alias("miny"),
        F.max("x").alias("maxx"),
        F.max("y").alias("maxy"),
    )
    return (
        agg.join(edge_comp, "component", "left")
        .withColumn(
            "perimeter",
            4 * F.col("n_tiles") - 2 * F.coalesce("_internal", F.lit(0)),
        )
        .select(
            F.col("component").alias("region_id"),
            "z",
            "n_tiles",
            "minx",
            "miny",
            "maxx",
            "maxy",
            "perimeter",
        )
    )
