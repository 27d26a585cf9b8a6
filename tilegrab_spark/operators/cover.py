"""Multi-resolution tile-cover compaction — the H3 ``compactCells`` /
``uncompactCells`` pair re-expressed over slippy-map XYZ quadtree cells
(reference scope: the tile sets produced by tiles/collection.py are
always single-zoom; compaction is the standard engine extension that
makes a billion-tile coverage storable and joinable as a few million
mixed-zoom cells).

``compact_cover`` replaces every complete sibling quad (all 4 children
of one parent present) with the parent, recursively, down to
``min_zoom``.  ``uncompact_cover`` expands a mixed-zoom cover back to a
single target zoom.  ``uncompact_cover(compact_cover(S, z), z) == S``
for any single-zoom tile set — the round-trip invariant the tests and
the driver oracle pin.

Shape notes for scale (the 100 TB argument):
- level-synchronous bottom-up sweep, ``zoom - min_zoom`` rounds; the
  frontier SHRINKS at least 4x per promoted level, so total shuffled
  bytes are a geometric series dominated by the first round — O(|S|)
  regardless of depth;
- each round is ONE hash exchange on the parent key: the per-parent
  child count and the child->parent join are co-partitioned on
  (px, py), so Catalyst plans a single Exchange per round reused by
  both sides (no broadcast of anything data-sized, no driver
  round-trips — the round count is a pure function of the two zoom
  arguments, never of the data);
- ``uncompact_cover`` is a pure-Catalyst explode: each cover cell emits
  its 4^(dz) descendants from two ``sequence`` generators JVM-side;
  output size is exactly the covered-tile count, and generation is
  embarrassingly parallel (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tilegrab_spark.sources.images import cell_id_col

__all__ = ["adaptive_cover", "compact_cover", "uncompact_cover"]


def _validated_zooms(zoom: int, min_zoom: int) -> tuple[int, int]:
    zoom, min_zoom = int(zoom), int(min_zoom)
    if not 0 <= zoom <= 29:
        raise ValueError(f"zoom must be in [0, 29], got {zoom}")
    if not 0 <= min_zoom <= zoom:
        raise ValueError(
            f"min_zoom must be in [0, zoom={zoom}], got {min_zoom}"
        )
    return zoom, min_zoom


def compact_cover(
    tiles: DataFrame,
    zoom: int,
    *,
    min_zoom: int = 0,
    x_col: str = "x",
    y_col: str = "y",
    checkpoint: bool = True,
) -> DataFrame:
    """Minimal mixed-zoom cover ``[z, x, y, cell_id]`` of a single-zoom
    tile set.  ``tiles`` holds (x_col, y_col) tile indices all at
    ``zoom`` (duplicates are fine — the cover is a set); parents are
    only formed down to ``min_zoom``.  Every input tile is covered by
    exactly one output cell, and no output cell covers a tile outside
    the input (exact cover, not an approximation).

    ``checkpoint=True`` (default) materializes each round's per-parent
    counts via ``localCheckpoint`` — the same recipe as
    connected_components.  Without it, every level's emit branch
    re-derives the whole chain from the source scan (measured: d+1
    scans and ~7 exchanges per level for a d-level sweep), turning the
    geometric series into O(d·|S|); with it each level is one job over
    the (≥4x-per-level shrinking) frontier.  ``checkpoint=False`` keeps
    the operator fully lazy for tiny covers or plan inspection."""
    zoom, min_zoom = _validated_zooms(zoom, min_zoom)
    frontier = (
        tiles.select(
            F.col(x_col).cast("long").alias("x"),
            F.col(y_col).cast("long").alias("y"),
        )
        .distinct()
    )
    out: DataFrame | None = None
    for level in range(zoom, min_zoom, -1):
        with_parent = frontier.select(
            "x", "y",
            F.shiftright("x", 1).alias("px"),
            F.shiftright("y", 1).alias("py"),
        )
        counts = with_parent.groupBy("px", "py").agg(
            F.count(F.lit(1)).alias("_c")
        )
        if checkpoint:
            # truncate lineage: both consumers (the emit join below and
            # the next level's frontier) read the materialized counts
            # instead of recomputing the whole prefix chain
            counts = counts.localCheckpoint(eager=True)
        # co-partitioned on (px, py) with `counts` — one exchange per
        # round, reused by both join sides
        joined = with_parent.join(counts, ["px", "py"])
        emit = joined.filter(F.col("_c") < 4).select(
            F.lit(level).cast("int").alias("z"), "x", "y"
        )
        out = emit if out is None else out.unionByName(emit)
        frontier = counts.filter(F.col("_c") == 4).select(
            F.col("px").alias("x"), F.col("py").alias("y")
        )
    root = frontier.select(
        F.lit(min_zoom).cast("int").alias("z"), "x", "y"
    )
    out = root if out is None else out.unionByName(root)
    return out.withColumn("cell_id", cell_id_col())


def uncompact_cover(
    cover: DataFrame,
    zoom: int,
    *,
    z_col: str = "z",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Expand a mixed-zoom cover to its descendant tiles at ``zoom``:
    ``[z, x, y, cell_id]`` with every row at ``zoom``.  Cells already
    at ``zoom`` pass through; cells deeper than ``zoom`` raise (this is
    a descent, not an aggregation — compact first)."""
    zoom, _ = _validated_zooms(zoom, 0)
    # the guard lives inside `side` (a consumed expression) so column
    # pruning can't optimize the depth check away
    side = (
        F.when(
            F.col("_cz") > F.lit(zoom),
            F.raise_error(
                F.format_string(
                    "uncompact_cover: cell at z=%s is deeper than target "
                    f"zoom {zoom}",
                    F.col("_cz"),
                )
            ),
        )
        .otherwise(F.expr(f"shiftleft(CAST(1 AS BIGINT), {zoom} - _cz)"))
        .cast("long")
    )
    expanded = (
        cover.select(
            F.col(z_col).cast("int").alias("_cz"),
            F.col(x_col).cast("long").alias("_cx"),
            F.col(y_col).cast("long").alias("_cy"),
        )
        .select("_cx", "_cy", side.alias("_side"))
        .select(
            "_cx", "_cy", "_side",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("_side") - 1)
            ).alias("_dx"),
        )
        .select(
            "_cx", "_cy", "_side", "_dx",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("_side") - 1)
            ).alias("_dy"),
        )
        .select(
            F.lit(zoom).cast("int").alias("z"),
            (F.col("_cx") * F.col("_side") + F.col("_dx")).alias("x"),
            (F.col("_cy") * F.col("_side") + F.col("_dy")).alias("y"),
        )
    )
    return expanded.withColumn("cell_id", cell_id_col())


def adaptive_cover(
    points: DataFrame,
    *,
    threshold: int,
    max_zoom: int,
    min_zoom: int = 0,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Density-adaptive quadtree cover of a point set: the leaf cells of
    the quadtree obtained by splitting every cell holding more than
    ``threshold`` points, from ``min_zoom`` down to at most ``max_zoom``
    (cells still over threshold at ``max_zoom`` are forced leaves).
    Output: ``(z, x, y, n_points)`` — disjoint, and exactly covering the
    occupied ``max_zoom`` cells (sum of ``n_points`` = input row count).

    Because per-cell counts are monotone non-increasing with depth, a
    point's leaf is simply the SHALLOWEST ancestor whose count is
    ``<= threshold`` — so no recursion is needed: (1) count points at
    ``max_zoom`` (one corpus-sized exchange, the only one), (2) roll
    every occupied cell up through all levels in one explode + sum
    (exchange bounded by occupied-cells x depth <= 30), (3) keep cells
    whose count fits but whose PARENT's doesn't (one co-keyed
    self-join). Fully relational — the pytest pins it against a DuckDB
    oracle and set invariants.
    """
    max_zoom, min_zoom = _validated_zooms(max_zoom, min_zoom)
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    from tilegrab_spark.functions.cells import cell_encode_cols

    xm, ym = cell_encode_cols(F.col(lon_col), F.col(lat_col), max_zoom)
    base = (
        points.select(xm.alias("x"), ym.alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    lv = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(z).cast("int").alias("z"),
                        F.shiftright(F.col("x"), max_zoom - z).alias("x"),
                        F.shiftright(F.col("y"), max_zoom - z).alias("y"),
                    )
                    for z in range(min_zoom, max_zoom + 1)
                ]
            )
        ).alias("_l"),
        F.col("cnt"),
    ).select("_l.z", "_l.x", "_l.y", "cnt")
    counts = lv.groupBy("z", "x", "y").agg(F.sum("cnt").alias("n_points"))
    parents = counts.select(
        F.col("z").alias("_pz"),
        F.col("x").alias("_px"),
        F.col("y").alias("_py"),
        F.col("n_points").alias("_pn"),
    )
    t = F.lit(int(threshold))
    joined = counts.join(
        parents,
        (F.col("_pz") == F.col("z") - 1)
        & (F.col("_px") == F.shiftright(F.col("x"), 1))
        & (F.col("_py") == F.shiftright(F.col("y"), 1)),
        "left",
    )
    reached = (F.col("z") == F.lit(min_zoom)) | (F.col("_pn") > t)
    is_leaf = reached & (
        (F.col("n_points") <= t)
        | (F.col("z") == F.lit(max_zoom))  # forced leaf, still over threshold
    )
    return joined.filter(is_leaf).select("z", "x", "y", "n_points")
