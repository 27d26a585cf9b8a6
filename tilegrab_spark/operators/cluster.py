"""Density-based point clustering (DBSCAN) as a grid-blocked join.

The engine's other spatial operators work on tiles; this one works on
raw POINTS (lon/lat rows — check-ins, detections, GPS fixes) and
answers "which points form dense clusters, which are noise?" — DBSCAN
semantics, the standard density clustering. The naive algorithm is a
pairwise range query (O(n^2), driver-bound in every single-node
implementation); at lake scale the join must be blocked. The classic
trick: project to Web-Mercator meters (the engine's numeric contract,
kernels/geo.py) and bin points into a grid of side exactly ``eps_m`` —
every eps-neighbor of a point then lies in the 3x3 block around its
cell, so candidate pairs come from ONE equi-join of a 9-cell probe
explode against the cell-keyed points, refined by the exact planar
distance. From there DBSCAN is relational:

1. neighbor counts (self included, the sklearn convention) — one
   groupBy over the refined pairs;
2. core points = count >= min_pts;
3. clusters = connected components over core-core eps-edges
   (components.py: min-label + pointer jumping — cluster id is the MIN
   core point id, deterministic);
4. border points attach to the MIN cluster id among their core
   neighbors (sklearn leaves this order-dependent; we pin the
   deterministic choice);
5. everything else is noise (``cluster`` NULL).

Scale shape: the candidate join is a blocked equi-join on integer cell
keys — cost O(n x avg points per 3x3 block), the same shape as the
engine's LSH/hamming pair generators, never all-pairs. Dense cells are
the skew axis: a cell with k points contributes k^2 candidate pairs,
exactly the hot-cell profile AQE skew-join splitting handles (and
``eps_m`` IS the resolution knob — halving it quarters the densest
block). The CC rounds run on the core-edge list only (sparse: bounded
by the candidate pairs), shuffling packed longs, never coordinates.

Determinism: every reduction is a MIN or a COUNT — output is a pure
function of the input rows, independent of partitioning; verified
against a brute-force numpy DBSCAN oracle (tests/test_cluster.py).

Mercator planar distance stretches by 1/cos(lat) away from the equator
(as does every Web-Mercator buffer, including the reference's tile
footprints); callers wanting a ground-meter eps at latitude phi pass
``eps_m / cos(phi)``. Points must lie inside the Mercator validity
band (|lat| <= 85.051129, kernels/geo.py MERCATOR_LAT_LIMIT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tilegrab_spark.kernels.geo import WGS84_RADIUS
from tilegrab_spark.operators.components import connected_components
from tilegrab_spark.operators.dedup import _persist_signatures

__all__ = ["grid_dbscan", "cluster_summary"]


def _mercator_cols(df: DataFrame, lon_col: str, lat_col: str) -> DataFrame:
    """EPSG:3857 forward projection as pure Catalyst expressions:
    ``mx = R * radians(lon)``, ``my = R * ln(tan(pi/4 + radians(lat)/2))``."""
    rad_lat = F.radians(F.col(lat_col).cast("double"))
    return df.withColumn(
        "_mx", F.lit(WGS84_RADIUS) * F.radians(F.col(lon_col).cast("double"))
    ).withColumn(
        "_my",
        F.lit(WGS84_RADIUS)
        * F.log(F.tan(F.lit(0.7853981633974483) + rad_lat / F.lit(2.0))),
    )


def grid_dbscan(
    points: DataFrame,
    *,
    eps_m: float,
    min_pts: int,
    id_col: str = "point_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_col: str | None = None,
    eps_t: float | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """DBSCAN over (lon, lat) points with radius ``eps_m`` Web-Mercator
    meters and density threshold ``min_pts`` (neighborhood INCLUDES the
    point itself, as in sklearn).

    ``ts_col`` + ``eps_t`` (both or neither) switch on **ST-DBSCAN**
    (Birant & Kut): the neighborhood predicate becomes spatial distance
    ≤ eps_m AND |Δt| ≤ ``eps_t`` (``ts_col`` numeric, same unit as
    ``eps_t``) — reappearing hotspots (a market held weekly in one
    square) separate into per-episode clusters instead of smearing into
    one. Blocking gains a third grid axis: time buckets of width eps_t,
    probe explode 3×3×3 — same equi-join shape, never all-pairs.

    ``id_col`` must be a unique orderable key — cluster labels are the
    MIN member core id, and border tie-breaks take the MIN cluster, so
    the labeling is deterministic and partition-invariant.

    Returns the input rows plus ``is_core`` (boolean) and ``cluster``
    (long; NULL = noise). Border points (non-core within eps of a core)
    join their minimum-labeled core neighbor's cluster.
    """
    if eps_m <= 0:
        raise ValueError(f"eps_m must be positive, got {eps_m}")
    if min_pts < 1:
        raise ValueError(f"min_pts must be >= 1, got {min_pts}")
    if (ts_col is None) != (eps_t is None):
        raise ValueError("ts_col and eps_t must be passed together")
    if eps_t is not None and eps_t <= 0:
        raise ValueError(f"eps_t must be positive, got {eps_t}")
    temporal = ts_col is not None

    pts = _mercator_cols(points, lon_col, lat_col).withColumns(
        {
            "_cx": F.floor(F.col("_mx") / F.lit(float(eps_m))),
            "_cy": F.floor(F.col("_my") / F.lit(float(eps_m))),
        }
    )
    if temporal:
        pts = pts.withColumn("_ct", F.floor(F.col(ts_col).cast("double") / F.lit(float(eps_t))))
    # both frames feed multiple branches; cached through the tracked
    # registry (dedup.py) — release_signature_caches() drops them.
    pts = _persist_signatures(pts)

    # candidate pairs: 9-cell (27 with time) probe explode joined
    # against the cell-keyed points — each ordered pair appears exactly
    # once (the target's own cell is unique), so no dedup pass is
    # needed.
    deltas = [
        (dx, dy, dt)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dt in ((-1, 0, 1) if temporal else (0,))
    ]
    def cell_fields(dx, dy, dt):
        return [(F.col("_cx") + dx).alias("_cx"), (F.col("_cy") + dy).alias("_cy")] + (
            [(F.col("_ct") + dt).alias("_ct")] if temporal else []
        )
    keys = ["_cx", "_cy"] + (["_ct"] if temporal else [])
    probe = pts.select(
        F.col(id_col).alias("_ida"),
        F.col("_mx").alias("_ax"),
        F.col("_my").alias("_ay"),
        *([F.col(ts_col).cast("double").alias("_at")] if temporal else []),
        F.explode(
            F.array(*[F.struct(*cell_fields(dx, dy, dt)) for dx, dy, dt in deltas])
        ).alias("_nb"),
    ).select(
        "_ida", "_ax", "_ay",
        *(["_at"] if temporal else []),
        *[F.col(f"_nb.{k}").alias(k) for k in keys],
    )
    target = pts.select(
        *keys,
        F.col(id_col).alias("_idb"),
        F.col("_mx").alias("_bx"),
        F.col("_my").alias("_by"),
        *([F.col(ts_col).cast("double").alias("_bt")] if temporal else []),
    )
    dx = F.col("_ax") - F.col("_bx")
    dy = F.col("_ay") - F.col("_by")
    within = dx * dx + dy * dy <= F.lit(float(eps_m) * float(eps_m))
    if temporal:
        within = within & (F.abs(F.col("_at") - F.col("_bt")) <= F.lit(float(eps_t)))
    pairs = (
        probe.join(target, keys)
        .filter(within)
        .select("_ida", "_idb")
    )
    pairs = _persist_signatures(pairs)

    counts = pairs.groupBy("_ida").agg(F.count(F.lit(1)).alias("_ncnt"))
    cores = counts.filter(F.col("_ncnt") >= min_pts).select(F.col("_ida").alias("_core"))

    # core-core eps-edges (+ self loops so isolated cores still form
    # single-member clusters), then min-label connected components.
    core_edges = (
        pairs.join(cores.withColumnRenamed("_core", "_ida"), "_ida")
        .join(cores.withColumnRenamed("_core", "_idb"), "_idb")
        .filter(F.col("_ida") < F.col("_idb"))
        .select(F.col("_ida").alias("id_a"), F.col("_idb").alias("id_b"))
        .unionByName(
            cores.select(F.col("_core").alias("id_a"), F.col("_core").alias("id_b"))
        )
    )
    comp = connected_components(core_edges, max_iter=max_iter).select(
        F.col("node").alias("_idb"), F.col("component").alias("_cluster")
    )

    # every point's cluster: MIN cluster over its core neighbors
    # (a core point is its own neighbor via the self-pair, so this one
    # rule labels cores and borders alike; no core neighbor -> noise).
    assigned = (
        pairs.join(comp, "_idb")
        .groupBy("_ida")
        .agg(F.min("_cluster").alias("cluster"))
    )
    out = (
        pts.drop("_mx", "_my", "_cx", "_cy", "_ct")
        .join(
            cores.select(F.col("_core").alias(id_col), F.lit(True).alias("is_core")),
            id_col,
            "left",
        )
        .withColumn("is_core", F.coalesce("is_core", F.lit(False)))
        .join(assigned.withColumnRenamed("_ida", id_col), id_col, "left")
    )
    return out


def cluster_summary(
    labeled: DataFrame, *, lon_col: str = "lon", lat_col: str = "lat"
) -> DataFrame:
    """Per-cluster rollup of a :func:`grid_dbscan` output: member and
    core counts plus the lon/lat bounding box — one map-side-combinable
    aggregation. Noise rows (NULL cluster) are excluded."""
    return (
        labeled.filter(F.col("cluster").isNotNull())
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.sum(F.col("is_core").cast("long")).alias("n_core"),
            F.min(lon_col).alias("min_lon"),
            F.min(lat_col).alias("min_lat"),
            F.max(lon_col).alias("max_lon"),
            F.max(lat_col).alias("max_lat"),
        )
    )
