"""kNN via cell-ring expansion (north rule; absent in the reference —
SURVEY.md §2.4 J-kNN). The XYZ quadtree key plays H3: ``grid_disk`` of
radius R around each query cell is a pure Catalyst double-``sequence``
explode; candidates come from an equi-join against the image table on the
cell key; ranking is a ``row_number`` window by Web-Mercator center
distance (P3 space).

Exactness: a cell at Chebyshev ring ρ>R from the query cell has center
distance > (R+0.5)·tile_size from any point inside the query cell, so a
query is FINAL once its k-th best candidate distance ≤ (R+0.5)·tile_size.
Unsatisfied queries double R and retry — a driver loop of a few rounds,
each round fully distributed (the standard iterative-algorithm shape).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tilegrab_spark.functions.cells import cell_encode_cols
from tilegrab_spark.kernels.geo import WEB_MERCATOR_EXTENT, WGS84_RADIUS


def _mercator_cols(lon, lat):
    x = F.radians(lon) * WGS84_RADIUS
    y = F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(lat) / 2.0)) * WGS84_RADIUS
    return x, y


def _candidates(q: DataFrame, images_df: DataFrame, zoom: int, radius: int) -> DataFrame:
    """grid_disk(radius) around each query cell, joined to image cells."""
    n_cells = 1 << zoom
    disk = (
        q.withColumn("_dx", F.explode(F.sequence(F.lit(-radius), F.lit(radius))))
        .withColumn("_dy", F.explode(F.sequence(F.lit(-radius), F.lit(radius))))
        .withColumn("x", F.col("qx") + F.col("_dx"))
        .withColumn("y", F.col("qy") + F.col("_dy"))
        .filter(
            (F.col("x") >= 0) & (F.col("x") < n_cells)
            & (F.col("y") >= 0) & (F.col("y") < n_cells)
        )
        .withColumn("z", F.lit(zoom))
        .drop("_dx", "_dy")
    )
    cand = F.broadcast(disk).join(images_df, on=["z", "x", "y"], how="inner")
    ts = 2.0 * WEB_MERCATOR_EXTENT / (1 << zoom)
    cx = -WEB_MERCATOR_EXTENT + (F.col("x") + 0.5) * F.lit(ts)
    cy = WEB_MERCATOR_EXTENT - (F.col("y") + 0.5) * F.lit(ts)
    return cand.withColumn(
        "dist",
        F.sqrt(
            F.pow(cx - F.col("qmx"), F.lit(2.0)) + F.pow(cy - F.col("qmy"), F.lit(2.0))
        ),
    )


def knn_join(
    queries_df: DataFrame,
    images_df: DataFrame,
    zoom: int,
    k: int,
    *,
    init_radius: int | None = None,
    max_radius: int = 1024,
    rows_per_cell: float | None = None,
    salt_buckets: int | None = None,
) -> DataFrame:
    """For each query point, the k nearest image rows at ``zoom``.

    queries_df: ``(query_id, lon, lat)``. Returns query columns + image
    columns + ``dist`` (meters, Web-Mercator) + ``rank`` 1..k.

    The query side is broadcast per round (query sets are small relative
    to the image table); the image table is only ever touched by pruned
    cell-key joins — never a full shuffle.

    ``rows_per_cell``: average image-row density (rows per cell at
    ``zoom``), e.g. from the lineage/metrics table or a prior count —
    sizes the initial ring so the expected round-1 candidate count is
    ~2k and most queries finalize in ONE distributed round instead of
    doubling through several. Exactness is unaffected (the safe-radius
    test still gates finality); a bad hint only changes round count.

    ``salt_buckets``: hot-cell guard. The ranking window partitions by
    query_id, so a query whose disk covers a cell with 10^5+ rows sorts
    them all in ONE window partition. With salt_buckets=S the ranking
    runs in two exact stages: row_number within (query_id, salt) keeps
    at most k rows per salt bucket (the global top-k is a subset of the
    per-bucket top-ks for any partition of the candidates), then the
    global window ranks <= S*k rows per query. Largest sorted partition
    drops from N_hot to ~N_hot/S. Result is identical (asserted in
    tests/test_knn.py); leave None for benign densities — the extra
    window stage only pays for itself under skew.
    """
    spark = queries_df.sparkSession
    qx, qy = cell_encode_cols(F.col("lon"), F.col("lat"), zoom)
    qmx, qmy = _mercator_cols(F.col("lon"), F.col("lat"))
    q = (
        queries_df.withColumn("qx", qx)
        .withColumn("qy", qy)
        .withColumn("qmx", qmx)
        .withColumn("qmy", qmy)
    )

    ts = 2.0 * WEB_MERCATOR_EXTENT / (1 << zoom)
    if init_radius is not None:
        radius = init_radius
    elif rows_per_cell and rows_per_cell > 0:
        # (2r+1)^2 * density >= 2k  =>  round-1 usually suffices
        radius = max(1, int(math.ceil((math.sqrt(2.0 * k / rows_per_cell) - 1) / 2)))
    else:
        radius = max(1, int(math.ceil(math.sqrt(k) / 2)))
    results = []
    remaining = q
    # finalization is fully relational: per-round `done` stays a
    # DataFrame (semi/anti-joined, broadcast — it's at most the query
    # set), never a driver-side id list. A 10^6-query batch therefore
    # never builds a 10^6-element In() expression; the only driver
    # round-trip per round is one scalar count.
    # DISTINCT ids: done counts distinct query_ids, so duplicate query
    # rows must not inflate the remaining tally or the loop never exits
    n_remaining = q.select("query_id").distinct().count()
    # the image side is re-joined every round: cache it once (columns
    # here are already pruned by the caller's projection)
    images_df = images_df.persist()
    round_frames: list[DataFrame] = []
    while True:
        cand = _candidates(remaining, images_df, zoom, radius)
        if salt_buckets and salt_buckets > 1:
            sw = Window.partitionBy("query_id", "_salt").orderBy("dist", "image_id")
            cand = (
                cand.withColumn(
                    "_salt", F.pmod(F.xxhash64("image_id"), F.lit(salt_buckets))
                )
                .withColumn("_prank", F.row_number().over(sw))
                .filter(F.col("_prank") <= k)
                .drop("_salt", "_prank")
            )
        w = Window.partitionBy("query_id").orderBy("dist", "image_id")
        ranked = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .persist()
        )
        round_frames.append(ranked)
        # final iff the k-th candidate lies within the safe radius: any
        # unexplored cell (ring > radius) is farther than (radius+0.5)*ts
        safe = (radius + 0.5) * ts
        # done derives from the persisted `ranked` — recomputing it for
        # the joins below is one cheap aggregate over cached data, so no
        # extra persist handle is leaked per round
        done = (
            ranked.groupBy("query_id")
            .agg(F.count("*").alias("_cnt"), F.max("dist").alias("_kth"))
            .filter((F.col("_cnt") >= k) & (F.col("_kth") <= safe))
            .select("query_id")
        )
        n_done = done.count()  # the one driver scalar per round
        at_limit = radius >= max_radius
        if at_limit:
            results.append(ranked)  # best-effort for whatever is left
            break
        results.append(ranked.join(F.broadcast(done), "query_id", "left_semi"))
        n_remaining -= n_done
        if n_remaining <= 0:
            break
        remaining = remaining.join(F.broadcast(done), "query_id", "left_anti")
        radius = min(radius * 2, max_radius)

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    out = out.drop("qx", "qy", "qmx", "qmy")
    # only the final union stays cached: materialize it once, then drop
    # every per-round handle (and the image cache) so a long-lived session
    # calling knn_join repeatedly holds exactly ONE persisted frame per
    # call — the result, which the caller may .unpersist() when done —
    # instead of ~log2(max_radius) round frames that outlive the call.
    out = out.persist()
    out.count()
    for r in round_frames:
        r.unpersist()
    images_df.unpersist()
    return out
