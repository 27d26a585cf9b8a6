"""J1: tiles ⋈ image table (the reference's load_images nested loop,
images/loader.py:15-38, which is O(T×F)) re-expressed as a hash equi-join
on the tile key — plus the resume anti-join (F5) and explicit skew
salting for dense cells (north rule).

Join-strategy policy (SURVEY.md §2.4/§4):
- ``broadcast_tiles=True`` (default for per-query tile sets bounded by
  safe_limit): broadcast-hash join — the 100 TB image table is scanned
  once, NO shuffle at all, and skewed cells cannot hurt because there is
  no shuffle partitioning by key.
- big tile sets: shuffled join on (z,x,y); AQE skew-join splits oversized
  partitions at runtime, and ``salt > 1`` adds explicit pre-salting —
  images get ``pmod(xxhash64(image_id), salt)``, tiles explode over
  0..salt-1, so one hot cell spreads over ``salt`` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JOIN_KEY = ["z", "x", "y"]


def join_images(
    tiles_df: DataFrame,
    images_df: DataFrame,
    *,
    how: str = "inner",
    broadcast_tiles: bool = True,
    salt: int = 1,
) -> DataFrame:
    """Keyed fetch: each wanted tile picks up its stored image rows.

    ``how='inner'`` ≙ the reference's "first match wins" loader (every
    match is kept here — dedup to one row per tile is a downstream
    ``row_number`` if wanted); ``how='left'`` keeps un-stored tiles as
    missing (they render black in the mosaic, mosaic.py:20).
    """
    t = tiles_df
    i = images_df
    if salt > 1:
        i = i.withColumn("_salt", F.pmod(F.xxhash64("image_id"), F.lit(salt)).cast("int"))
        t = t.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        key = JOIN_KEY + ["_salt"]
    else:
        key = JOIN_KEY
    if broadcast_tiles:
        t = F.broadcast(t)
    joined = t.join(i, on=key, how=how)
    return joined.drop("_salt") if salt > 1 else joined


def first_match_per_tile(joined: DataFrame) -> DataFrame:
    """Parity mode for loader.py:34 (``break`` after first file match):
    keep one deterministic image row per (geom_id, z, x, y)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("geom_id", "z", "x", "y").orderBy("image_id")
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def anti_join_committed(work_df: DataFrame, committed_cells: DataFrame) -> DataFrame:
    """F5 resume: drop work units whose cell_id is already committed in the
    lineage/metrics table (the *intended* semantics of
    ProgressStore.progress_by_tile, downloader/progress.py:166-172 — the
    reference's own lookup never matches, SURVEY.md §8 Q2)."""
    return work_df.join(
        F.broadcast(committed_cells.select("cell_id").distinct()),
        on="cell_id",
        how="left_anti",
    )
