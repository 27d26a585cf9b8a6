"""Incremental / streaming trajectory similarity — convoy detection
over a growing fix lake.

The daily shape of operators/tracksim.py: completed tracks arrive in
batches (a trip uploads when it ends); the engine must emit which new
tracks travel (almost) the same path as ANY track ever seen — without
re-blocking or re-refining the historical corpus. Same incremental
discipline as streaming/incremental_dedup.py (signatures → cells,
LSH bands → cell disks):

- persisted STATE under ``state_path``: ``cells/`` (each track's
  distinct blocking cells + per-cell max |lat|, the `track_cells`
  unit) and ``arrays/`` (each track's ts-ordered point array) — each
  batch committed as its own ``batch_id=N`` partition with OVERWRITE,
  so an at-least-once foreachBatch replay rewrites identical files
  instead of double-appending state rows (streaming/_state.py);
- per batch: cells + arrays are computed ONLY for the batch's tracks;
  candidates = new-vs-all (disk-explode the NEW side only, probe the
  union of old + new cell tables — old×old pairs were emitted by the
  batch that introduced them); the metric refine runs on candidate
  pairs only, loading old point arrays for just the candidate tracks
  (left-semi). Work per batch is O(batch + pairs), not O(corpus).
- parameter contract: ``max_dist_m`` / ``metric`` / ``zoom`` are
  pinned in ``_params.json`` on first commit; a later batch with
  different parameters fails loudly (changing the blocking zoom or
  threshold mid-stream would silently miss pairs).

Batch-equivalence oracle (tests/test_tracksim_stream.py): accumulated
incremental pairs == one-shot ``track_similarity_join`` over the
union of all fixes, for ANY batch split — under the append-only
contract that a track's fixes arrive COMPLETE in exactly one batch
(state commits are replay-idempotent; re-delivered PAIR outputs are
detectable via their ``batch_id`` column, the incremental_dedup
convention).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from tilegrab_spark.operators.dedup import _persist_signatures
from tilegrab_spark.streaming._state import check_params, commit_batch, load_state
from tilegrab_spark.operators.tracksim import (
    _arrow_refine,
    _hausdorff_expr,
    candidate_pairs_from_cells,
    resolve_block_zoom,
    track_cells,
    track_point_arrays,
)

__all__ = ["incremental_track_pairs", "stream_track_similarity"]


def incremental_track_pairs(
    new_fixes: DataFrame,
    state_path: str,
    *,
    batch_id: int,
    max_dist_m: float,
    metric: str = "hausdorff",
    refine: str = "arrow",
    zoom: int | None = None,
    track_col: str = "track_id",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    commit: bool = True,
) -> DataFrame:
    """Similar-track pairs INTRODUCED by this batch: every pair has at
    least one new track; old×old pairs are never re-emitted. Returns
    ``[track_a, track_b, dist_m]`` (a < b, metric distance ≤
    ``max_dist_m``).

    Contract: each track's fixes arrive complete in exactly one batch
    (track ids are append-only across batches). ``commit=True`` appends
    the batch's cell + array state AFTER the pair frame is materialized
    (the append cannot race the candidate join's scan)."""
    if metric not in ("hausdorff", "frechet"):
        raise ValueError(f"metric must be 'hausdorff' or 'frechet', got {metric!r}")
    if refine not in ("arrow", "catalyst"):
        raise ValueError(f"refine must be 'arrow' or 'catalyst', got {refine!r}")
    if refine == "catalyst" and metric != "hausdorff":
        raise ValueError("refine='catalyst' supports metric='hausdorff' only")
    z = resolve_block_zoom(max_dist_m, zoom)
    spark = new_fixes.sparkSession
    check_params(
        spark, state_path,
        {"max_dist_m": float(max_dist_m), "metric": metric, "zoom": z},
        write=commit,
    )
    cells_path = os.path.join(state_path, "cells")
    arrays_path = os.path.join(state_path, "arrays")

    new_cells = _persist_signatures(
        track_cells(new_fixes, z, track_col=track_col, lon_col=lon_col, lat_col=lat_col)
    )
    new_arrays = _persist_signatures(
        track_point_arrays(
            new_fixes, track_col=track_col, ts_col=ts_col,
            lon_col=lon_col, lat_col=lat_col,
        )
    )

    old_cells = load_state(spark, cells_path)
    if old_cells is not None:
        # enforce the append-only-track-ids contract: a track id
        # re-appearing in a LATER batch would leave two state rows per
        # track and silently fan out duplicate/incorrect pairs. Rows
        # from this batch's own batch_id are excluded — an
        # at-least-once replay legitimately sees its own prior write.
        stale = (
            new_cells.select(F.col("_t").alias("_track")).distinct()
            .join(
                old_cells.filter(F.col("batch_id") != int(batch_id))
                .select(F.col("_t").alias("_track")),
                "_track",
                "left_semi",
            )
            .limit(1)
            .collect()
        )
        if stale:
            raise ValueError(
                f"track id {stale[0]['_track']!r} in batch {batch_id} was "
                f"already committed by an earlier batch at {state_path}; "
                "each track's fixes must arrive complete in exactly one "
                "batch (use a fresh state_path to re-ingest)"
            )
    all_cells = (
        new_cells.unionByName(old_cells.select("_t", "_cx", "_cy", "_alat"))
        if old_cells is not None
        else new_cells
    )
    cand = _persist_signatures(
        candidate_pairs_from_cells(new_cells, all_cells, max_dist_m, z)
    )

    # point arrays for exactly the tracks a candidate pair references:
    # the new batch's own arrays plus a candidate-semi-joined read of
    # the persisted array table — the historical corpus is never
    # re-aggregated
    cand_tracks = (
        cand.select(F.col("track_a").alias("track"))
        .unionByName(cand.select(F.col("track_b").alias("track")))
        .distinct()
    )
    arrays = new_arrays
    old_arrays = load_state(spark, arrays_path)
    if old_arrays is not None:
        # left_anti vs the batch's own tracks makes the union idempotent
        # under file-index refresh: Spark's parquet WRITE (the commit
        # below) calls refreshByPath, which invalidates every cached
        # frame reading the state path and re-lists its files — a
        # post-commit action on the returned frame would otherwise see
        # the batch's own rows in the OLD table too and emit duplicate
        # pairs (caught by the multiset batch-equivalence test)
        arrays = arrays.unionByName(
            old_arrays.select("track", "pts")
            .join(new_arrays.select("track"), "track", "left_anti")
            .join(cand_tracks, "track", "left_semi")
        )
    a = arrays.select(F.col("track").alias("track_a"), F.col("pts").alias("_pa"))
    b = arrays.select(F.col("track").alias("track_b"), F.col("pts").alias("_pb"))
    paired = cand.join(a, "track_a").join(b, "track_b")
    if refine == "catalyst":
        out = paired.withColumn("dist_m", _hausdorff_expr(F.col("_pa"), F.col("_pb")))
    else:
        out = _arrow_refine(paired, metric)
    pairs = out.filter(F.col("dist_m") <= F.lit(float(max_dist_m))).select(
        "track_a", "track_b", "dist_m"
    )

    if commit:
        # snapshot BEFORE the state appends: localCheckpoint pins the
        # result as a materialized RDD scan, immune to the
        # refreshByPath cache invalidation the parquet writes below
        # trigger (a persist() would be silently dropped by it)
        pairs = pairs.localCheckpoint()
        # idempotent per-batch partitions: an at-least-once replay
        # overwrites its own batch_id=N dir instead of double-appending
        # (duplicated state rows would duplicate every later pair)
        commit_batch(new_cells, cells_path, batch_id)
        commit_batch(new_arrays, arrays_path, batch_id)
    return pairs


def stream_track_similarity(
    spark: SparkSession,
    landing_dir: str,
    state_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    *,
    schema,
    max_dist_m: float,
    metric: str = "hausdorff",
    zoom: int | None = None,
    track_col: str = "track_id",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    trigger_once: bool = True,
) -> StreamingQuery:
    """Structured-Streaming composition: parquet drops of completed
    tracks → per-batch incremental similar-pairs appended to
    ``pairs_path``; cell + array state grows alongside. foreachBatch is
    at-least-once on retries — the ``batch_id`` column on pairs and
    state rows makes replays detectable (the incremental_dedup
    convention)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            pairs = incremental_track_pairs(
                batch_df, state_path,
                batch_id=batch_id, max_dist_m=max_dist_m, metric=metric,
                zoom=zoom, track_col=track_col, ts_col=ts_col,
                lon_col=lon_col, lat_col=lat_col, commit=True,
            )
            pairs.withColumn("batch_id", F.lit(int(batch_id))).write.mode(
                "append"
            ).parquet(pairs_path)
        finally:
            batch_df.unpersist()
            from tilegrab_spark.operators.dedup import release_signature_caches

            release_signature_caches()

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
