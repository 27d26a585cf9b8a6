"""Incremental audio/video fingerprint dedup — the media siblings of
streaming/incremental_dedup.py (text LSH) and tracksim_stream.py
(trajectories): a persisted FINGERPRINT TABLE accumulates landmark /
per-frame-phash rows per media item ever seen; each batch fingerprints
ONLY its own payloads, finds candidate pairs new-vs-all, and emits the
pairs it introduces. Historical audio is never re-FFT'd, historical
video never re-decoded — work per batch is O(batch + pairs).

Exactness contract (the batch-recompute oracle,
tests/test_fingerprint_stream.py): accumulated incremental pairs ==
the one-shot ``audio_match_pairs`` / ``video_match_pairs`` over the
union of all payloads, for ANY batch split. Guaranteed by:

- the candidate gate is NEVER-LOSS: a pair with ``votes ≥ min_votes``
  shares at least one hash (audio) / one phash band (video), so it
  surfaces as a candidate the moment its newer member arrives;
- votes are then RECOMPUTED by the one-shot matcher itself over the
  fingerprint rows of just the candidate ids (semi-joined — the
  corpus-sized table never re-joins), inner-joined back to the
  candidate pairs so old×old pairs (emitted by an earlier batch) are
  excluded. Same vote arithmetic as one-shot, by construction.

Refresh-safety (the tracksim_stream lesson): the state read excludes
the batch's own ids (left-anti) so Spark's post-write refreshByPath
re-list cannot double-count the batch against itself, and the result
is ``localCheckpoint``-ed before the state append. Parameters are
pinned in ``_params.json`` — changing fingerprint geometry mid-stream
would silently stop matching (hashes from different frame/hop settings
never collide), so it fails loudly instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from tilegrab_spark.operators.audiosim import audio_fingerprints, audio_match_pairs
from tilegrab_spark.operators.dedup import _persist_owned, _release_owned
from tilegrab_spark.operators.videosim import video_fingerprints, video_match_pairs
from tilegrab_spark.streaming._state import check_params, commit_batch, load_state

__all__ = ["incremental_audio_pairs", "incremental_video_pairs"]


def _incremental_pairs(
    new_fps: DataFrame,
    state_path: str,
    *,
    batch_id: int,
    id_col: str,
    sig_col: str,
    cand_keys,
    match,
    commit: bool,
) -> DataFrame:
    """Shared core: new-vs-all candidate gate on ``cand_keys`` columns
    of the (already key-exploded) signature rows, one-shot ``match``
    over the candidate ids' fingerprints, inner join back to candidate
    pairs, refresh-safe commit."""
    spark = new_fps.sparkSession
    fps_path = os.path.join(state_path, "fingerprints")
    owned: list = []
    new_fps = _persist_owned(new_fps, owned)

    old = load_state(spark, fps_path)
    cols = new_fps.columns
    if old is not None:
        old = (
            old.select(*cols)
            .join(new_fps.select(id_col).distinct(), id_col, "left_anti")
        )
        all_fps = new_fps.unionByName(old)
    else:
        all_fps = new_fps

    ok_new = new_fps.filter(F.col("decode_ok") & F.col(sig_col).isNotNull())
    ok_all = all_fps.filter(F.col("decode_ok") & F.col(sig_col).isNotNull())
    a = ok_new.select(F.col(id_col).alias("_na"), *cand_keys)
    b = ok_all.select(F.col(id_col).alias("_nb"), *cand_keys)
    cand = _persist_owned(
        a.join(b, list(cand_keys))
        .filter(F.col("_na") != F.col("_nb"))
        .select(
            F.least("_na", "_nb").alias("id_a"),
            F.greatest("_na", "_nb").alias("id_b"),
        )
        .distinct(),
        owned,
    )
    ids = (
        cand.select(F.col("id_a").alias(id_col))
        .unionByName(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    subset = all_fps.join(ids, id_col, "left_semi")
    pairs = match(subset).join(cand, ["id_a", "id_b"])

    if commit:
        pairs = pairs.localCheckpoint()
        # idempotent per-batch partition (streaming/_state.py): an
        # at-least-once replay rewrites identical files — a plain
        # append would duplicate fingerprint rows and double every
        # later pair's votes
        commit_batch(new_fps, fps_path, batch_id)
        # pairs is materialized and the state is committed — release
        # exactly this batch's cache handles (identity-based, safe
        # under interleaved foreachBatch streams in one driver) so a
        # long-lived driver doesn't accumulate MEMORY_AND_DISK blocks
        _release_owned(owned)
    # commit=False (dry run): the returned frame is lazy over the
    # persisted inputs — callers must release_signature_caches() when
    # done with it (same contract as stream_track_similarity)
    return pairs


def incremental_audio_pairs(
    new_df: DataFrame,
    state_path: str,
    *,
    batch_id: int,
    id_col: str = "audio_id",
    audio_col: str = "payload",
    min_votes: int = 5,
    frame_len: int = 2048,
    hop: int = 1024,
    n_peaks: int = 5,
    fanout: int = 3,
    commit: bool = True,
) -> DataFrame:
    """Audio match pairs INTRODUCED by this batch (≥ 1 new item per
    pair; votes identical to the one-shot matcher over the union).
    Returns ``[id_a, id_b, offset_frames, votes]``."""
    check_params(
        new_df.sparkSession, state_path,
        {"kind": "audio", "frame_len": frame_len, "hop": hop,
         "n_peaks": n_peaks, "fanout": fanout, "min_votes": int(min_votes)},
        write=commit,
    )
    new_fps = audio_fingerprints(
        new_df, id_col=id_col, audio_col=audio_col,
        frame_len=frame_len, hop=hop, n_peaks=n_peaks, fanout=fanout,
    )
    return _incremental_pairs(
        new_fps, state_path,
        batch_id=batch_id, id_col=id_col, sig_col="hash",
        cand_keys=["hash"],
        match=lambda fps: audio_match_pairs(fps, id_col=id_col, min_votes=min_votes),
        commit=commit,
    )


def incremental_video_pairs(
    new_df: DataFrame,
    state_path: str,
    *,
    batch_id: int,
    id_col: str = "video_id",
    video_col: str = "payload",
    min_votes: int = 3,
    max_hamming: int = 3,
    commit: bool = True,
) -> DataFrame:
    """Video match pairs INTRODUCED by this batch — candidate gate =
    shared phash band (a superset of hamming ≤ max_hamming matches, so
    never-loss); votes identical to the one-shot matcher."""
    check_params(
        new_df.sparkSession, state_path,
        {"kind": "video", "min_votes": int(min_votes),
         "max_hamming": int(max_hamming)},
        write=commit,
    )
    from tilegrab_spark.operators.videosim import phash_band_col

    new_fps = video_fingerprints(new_df, id_col=id_col, video_col=video_col)

    def with_bands(fps: DataFrame) -> DataFrame:
        # the SAME band split as video_match_pairs (phash_band_col) —
        # a divergent split would desynchronize the candidate gate
        return fps.withColumn("_b", phash_band_col()).select(
            "*", F.col("_b.band").alias("band"), F.col("_b.bval").alias("bval")
        ).drop("_b")

    # the persisted state holds BANDED rows (4 per frame) so the shared
    # core's equi-join gate works on (band, bval); the matcher gets the
    # raw fingerprint rows back by dropping the band columns + distinct
    new_banded = with_bands(
        new_fps.filter(F.col("decode_ok") & F.col("phash").isNotNull())
    )
    return _incremental_pairs(
        new_banded, state_path,
        batch_id=batch_id, id_col=id_col, sig_col="phash",
        cand_keys=["band", "bval"],
        match=lambda fps: video_match_pairs(
            fps.drop("band", "bval").distinct(),
            id_col=id_col, min_votes=min_votes, max_hamming=max_hamming,
        ),
        commit=commit,
    )
