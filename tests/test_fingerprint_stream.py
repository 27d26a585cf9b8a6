"""Incremental media fingerprint dedup — batch-recompute oracle:
accumulated per-batch pairs (ids, offsets AND votes) must equal the
one-shot matcher over the union, for multiple batch splits; multiset
discipline (no duplicates, no re-emission); parameter pinning."""

import numpy as np
import pytest

from tilegrab_spark.operators.audiosim import audio_fingerprints, audio_match_pairs
from tilegrab_spark.operators.dedup import release_signature_caches
from tilegrab_spark.operators.videosim import video_fingerprints, video_match_pairs
from tilegrab_spark.streaming.fingerprint_stream import (
    incremental_audio_pairs,
    incremental_video_pairs,
)
from tests.test_audiosim import _clip, _embed, _wav
from tests.test_videosim import _avi


def _audio_rows():
    c1, c2 = _clip(1), _clip(2)
    return [
        ("clip1", bytearray(_wav(c1))),
        ("long1", bytearray(_wav(_embed(c1, 11, offset_seconds=3.0)))),
        ("clip2", bytearray(_wav(c2))),
        ("long2", bytearray(_wav(_embed(c2, 12, offset_seconds=1.0)))),
        ("noise", bytearray(_wav(np.random.default_rng(7).normal(0, 500, 32000)))),
        ("bad", bytearray(b"nope")),
    ]


def _video_rows():
    a = list(range(100, 108))
    b = list(range(500, 508))
    return [
        ("va", bytearray(_avi(a, quality=90))),
        ("vlong", bytearray(_avi(list(range(200, 204)) + a + list(range(300, 305)), quality=60))),
        ("vb", bytearray(_avi(b, quality=90))),
        ("vb2", bytearray(_avi(b, quality=70))),
        ("vother", bytearray(_avi(list(range(700, 710)), quality=90))),
    ]


def _collect_pairs(frame):
    rows = frame.collect()
    keys = [(r.id_a, r.id_b) for r in rows]
    assert len(keys) == len(set(keys))
    return {(r.id_a, r.id_b): (r.offset_frames, r.votes) for r in rows}


@pytest.mark.parametrize(
    "splits",
    [
        [["clip1", "noise"], ["long1", "clip2", "bad"], ["long2"]],
        [["long2", "long1"], ["clip2", "clip1", "noise", "bad"]],
    ],
)
def test_incremental_audio_equals_one_shot(spark, tmp_path, splits):
    rows = _audio_rows()
    df = spark.createDataFrame(rows, "audio_id string, payload binary")
    want = _collect_pairs(audio_match_pairs(audio_fingerprints(df), min_votes=5))
    got = {}
    for i, names in enumerate(splits):
        batch = spark.createDataFrame(
            [r for r in rows if r[0] in names], "audio_id string, payload binary"
        )
        pairs = _collect_pairs(
            incremental_audio_pairs(
                batch, str(tmp_path / "st"), batch_id=i, min_votes=5
            )
        )
        assert not set(pairs) & set(got)  # no re-emission
        got.update(pairs)
        release_signature_caches()
    assert got == want
    assert ("clip1", "long1") in got and ("clip2", "long2") in got


def test_incremental_video_equals_one_shot(spark, tmp_path):
    rows = _video_rows()
    df = spark.createDataFrame(rows, "video_id string, payload binary")
    want = _collect_pairs(video_match_pairs(video_fingerprints(df), min_votes=4))
    got = {}
    for i, names in enumerate([["va", "vother"], ["vlong", "vb"], ["vb2"]]):
        batch = spark.createDataFrame(
            [r for r in rows if r[0] in names], "video_id string, payload binary"
        )
        pairs = _collect_pairs(
            incremental_video_pairs(
                batch, str(tmp_path / "st"), batch_id=i, min_votes=4
            )
        )
        assert not set(pairs) & set(got)
        got.update(pairs)
        release_signature_caches()
    assert got == want
    assert ("va", "vlong") in got and ("vb", "vb2") in got


def test_params_pinned(spark, tmp_path):
    rows = _audio_rows()[:1]
    df = spark.createDataFrame(rows, "audio_id string, payload binary")
    incremental_audio_pairs(df, str(tmp_path / "s"), batch_id=0, min_votes=5)
    release_signature_caches()
    with pytest.raises(ValueError, match="fresh state_path"):
        incremental_audio_pairs(df, str(tmp_path / "s"), batch_id=1, min_votes=4)
    with pytest.raises(ValueError, match="fresh state_path"):
        incremental_audio_pairs(df, str(tmp_path / "s"), batch_id=1, hop=512)
    with pytest.raises(ValueError, match="fresh state_path"):
        # a video stream may not reuse an audio state dir
        incremental_video_pairs(
            spark.createDataFrame(_video_rows()[:1], "video_id string, payload binary"),
            str(tmp_path / "s"),
            batch_id=1,
        )
    release_signature_caches()


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Re-running a committed batch (same batch_id) must not duplicate
    fingerprint state — later batches would double every pair's votes."""
    rows = _audio_rows()
    b0 = spark.createDataFrame(
        [r for r in rows if r[0] == "clip1"], "audio_id string, payload binary"
    )
    for _ in range(2):  # original + replay
        incremental_audio_pairs(b0, str(tmp_path / "st"), batch_id=0, min_votes=5)
        release_signature_caches()
    b1 = spark.createDataFrame(
        [r for r in rows if r[0] == "long1"], "audio_id string, payload binary"
    )
    got = _collect_pairs(
        incremental_audio_pairs(b1, str(tmp_path / "st"), batch_id=1, min_votes=5)
    )
    release_signature_caches()
    df = spark.createDataFrame(
        [r for r in rows if r[0] in ("clip1", "long1")], "audio_id string, payload binary"
    )
    want = _collect_pairs(audio_match_pairs(audio_fingerprints(df), min_votes=5))
    assert got == want  # votes exactly one-shot — no doubling from replay


def test_commit_path_releases_cache_handles(spark, tmp_path):
    """A committed batch must leave no cache handles in the global
    registry — a long-lived foreachBatch driver would otherwise
    accumulate MEMORY_AND_DISK blocks per batch (commit=False dry runs
    keep the stream_track_similarity contract: caller releases)."""
    from tilegrab_spark.operators.dedup import _SIG_CACHE_HANDLES

    release_signature_caches()
    df = spark.createDataFrame(
        _audio_rows()[:1], "audio_id string, payload binary"
    )
    incremental_audio_pairs(df, str(tmp_path / "s"), batch_id=0, min_votes=5)
    assert len(_SIG_CACHE_HANDLES) == 0


def test_owned_release_is_interleaving_safe(spark):
    """Two interleaved owners (two foreachBatch streams in one driver):
    releasing A's handles must not unpersist or deregister B's."""
    from tilegrab_spark.operators.dedup import (
        _SIG_CACHE_HANDLES,
        _persist_owned,
        _release_owned,
    )

    release_signature_caches()
    a_owned, b_owned = [], []
    fa = _persist_owned(spark.range(10), a_owned)
    fb = _persist_owned(spark.range(20), b_owned)
    fa2 = _persist_owned(spark.range(30), a_owned)
    assert len(_SIG_CACHE_HANDLES) == 3
    assert _release_owned(a_owned) == 2
    assert len(_SIG_CACHE_HANDLES) == 1
    assert _SIG_CACHE_HANDLES[0] is fb
    assert fb.storageLevel.useMemory  # B's cache survived A's release
    assert not fa.storageLevel.useMemory
    _release_owned(b_owned)
    assert len(_SIG_CACHE_HANDLES) == 0
