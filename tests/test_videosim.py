"""Video fingerprint matching — containment oracle: an engine-encoded
frame sequence embedded at a known frame offset inside a longer video,
re-encoded at a DIFFERENT JPEG quality, must pair with the correct
offset; disjoint content must not pair."""

import numpy as np
import pytest

from tilegrab_spark.kernels.avi import encode_avi_mjpeg
from tilegrab_spark.kernels.jpeg import encode_jpeg
from tilegrab_spark.operators.videosim import video_fingerprints, video_match_pairs

W = H = 96


def _frame(seed):
    """Distinctive per-seed content: random 12x12 block brightness —
    coarse structure survives JPEG requantization, so phash is stable
    across qualities but differs across seeds."""
    rng = np.random.default_rng(seed)
    blocks = rng.integers(30, 225, (8, 8), dtype=np.uint8)
    g = np.kron(blocks, np.ones((H // 8, W // 8), dtype=np.uint8))
    return np.stack([g, g, g], axis=2)


def _avi(seeds, quality):
    frames = [encode_jpeg(_frame(s), quality) for s in seeds]
    return encode_avi_mjpeg(frames, 10.0, W, H)


def _table(spark, rows):
    return spark.createDataFrame(rows, "video_id string, payload binary")


def test_embedded_sequence_found_at_offset_across_quality(spark):
    clip_seeds = list(range(100, 108))          # 8-frame clip
    long_seeds = list(range(200, 205)) + clip_seeds + list(range(300, 307))
    rows = [
        ("clip", bytearray(_avi(clip_seeds, quality=90))),
        ("long", bytearray(_avi(long_seeds, quality=60))),   # re-encoded
        ("other", bytearray(_avi(list(range(400, 410)), quality=90))),
    ]
    pairs = video_match_pairs(video_fingerprints(_table(spark, rows)), min_votes=4).collect()
    got = {(r.id_a, r.id_b): (r.offset_frames, r.votes) for r in pairs}
    assert ("clip", "long") in got
    off, votes = got[("clip", "long")]
    assert off == 5  # clip starts at frame 5 of the long video
    assert votes >= 4
    assert not any("other" in k for k in got)


def test_identical_video_matches_at_zero(spark):
    seeds = list(range(10, 20))
    rows = [
        ("a", bytearray(_avi(seeds, quality=90))),
        ("b", bytearray(_avi(seeds, quality=75))),
    ]
    got = {
        (r.id_a, r.id_b): r.offset_frames
        for r in video_match_pairs(video_fingerprints(_table(spark, rows)), min_votes=5).collect()
    }
    assert got == {("a", "b"): 0}


def test_malformed_and_empty_surface(spark):
    rows = [
        ("bad", bytearray(b"RIFFxxxxAVI nope")),
        ("ok", bytearray(_avi(list(range(5)), quality=90))),
    ]
    fps = video_fingerprints(_table(spark, rows)).collect()
    by_id = {}
    for r in fps:
        by_id.setdefault(r.video_id, []).append(r)
    assert [r.decode_ok for r in by_id["bad"]] == [False]
    assert by_id["bad"][0].phash is None
    assert len(by_id["ok"]) == 5 and all(r.decode_ok for r in by_id["ok"])
    assert sorted(r.t for r in by_id["ok"]) == [0, 1, 2, 3, 4]


def test_determinism_and_validation(spark):
    rows = [("v", bytearray(_avi(list(range(6)), quality=90)))]
    f1 = sorted((r.t, r.phash) for r in video_fingerprints(_table(spark, rows)).collect())
    f2 = sorted(
        (r.t, r.phash)
        for r in video_fingerprints(_table(spark, rows).repartition(3)).collect()
    )
    assert f1 == f2
    fps = video_fingerprints(_table(spark, rows))
    with pytest.raises(ValueError, match="min_votes"):
        video_match_pairs(fps, min_votes=0)
    with pytest.raises(ValueError, match="max_hamming"):
        video_match_pairs(fps, max_hamming=-1)
