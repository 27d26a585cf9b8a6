"""Audio landmark fingerprinting — containment recovery oracle: engine-
encoded clips embedded at KNOWN offsets inside longer recordings must
match with the correct offset; disjoint content must not pair."""

import numpy as np
import pytest

from tilegrab_spark.kernels.wav import encode_wav
from tilegrab_spark.operators.audiosim import audio_fingerprints, audio_match_pairs

SR = 8000
HOP = 1024


def _clip(seed, seconds=4.0):
    """Deterministic broadband clip: a handful of random tones with
    random phases + a chirp — peaky spectrum, good landmarks."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    x = np.zeros_like(t)
    for _ in range(8):
        f = float(rng.uniform(200, 3200))
        x += float(rng.uniform(0.4, 1.0)) * np.sin(2 * np.pi * f * t + float(rng.uniform(0, 6.28)))
    x += 0.5 * np.sin(2 * np.pi * (300 + 400 * t) * t)
    x = x / np.max(np.abs(x)) * 12000.0
    return x


def _embed(clip, seed, total_seconds=10.0, offset_seconds=3.0, noise=300.0):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, noise, int(total_seconds * SR))
    k = int(offset_seconds * SR)
    x[k : k + len(clip)] += clip
    return x


def _wav(x, fmt="pcm16"):
    return encode_wav(np.clip(x, -32767, 32767), SR, fmt=fmt)


def _table(spark, rows):
    return spark.createDataFrame(rows, "audio_id string, payload binary")


def test_embedded_clip_found_with_correct_offset(spark):
    clip = _clip(1)
    offset_s = 3.0
    rows = [
        ("clip", bytearray(_wav(clip))),
        ("long", bytearray(_wav(_embed(clip, 2, offset_seconds=offset_s)))),
        ("other", bytearray(_wav(_clip(9)))),
    ]
    fps = audio_fingerprints(_table(spark, rows))
    pairs = audio_match_pairs(fps, min_votes=5).collect()
    got = {(r.id_a, r.id_b): (r.offset_frames, r.votes) for r in pairs}
    assert ("clip", "long") in got
    off, votes = got[("clip", "long")]
    # recovered offset in frames ≈ embedding offset (within one hop)
    assert abs(off * HOP / SR - offset_s) <= HOP / SR
    assert votes >= 5
    assert not any("other" in k for k in got)


def test_mulaw_reencode_still_matches(spark):
    clip = _clip(3)
    rows = [
        ("orig", bytearray(_wav(clip))),
        ("mulaw", bytearray(_wav(clip, fmt="mulaw"))),
        ("noise", bytearray(_wav(np.random.default_rng(4).normal(0, 800, 4 * SR)))),
    ]
    fps = audio_fingerprints(_table(spark, rows))
    got = {
        (r.id_a, r.id_b): r.offset_frames
        for r in audio_match_pairs(fps, min_votes=5).collect()
    }
    assert got.get(("mulaw", "orig")) == 0  # same content, zero offset
    assert not any("noise" in k for k in got)


def test_bad_payload_surfaces_and_short_clip_keeps_id(spark):
    rows = [
        ("bad", bytearray(b"not a wav at all")),
        ("tiny", bytearray(_wav(np.zeros(100)))),
        ("ok", bytearray(_wav(_clip(5)))),
    ]
    fps = audio_fingerprints(_table(spark, rows)).collect()
    by_id = {}
    for r in fps:
        by_id.setdefault(r.audio_id, []).append(r)
    assert [r.decode_ok for r in by_id["bad"]] == [False]
    assert by_id["bad"][0].hash is None
    assert [r.decode_ok for r in by_id["tiny"]] == [True]
    assert by_id["tiny"][0].hash is None
    assert all(r.decode_ok and r.hash is not None for r in by_id["ok"])
    assert len(by_id["ok"]) > 50


def test_fingerprints_deterministic_and_validation(spark):
    rows = [("a", bytearray(_wav(_clip(7))))]
    f1 = sorted(
        (r.hash, r.t) for r in audio_fingerprints(_table(spark, rows)).collect()
    )
    f2 = sorted(
        (r.hash, r.t)
        for r in audio_fingerprints(_table(spark, rows).repartition(4)).collect()
    )
    assert f1 == f2
    with pytest.raises(ValueError, match="frame_len"):
        audio_fingerprints(_table(spark, rows), frame_len=1000)
    with pytest.raises(ValueError, match="hop"):
        audio_fingerprints(_table(spark, rows), hop=0)
    with pytest.raises(ValueError, match="min_votes"):
        audio_match_pairs(audio_fingerprints(_table(spark, rows)), min_votes=0)


def test_chunked_peak_finding_is_output_invariant(spark, monkeypatch):
    """The bounded-memory chunked framing must produce byte-identical
    fingerprints: shrink the chunk so a 4 s clip crosses many chunk
    boundaries and compare against the default single-chunk path."""
    import tilegrab_spark.operators.audiosim as A

    rows = [("a", bytearray(_wav(_clip(13))))]
    base = sorted(
        (r.hash, r.t) for r in audio_fingerprints(_table(spark, rows)).collect()
    )
    monkeypatch.setattr(A, "_PEAK_CHUNK_FRAMES", 5)
    tiny = sorted(
        (r.hash, r.t) for r in audio_fingerprints(_table(spark, rows)).collect()
    )
    assert tiny == base and len(base) > 50
