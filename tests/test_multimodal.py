"""Multimodal binary-column plumbing: decode/feature/resize real for our
PNG payloads; codec-stubbed paths raise/flag cleanly; UDTF row fan-out."""

import numpy as np
import pytest

from tilegrab_spark.kernels import png
from tilegrab_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def img_df(spark):
    rows = []
    for i in range(4):
        arr = png.synth_tile_pixels(i, i + 1, 5, 0)
        rows.append((f"img{i}", bytearray(png.encode_png(arr, filter_type=2)), 256, 256, "png"))
    rows.append(("bad", bytearray(b"not a png, and fmt says jpeg"), 1, 1, "jpg"))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def test_image_features(img_df):
    out = {r.image_id: r for r in mm.image_features(img_df).collect()}
    assert len(out) == 5
    for i in range(4):
        r = out[f"img{i}"]
        arr = png.synth_tile_pixels(i, i + 1, 5, 0)
        assert r.decode_ok
        assert r.mean_r == pytest.approx(arr[:, :, 0].mean(), abs=1e-9)
        assert r.phash == png.phash64(arr)
    # stubbed codec flags, doesn't crash the batch
    assert out["bad"].decode_ok is False


def test_resize_block_mean(spark):
    arr = png.synth_tile_pixels(3, 4, 6, 0)
    df = spark.createDataFrame(
        [("a", bytearray(png.encode_png(arr)), 256, 256, "png")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    r = mm.resize_images(df, tw=64, th=64).collect()[0]
    thumb = png.decode_png(bytes(r.thumb))
    want = arr.reshape(64, 4, 64, 4, 3).mean(axis=(1, 3)).astype(np.uint8)
    assert (thumb == want).all()


def test_audio_features_fake_pcm(spark):
    payload = np.arange(2048, dtype="<i2").tobytes()
    df = spark.createDataFrame(
        [("c0", bytearray(payload), 16000)], "clip_id string, bytes binary, sr int"
    )
    # raw-PCM interpretation of headerless bytes is an explicit opt-in
    r = mm.audio_features(df, fake_decode=True).collect()[0]
    pcm = np.frombuffer(payload, dtype="<i2").astype(np.float64)
    assert r.n_samples == 2048
    assert r.rms == pytest.approx(float(np.sqrt((pcm**2).mean())))


def test_audio_features_default_surfaces_non_wav(spark):
    """Default path is HONEST: non-WAV bytes (an MP3-shaped payload) come
    back decode_ok=false with zeroed features, never raw-PCM garbage
    marked ok."""
    mp3ish = b"\xff\xfb\x90\x00" + bytes(range(256)) * 4  # MPEG frame sync
    df = spark.createDataFrame(
        [("c0", bytearray(mp3ish), 44100)], "clip_id string, bytes binary, sr int"
    )
    r = mm.audio_features(df).collect()[0]
    assert not r.decode_ok and r.n_samples == 0 and r.rms == 0.0


def test_sample_frames_default_surfaces_non_avi(spark):
    """Default path for non-AVI video bytes: one frame_idx=-1 sentinel
    row per input, not fake frames."""
    df = spark.createDataFrame(
        [("v0", bytearray(b"\x00\x00\x00\x18ftypmp42" + b"z" * 500), 3000)],
        "video_id string, bytes binary, duration_ms long",
    )
    out = mm.sample_frames(df, every_ms=1000).collect()
    assert len(out) == 1 and out[0].frame_idx == -1 and out[0].frame is None


def test_frame_sampling_fanout(spark):
    df = spark.createDataFrame(
        [("v0", bytearray(bytes(range(256)) * 8), 5500), ("v1", bytearray(b"xy" * 100), 800)],
        "video_id string, bytes binary, duration_ms long",
    )
    # fake 8x8-slice decoder is an explicit opt-in (plumbing test path)
    out = mm.sample_frames(df, every_ms=1000, fake_decode=True).collect()
    v0 = [r for r in out if r.video_id == "v0"]
    v1 = [r for r in out if r.video_id == "v1"]
    assert len(v0) == 5 and len(v1) == 1
    assert [r.ts_ms for r in sorted(v0, key=lambda r: r.frame_idx)] == [0, 1000, 2000, 3000, 4000]
    assert all(len(bytes(r.frame)) == 64 for r in out)


def test_decode_summary_surfaces_undecodable(spark):
    """Corrupt payloads of any format (here: a truncated webp and a
    truncated png) surface as decode_ok=false counts in the per-format
    summary — never silently dropped."""
    import pandas as pd

    from tilegrab_spark.kernels import png
    from tilegrab_spark.operators.multimodal import decode_summary, image_features

    arr = png.synth_tile_pixels(1, 2, 3, 0, 16, 16)
    rows = [
        {"image_id": "a", "bytes": png.encode_png(arr), "w": 16, "h": 16, "fmt": "png"},
        {"image_id": "b", "bytes": b"RIFF....WEBPVP8L", "w": 16, "h": 16, "fmt": "webp"},
        {"image_id": "c", "bytes": b"\x89PNG but truncated", "w": 16, "h": 16, "fmt": "png"},
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows), "image_id string, bytes binary, w int, h int, fmt string"
    )
    s = {r.fmt: r for r in decode_summary(image_features(df)).collect()}
    assert s["png"].n == 2 and s["png"].n_decoded == 1 and s["png"].n_failed == 1
    assert s["webp"].n == 1 and s["webp"].n_decoded == 0 and s["webp"].n_failed == 1
    assert s["webp"].decode_rate == 0.0


def test_image_quality_signals(img_df):
    out = {r.image_id: r for r in mm.image_quality_signals(img_df).collect()}
    assert len(out) == 5
    for i in range(4):
        r = out[f"img{i}"]
        arr = png.synth_tile_pixels(i, i + 1, 5, 0)
        gray = arr.mean(axis=2)
        lap = (
            4.0 * gray[1:-1, 1:-1]
            - gray[:-2, 1:-1] - gray[2:, 1:-1]
            - gray[1:-1, :-2] - gray[1:-1, 2:]
        )
        hist = np.bincount(
            np.clip(np.rint(gray), 0, 255).astype(np.int64).ravel(), minlength=256
        )
        p = hist[hist > 0] / gray.size
        assert r.decode_ok
        assert r.sharpness == pytest.approx(lap.var(), rel=1e-12)
        assert r.entropy_bits == pytest.approx(-(p * np.log2(p)).sum(), abs=1e-12)
        assert r.contrast == pytest.approx(gray.std(), rel=1e-12)
        assert r.brightness == pytest.approx(gray.mean(), rel=1e-12)
        assert r.n_dark == int((arr < 10).all(axis=2).sum())
        assert r.n_bright == int((arr > 245).all(axis=2).sum())
        assert r.n_px == 256 * 256
    assert out["bad"].decode_ok is False and out["bad"].sharpness is None


def test_image_quality_flags_flat_and_clipped(spark):
    flat = np.full((32, 32, 3), 128, dtype=np.uint8)       # zero entropy, blur
    dark = np.zeros((32, 32, 3), dtype=np.uint8)           # all-dark clip
    noise = (np.random.default_rng(0).integers(0, 256, (32, 32, 3))
             .astype(np.uint8))
    rows = [
        ("flat", bytearray(png.encode_png(flat)), 32, 32, "png"),
        ("dark", bytearray(png.encode_png(dark)), 32, 32, "png"),
        ("noise", bytearray(png.encode_png(noise)), 32, 32, "png"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    out = {r.image_id: r for r in mm.image_quality_signals(df).collect()}
    assert out["flat"].sharpness == 0.0 and out["flat"].entropy_bits == 0.0
    assert out["dark"].n_dark == 32 * 32 and out["dark"].n_bright == 0
    # real texture: sharper, higher-entropy than the flat card
    assert out["noise"].sharpness > 100.0
    assert out["noise"].entropy_bits > 4.0
    assert out["noise"].saturation > out["flat"].saturation
