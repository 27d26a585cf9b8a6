"""Real audio (RIFF/WAVE, kernels/wav.py) and video (MJPEG-AVI,
kernels/avi.py) paths — the round-3 upgrade of the multimodal stubs to
genuine decoders for the stdlib-decodable formats."""

import numpy as np
import pytest

from tilegrab_spark.kernels import avi, jpeg, wav


def tone(n=8000, sr=8000):
    t = np.arange(n) / sr
    return 12000 * np.sin(2 * np.pi * 440 * t) + 3000 * np.sin(2 * np.pi * 97 * t)


class TestWav:
    @pytest.mark.parametrize("fmt,tol", [
        ("pcm16", 1.0), ("float32", 1.0), ("mulaw", 900.0), ("alaw", 1100.0),
    ])
    def test_roundtrip(self, fmt, tol):
        pcm = tone()
        dec, sr = wav.decode_wav(wav.encode_wav(pcm, 8000, fmt=fmt))
        assert sr == 8000 and len(dec) == len(pcm)
        assert np.abs(dec - np.clip(np.rint(pcm), -32768, 32767)).max() <= tol

    def test_g711_monotonic_and_zero(self):
        xs = np.linspace(-32000, 32000, 801)
        for enc, dec in ((wav._mulaw_encode, wav._mulaw_decode),
                         (wav._alaw_encode, wav._alaw_decode)):
            d = dec(enc(xs))
            assert np.all(np.diff(d) >= 0)  # companding is monotone
        assert wav._mulaw_decode(wav._mulaw_encode(np.array([0.0])))[0] == 0.0

    def test_stereo_mono_mix_and_24bit(self):
        pcm = tone(1000)
        stereo = np.stack([pcm, -pcm], axis=1).reshape(-1)  # L cancels R
        data = wav.encode_wav(stereo, 16000, fmt="pcm16")
        # rewrite channel count to 2 in the fmt chunk
        import struct
        b = bytearray(data)
        i = data.find(b"fmt ")
        struct.pack_into("<H", b, i + 8 + 2, 2)
        dec, sr = wav.decode_wav(bytes(b))
        assert len(dec) == 1000 and np.abs(dec).max() <= 0.51  # mono mix ~0

    def test_malformed_raises(self):
        good = wav.encode_wav(tone(256), 8000)
        for bad in (b"RIFFxxxxWAVE", good[:30], b"not a wav",
                    good.replace(b"data", b"dada")):
            with pytest.raises(ValueError):
                wav.decode_wav(bad)

    def test_unsupported_codec_raises(self):
        import struct
        data = bytearray(wav.encode_wav(tone(64), 8000))
        i = bytes(data).find(b"fmt ")
        struct.pack_into("<H", data, i + 8, 85)  # MP3 format tag
        with pytest.raises(ValueError, match="ffmpeg"):
            wav.decode_wav(bytes(data))


def _frame(i, h=32, w=48):
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    return np.clip(
        np.stack([100 + xx + i * 10, 90 + yy, 80 + (xx + yy) / 2], -1), 0, 255
    ).astype(np.uint8)


class TestAvi:
    def test_mjpeg_roundtrip(self):
        frames = [jpeg.encode_jpeg(_frame(i), quality=92) for i in range(6)]
        info = avi.read_avi_mjpeg(avi.encode_avi_mjpeg(frames, 12.0, 48, 32))
        assert info["fps"] == pytest.approx(12.0)
        assert (info["w"], info["h"], len(info["frames"])) == (48, 32, 6)
        for i in (0, 3, 5):
            assert jpeg.psnr(jpeg.decode_jpeg(info["frames"][i]), _frame(i)) > 40

    def test_non_mjpeg_handler_rejected(self):
        frames = [jpeg.encode_jpeg(_frame(0), quality=90)]
        data = avi.encode_avi_mjpeg(frames, 10.0, 48, 32)
        with pytest.raises(ValueError, match="ffmpeg"):
            avi.read_avi_mjpeg(data.replace(b"vidsMJPG", b"vidsH264"))

    def test_malformed_raises(self):
        good = avi.encode_avi_mjpeg(
            [jpeg.encode_jpeg(_frame(0), quality=90)], 10.0, 48, 32)
        for bad in (b"RIFF\x04\x00\x00\x00AVI ", good[:50], b"zzz"):
            with pytest.raises(ValueError):
                avi.read_avi_mjpeg(bad)


class TestMultimodalIntegration:
    def test_audio_features_real_wav(self, spark):
        from tilegrab_spark.operators.multimodal import audio_features

        pcm = tone()
        rows = [("real", bytearray(wav.encode_wav(pcm, 8000)), 0),
                ("ulaw", bytearray(wav.encode_wav(pcm, 16000, fmt="mulaw")), 0)]
        df = spark.createDataFrame(rows, "clip_id string, bytes binary, sr int")
        got = {r.clip_id: r for r in audio_features(df).collect()}
        # sample rate comes from the FILE, not the column
        assert got["real"].sr == 8000 and got["ulaw"].sr == 16000
        want_rms = float(np.sqrt((np.rint(pcm) ** 2).mean()))
        assert got["real"].rms == pytest.approx(want_rms, rel=1e-3)
        assert got["ulaw"].rms == pytest.approx(want_rms, rel=0.02)  # companded

    def test_sample_frames_real_mjpeg(self, spark):
        from tilegrab_spark.kernels import png
        from tilegrab_spark.operators.multimodal import sample_frames

        frames = [jpeg.encode_jpeg(_frame(i), quality=92) for i in range(10)]
        data = avi.encode_avi_mjpeg(frames, 10.0, 48, 32)  # 1 s of video
        df = spark.createDataFrame(
            [("v", bytearray(data), 1000)],
            "video_id string, bytes binary, duration_ms long",
        )
        out = sorted(sample_frames(df, every_ms=500).collect(),
                     key=lambda r: r.frame_idx)
        # 10 fps, every 500 ms -> frames 0 and 5
        assert [r.frame_idx for r in out] == [0, 5]
        assert [r.ts_ms for r in out] == [0, 500]
        got = png.decode_png(bytes(out[1].frame))
        assert jpeg.psnr(got, _frame(5)) > 40


class TestFailureSurfacing:
    def test_corrupt_wav_surfaces_not_fails(self, spark):
        from tilegrab_spark.operators.multimodal import audio_features

        good = wav.encode_wav(tone(512), 8000)
        bad = good[:60]  # truncated data chunk -> strict decoder raises
        df = spark.createDataFrame(
            [("ok", bytearray(good), 0), ("bad", bytearray(bad), 0)],
            "clip_id string, bytes binary, sr int",
        )
        got = {r.clip_id: r for r in audio_features(df).collect()}
        assert got["ok"].decode_ok and got["ok"].n_samples == 512
        assert not got["bad"].decode_ok and got["bad"].n_samples == 0

    def test_corrupt_avi_emits_sentinel_row(self, spark):
        from tilegrab_spark.operators.multimodal import sample_frames

        frames = [jpeg.encode_jpeg(_frame(0), quality=90)]
        good = avi.encode_avi_mjpeg(frames, 10.0, 48, 32)
        bad = good[:len(good) // 2]
        df = spark.createDataFrame(
            [("ok", bytearray(good), 100), ("bad", bytearray(bad), 100)],
            "video_id string, bytes binary, duration_ms long",
        )
        out = sample_frames(df, every_ms=100).collect()
        ok = [r for r in out if r.video_id == "ok"]
        badr = [r for r in out if r.video_id == "bad"]
        assert len(ok) == 1 and ok[0].frame_idx == 0
        assert len(badr) == 1 and badr[0].frame_idx == -1 and badr[0].frame is None


class TestReviewFixes:
    def test_extensible_wav_subformat(self):
        """WAVE_FORMAT_EXTENSIBLE: real code read from the parsed fmt
        chunk's subformat GUID, not by re-scanning the file."""
        import struct
        pcm = tone(256)
        base = wav.encode_wav(pcm, 8000, fmt="pcm16")
        i = base.find(b"fmt ")
        # rebuild with a 40-byte extensible fmt chunk (code 0xFFFE,
        # cbSize 22, subformat starting with 0x0001 = PCM)
        fmt_body = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        fmt_body += struct.pack("<HHI", 22, 16, 3) + struct.pack("<H", 1) + b"\x00" * 14
        j = base.find(b"data")
        data_chunk = base[j:]
        out = base[:i] + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body + data_chunk
        out = b"RIFF" + struct.pack("<I", len(out) - 8) + out[8:]
        dec, sr = wav.decode_wav(out)
        assert sr == 8000 and len(dec) == 256

    def test_mulaw_wrong_bitdepth_rejected(self):
        import struct
        data = bytearray(wav.encode_wav(tone(64), 8000, fmt="mulaw"))
        i = bytes(data).find(b"fmt ")
        struct.pack_into("<H", data, i + 8 + 14, 16)  # bits 8 -> 16
        with pytest.raises(ValueError, match="8-bit"):
            wav.decode_wav(bytes(data))

    def test_avi_second_stream_chunks_ignored(self):
        """Frame chunks are filtered by the matched video stream's
        number — a '01dc' chunk from another stream must not leak in."""
        import struct
        frames = [jpeg.encode_jpeg(_frame(i), quality=90) for i in range(2)]
        data = avi.encode_avi_mjpeg(frames, 10.0, 48, 32)
        # splice a foreign '01dc' chunk into movi (before idx1)
        k = data.find(b"idx1")
        foreign = b"01dc" + struct.pack("<I", 4) + b"junk"
        spliced = data[:k] + foreign + data[k:]
        # fix RIFF and movi LIST sizes
        b = bytearray(spliced)
        struct.pack_into("<I", b, 4, len(spliced) - 8)
        m = spliced.find(b"LIST", 100)
        while m >= 0 and spliced[m + 8:m + 12] != b"movi":
            m = spliced.find(b"LIST", m + 1)
        (old_sz,) = struct.unpack_from("<I", spliced, m + 4)
        struct.pack_into("<I", b, m + 4, old_sz + len(foreign))
        info = avi.read_avi_mjpeg(bytes(b))
        assert len(info["frames"]) == 2  # the foreign chunk was ignored

    def test_avi_blank_handler_strf_decides(self):
        frames = [jpeg.encode_jpeg(_frame(0), quality=90)]
        data = avi.encode_avi_mjpeg(frames, 10.0, 48, 32)
        blank = data.replace(b"vidsMJPG", b"vids\x00\x00\x00\x00")
        # strf biCompression still says MJPG -> accepted
        info = avi.read_avi_mjpeg(blank)
        assert len(info["frames"]) == 1
        # strf says raw DIB -> rejected with the clear error
        raw = blank.replace(struct_pack_mjpg(), struct_pack_dib())
        with pytest.raises(ValueError, match="biCompression"):
            avi.read_avi_mjpeg(raw)


def struct_pack_mjpg():
    import struct
    return struct.pack("<HH4s", 1, 24, b"MJPG")


def struct_pack_dib():
    import struct
    return struct.pack("<HH4s", 1, 24, b"\x00\x00\x00\x00")
