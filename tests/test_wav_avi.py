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


class TestAdpcm:
    """IMA (0x11) and Microsoft (0x02) ADPCM — the compressed WAV
    codecs, decoded vectorized across blocks."""

    @pytest.mark.parametrize("fmt,min_snr_db", [
        ("ima_adpcm", 22.0), ("ms_adpcm", 22.0),
    ])
    def test_roundtrip_snr_and_compression(self, fmt, min_snr_db):
        rng = np.random.default_rng(7)
        sig = np.clip(tone() + rng.normal(0, 180, 8000), -32768, 32767)
        b = wav.encode_wav(sig, 8000, fmt=fmt)
        out, sr = wav.decode_wav(b)
        assert sr == 8000 and len(out) == len(sig)  # fact-chunk truncation
        snr = 10 * np.log10(np.mean(sig ** 2) / np.mean((out - sig) ** 2))
        assert snr >= min_snr_db
        assert len(b) < 0.30 * (2 * len(sig))  # genuinely ~4:1 compressed

    def test_ima_core_bit_exact_vs_audioop(self):
        """The per-nibble IMA update is the same algorithm CPython's
        audioop implements (Intel/DVI ADPCM); same nibble stream + same
        initial state must produce IDENTICAL samples. audioop packs the
        first sample in the HIGH nibble where WAV IMA uses LOW-first,
        so the bytes are swapped before the oracle call."""
        audioop = pytest.importorskip("audioop")
        rng = np.random.default_rng(11)
        x = np.concatenate([[0], np.clip(rng.normal(0, 4000, 504), -32768, 32767)])
        blk = wav._encode_ima_mono(x, 256)
        pred0 = int.from_bytes(blk[:2], "little", signed=True)
        mine = wav._decode_ima_blocks(
            np.frombuffer(blk, np.uint8).reshape(1, 256), 1)[0, :, 0]
        swapped = bytes(((c & 0x0F) << 4) | (c >> 4) for c in blk[4:256])
        dec, _ = audioop.adpcm2lin(swapped, 2, (pred0, blk[2]))
        oracle = np.frombuffer(dec, "<i2").astype(np.float64)
        assert np.array_equal(mine[1:], oracle)

    def test_ima_stereo_channel_separation(self):
        """A stereo block decodes each channel exactly as the same
        header+group would decode as mono (4-byte channel groups)."""
        import struct
        h0 = struct.pack("<hBB", 100, 5, 0)
        h1 = struct.pack("<hBB", -200, 9, 0)
        g0 = bytes([0x12, 0x34, 0x56, 0x78])
        g1 = bytes([0x9A, 0xBC, 0xDE, 0xF0])
        st = wav._decode_ima_blocks(
            np.frombuffer(h0 + h1 + g0 + g1, np.uint8).reshape(1, 16), 2)
        m0 = wav._decode_ima_blocks(
            np.frombuffer(h0 + g0, np.uint8).reshape(1, 8), 1)
        m1 = wav._decode_ima_blocks(
            np.frombuffer(h1 + g1, np.uint8).reshape(1, 8), 1)
        assert np.array_equal(st[0, :, 0], m0[0, :, 0])
        assert np.array_equal(st[0, :, 1], m1[0, :, 0])

    def test_ms_vs_independent_scalar_decoder(self):
        """Vectorized MS decode vs a from-the-spec scalar loop written
        independently of the kernel (stereo: nibbles alternate
        channels, high nibble first)."""
        import struct

        def scalar(bpred, idelta, s1, s2, nibs):
            c1 = [256, 512, 0, 192, 240, 460, 392][bpred]
            c2 = [0, -256, 0, 64, 0, -208, -232][bpred]
            ad = [230, 230, 230, 230, 307, 409, 512, 614,
                  768, 614, 512, 409, 307, 230, 230, 230]
            out = [s2, s1]
            for nib in nibs:
                s = nib - 16 if nib >= 8 else nib
                p = (s1 * c1 + s2 * c2) >> 8
                new = max(-32768, min(32767, p + s * idelta))
                s2, s1 = s1, new
                idelta = max(16, (ad[nib] * idelta) >> 8)
                out.append(new)
            return out

        blk = (bytes([0, 1]) + struct.pack("<hh", 40, 60)
               + struct.pack("<hh", 1000, -500)
               + struct.pack("<hh", 900, -400)
               + bytes([0x37, 0xC2, 0x51, 0x8F]))
        st = wav._decode_ms_blocks(
            np.frombuffer(blk, np.uint8).reshape(1, len(blk)), 2)
        nibs = [0x3, 0x7, 0xC, 0x2, 0x5, 0x1, 0x8, 0xF]
        assert list(st[0, :, 0]) == scalar(0, 40, 1000, 900, nibs[0::2])
        assert list(st[0, :, 1]) == scalar(1, 60, -500, -400, nibs[1::2])

    def test_malformed_adpcm_raises(self):
        import struct
        good = wav.encode_wav(tone(2000), 8000, fmt="ms_adpcm")
        i = good.find(b"data")
        # predictor index 9 (>= 7) in the first block header
        b = bytearray(good)
        b[i + 8] = 9
        with pytest.raises(ValueError, match="predictor index"):
            wav.decode_wav(bytes(b))
        good = wav.encode_wav(tone(2000), 8000, fmt="ima_adpcm")
        i = good.find(b"data")
        b = bytearray(good)
        b[i + 8 + 2] = 120  # step index > 88
        with pytest.raises(ValueError, match="step index"):
            wav.decode_wav(bytes(b))

    def test_adpcm_fuzz_contract(self):
        """Mutated ADPCM streams decode or raise ValueError — never
        another exception class (the codec fuzz contract)."""
        rng = np.random.default_rng(23)
        for fmt in ("ima_adpcm", "ms_adpcm"):
            base = wav.encode_wav(
                np.clip(rng.normal(0, 5000, 2000), -32768, 32767),
                8000, fmt=fmt)
            for seed in range(40):
                r = np.random.default_rng(seed)
                for _ in range(10):
                    b = bytearray(base)
                    b[int(r.integers(0, len(b)))] ^= int(r.integers(1, 256))
                    try:
                        wav.decode_wav(bytes(b))
                    except ValueError:
                        pass

    def test_audio_features_adpcm(self, spark):
        """The multimodal audio path decodes compressed ADPCM WAVs with
        the honest default (no fake_decode opt-in needed)."""
        from tilegrab_spark.operators.multimodal import audio_features
        sig = tone(4000)
        rows = [("ima", bytearray(wav.encode_wav(sig, 8000, fmt="ima_adpcm")), 0),
                ("ms", bytearray(wav.encode_wav(sig, 8000, fmt="ms_adpcm")), 0),
                ("pcm", bytearray(wav.encode_wav(sig, 8000, fmt="pcm16")), 0)]
        df = spark.createDataFrame(rows, "clip_id string, bytes binary, sr int")
        got = {r.clip_id: r for r in audio_features(df).collect()}
        assert all(got[k].decode_ok for k in ("ima", "ms", "pcm"))
        ref = got["pcm"]
        for k in ("ima", "ms"):
            assert got[k].sr == ref.sr == 8000
            assert got[k].n_samples == ref.n_samples
            assert abs(got[k].rms - ref.rms) / ref.rms < 0.05


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
