"""MPEG audio frame-structure parser (kernels/mp3.py) + the
audio_metadata operator: real-world-file golden, synthetic stream
construction across versions/layers/tags/VBR headers, truncation,
fuzz never-crash, and the honest pcm_available=false contract
(PCM decode closed as environment-constrained — module docstring)."""

import numpy as np
import pytest

from tilegrab_spark.kernels.mp3 import Mp3Error, is_mp3, probe_mp3

REAL_MP3 = "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"


def _frame(version=1, layer=3, br_idx=9, sr_idx=0, pad=0, mono=False):
    """One structurally-valid frame (header + zero payload)."""
    vb = {1: 3, 2: 2, 25: 0}[version]
    lb = {3: 1, 2: 2, 1: 3}[layer]
    h = (0x7FF << 21) | (vb << 19) | (lb << 17) | (1 << 16)
    h |= (br_idx << 12) | (sr_idx << 10) | (pad << 9)
    h |= (3 if mono else 0) << 6
    head = h.to_bytes(4, "big")
    from tilegrab_spark.kernels.mp3 import _frame_geometry, _parse_header

    f = _parse_header(h)
    size, spf = _frame_geometry(f[0], f[1], f[2], f[3], f[4])
    return head + b"\x00" * (size - 4), spf


def _stream(n=7, **kw):
    fr, _ = _frame(**kw)
    return fr * n


class TestRealFile:
    def test_golden(self):
        d = open(REAL_MP3, "rb").read()
        m = probe_mp3(d)
        # golden facts, cross-checkable by hand: 9436-byte file, 32-byte
        # ID3v2.3 tag, MPEG-2 Layer III mono 22050 Hz CBR 64 kbps;
        # frame = 72*64000/22050 = 208.97 -> 208/209 bytes padded,
        # 45 frames tile the 9404 audio bytes EXACTLY
        assert m["codec"] == "mp3" and m["version"] == "MPEG-2"
        assert m["sample_rate"] == 22050 and m["channels"] == 1
        assert m["n_frames"] == 45 and m["n_samples"] == 45 * 576
        assert m["bitrate_kbps"] == 64 and m["vbr"] is False
        assert m["id3v2_bytes"] == 32 and m["frames_tile_exactly"] is True
        assert m["duration_ms"] == round(45 * 576 * 1000 / 22050)


class TestSyntheticStreams:
    @pytest.mark.parametrize(
        "version,layer,spf",
        [(1, 3, 1152), (2, 3, 576), (25, 3, 576), (1, 2, 1152), (1, 1, 384)],
    )
    def test_versions_layers_tile(self, version, layer, spf):
        s = _stream(9, version=version, layer=layer)
        m = probe_mp3(s)
        assert m["n_frames"] == 9 and m["frames_tile_exactly"]
        assert m["n_samples"] == 9 * spf
        assert m["layer"] == layer

    def test_padding_mix_tiles(self):
        a, _ = _frame(pad=0)
        b, _ = _frame(pad=1)
        m = probe_mp3(a + b + a + b + a)
        assert m["n_frames"] == 5 and m["frames_tile_exactly"]

    def test_id3v2_id3v1_ape_are_skipped(self):
        body = _stream(5)
        id3 = b"ID3\x03\x00\x00\x00\x00\x00\x14" + b"\x00" * 20
        tagv1 = b"TAG" + b"\x00" * 125
        m = probe_mp3(id3 + body + tagv1)
        assert m["n_frames"] == 5 and m["frames_tile_exactly"]
        assert m["id3v2_bytes"] == 30 and m["tag_tail_bytes"] == 128

    def test_apev2_tag_with_and_without_header_is_skipped(self):
        import struct

        body = _stream(4)

        def ape(has_header):
            # one dummy item; size = items + footer (32), per spec
            item = struct.pack("<II", 1, 0) + b"k\x00v"
            size = len(item) + 32
            flags = (1 << 31) if has_header else 0
            def block(is_header):
                return (b"APETAGEX" + struct.pack("<I", 2000)
                        + struct.pack("<I", size) + struct.pack("<I", 1)
                        + struct.pack("<I", flags | ((1 << 29) if is_header else 0))
                        + b"\x00" * 8)
            tag = item + block(False)
            if has_header:
                tag = block(True) + tag
            return tag

        for hh in (False, True):
            m = probe_mp3(body + ape(hh))
            assert m["n_frames"] == 4, hh
            assert m["frames_tile_exactly"] is True, hh
            assert m["tag_tail_bytes"] == (len(ape(hh))), hh

    def test_xing_header_overrides_counts(self):
        fr, _ = _frame(mono=False)  # MPEG-1 stereo: side info 32
        first = bytearray(fr)
        first[4 + 32 : 4 + 32 + 4] = b"Xing"
        first[4 + 36 : 4 + 40] = (1).to_bytes(4, "big")  # flags: frames
        first[4 + 40 : 4 + 44] = (1000).to_bytes(4, "big")
        m = probe_mp3(bytes(first) + fr * 4)
        assert m["n_frames"] == 1000 and m["n_samples"] == 1000 * 1152
        assert m["vbr"] is True

    def test_truncated_final_frame_flags_tiling(self):
        s = _stream(4)
        m = probe_mp3(s[:-50])
        assert m["n_frames"] == 4
        assert m["frames_tile_exactly"] is False

    def test_junk_prefix_resyncs_but_requires_chain(self):
        s = b"\x00junk\xff\xfb" + _stream(3)  # stray half-sync in junk
        m = probe_mp3(s)
        assert m["n_frames"] == 3

    def test_rejects(self):
        for bad in (b"", b"abc", b"\xff" * 64, b"RIFF" + b"\x00" * 64,
                    np.random.default_rng(0).bytes(4096)):
            assert not is_mp3(bad)
        with pytest.raises(Mp3Error):
            probe_mp3(b"OggS" + b"\x00" * 100)

    def test_fuzz_never_crashes(self):
        rng = np.random.default_rng(7)
        fr, _ = _frame()
        for i in range(200):
            n = int(rng.integers(0, 600))
            payload = bytes(rng.bytes(n))
            try:
                probe_mp3(payload)
            except Mp3Error:
                pass
            # bit-flipped real frames must also never escape Mp3Error
            mut = bytearray(fr * 2)
            j = int(rng.integers(0, len(mut)))
            mut[j] ^= 1 << int(rng.integers(0, 8))
            try:
                probe_mp3(bytes(mut))
            except Mp3Error:
                pass


class TestAudioMetadataOperator:
    def test_wav_and_mp3_and_garbage(self, spark):
        from tilegrab_spark.kernels.wav import encode_wav
        from tilegrab_spark.operators.multimodal import audio_metadata

        sr = 8000
        t = np.arange(sr) / sr
        pcm = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
        wav_bytes = encode_wav(pcm, sr)
        mp3_bytes = open(REAL_MP3, "rb").read()
        df = spark.createDataFrame(
            [("w", bytearray(wav_bytes)), ("m", bytearray(mp3_bytes)),
             ("g", bytearray(b"not audio at all"))],
            "clip_id string, bytes binary",
        )
        rows = {r["clip_id"]: r for r in audio_metadata(df).collect()}
        w = rows["w"]
        assert w["parse_ok"] and w["pcm_available"]
        assert w["container"] == "riff" and w["sample_rate"] == sr
        assert w["n_samples"] == sr and w["duration_ms"] == 1000
        m = rows["m"]
        assert m["parse_ok"] and not m["pcm_available"]  # honest: no PCM
        assert m["container"] == "mpeg" and m["codec"] == "mp3"
        assert m["sample_rate"] == 22050 and m["bitrate_kbps"] == 64
        g = rows["g"]
        assert not g["parse_ok"] and not g["pcm_available"]

    def test_stereo_wav_reports_real_channel_count(self, spark):
        import struct

        from tilegrab_spark.operators.multimodal import audio_metadata

        sr, n = 8000, 400
        inter = np.zeros(n * 2, "<i2")
        inter[0::2] = 1000
        inter[1::2] = -1000
        payload = inter.tobytes()
        fmt = struct.pack("<HHIIHH", 1, 2, sr, sr * 4, 4, 16)
        riff = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
                + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(payload)) + payload)
        df = spark.createDataFrame(
            [("s", bytearray(riff))], "clip_id string, bytes binary"
        )
        r = audio_metadata(df).collect()[0]
        assert r["channels"] == 2  # fmt chunk, not the mono-mixed decode
        assert r["n_samples"] == n and r["sample_rate"] == sr


class TestVideoMetadataOperator:
    def test_avi_gif_and_garbage(self, spark):
        from tilegrab_spark.kernels.avi import encode_avi_mjpeg
        from tilegrab_spark.kernels.jpeg import encode_jpeg
        from tilegrab_spark.operators.multimodal import video_metadata

        rng = np.random.default_rng(3)
        frames = [
            encode_jpeg(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8))
            for _ in range(8)
        ]
        avi_bytes = encode_avi_mjpeg(frames, 4.0, 16, 16)
        df = spark.createDataFrame(
            [("a", bytearray(avi_bytes)), ("g", bytearray(b"GIF89a_truncated")),
             ("x", bytearray(b"\x00" * 64))],
            "video_id string, bytes binary",
        )
        rows = {r["video_id"]: r for r in video_metadata(df).collect()}
        # single-frame GIF through the real gif branch
        from tilegrab_spark.kernels.gif import encode_gif

        gif_bytes = encode_gif(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8))
        gdf = spark.createDataFrame(
            [("gg", bytearray(gif_bytes))], "video_id string, bytes binary"
        )
        gg = video_metadata(gdf).collect()[0]
        assert gg["parse_ok"] and gg["frames_available"]
        assert gg["container"] == "gif" and gg["n_frames"] == 1
        assert gg["width"] == 8 and gg["height"] == 8
        a = rows["a"]
        assert a["parse_ok"] and a["frames_available"]
        assert a["codec"] == "mjpeg" and a["n_frames"] == 8
        assert a["fps"] == 4.0 and a["duration_ms"] == 2000
        assert a["width"] == 16 and a["height"] == 16
        assert not rows["g"]["parse_ok"]  # truncated GIF surfaces, no crash
        assert not rows["x"]["parse_ok"]
