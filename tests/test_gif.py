"""GIF codec (kernels/gif.py): LZW + interlace round-trips, a
hand-built-from-the-spec animation as the composition oracle (no PIL
in the runtime), allocation bombs, and the Spark image path."""

import struct

import numpy as np
import pytest

from tilegrab_spark.kernels import gif


def _img(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    out = np.stack([(xx * 4) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256], -1)
    out = (out // 32) * 32
    out[..., 2] = (out[..., 2] // 64) * 64  # keep <= 256 distinct colors
    return out.astype(np.uint8)


class TestRoundTrip:
    def test_plain(self):
        img = _img()
        assert np.array_equal(gif.decode_gif(gif.encode_gif(img)), img)

    def test_interlaced(self):
        img = _img(37, 53)  # odd dims exercise the 4-pass row counts
        b = gif.encode_gif(img, interlace=True)
        assert np.array_equal(gif.decode_gif(b), img)

    def test_noise_palette_dict_resets(self):
        """256-color noise maximizes LZW dictionary churn (forces the
        4096-entry reset path in both encoder and decoder)."""
        rng = np.random.default_rng(5)
        pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
        img = pal[rng.integers(0, 256, (100, 120))]
        assert np.array_equal(gif.decode_gif(gif.encode_gif(img)), img)

    def test_two_color_and_single_pixel(self):
        tiny = np.zeros((3, 3, 3), np.uint8)
        tiny[1, 1] = 255
        assert np.array_equal(gif.decode_gif(gif.encode_gif(tiny)), tiny)
        one = np.full((1, 1, 3), 7, np.uint8)
        assert np.array_equal(gif.decode_gif(gif.encode_gif(one)), one)

    def test_too_many_colors_raises(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
        with pytest.raises(ValueError, match="256 distinct colors"):
            gif.encode_gif(img)


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _frame_bytes(fx, fy, idx: np.ndarray, mcs=2) -> bytes:
    h, w = idx.shape
    out = struct.pack("<BHHHHB", 0x2C, fx, fy, w, h, 0)
    return out + bytes([mcs]) + _sub_blocks(
        gif._lzw_encode(idx.reshape(-1).astype(np.uint8), mcs))


def _gce(disposal=0, transparent=None, delay_cs=0) -> bytes:
    flags = (disposal & 7) << 2 | (1 if transparent is not None else 0)
    return bytes([0x21, 0xF9, 4, flags]) + struct.pack(
        "<H", delay_cs) + bytes([transparent or 0, 0])


class TestAnimationSpec:
    """Hand-built multi-frame streams — an oracle independent of the
    encoder: every byte below comes straight from the GIF89a spec."""

    PAL = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])  # K R G B

    def _header(self, w, h):
        # GCT flag set, size field 1 -> 4 entries
        return b"GIF89a" + struct.pack("<HHBBB", w, h, 0x81, 0, 0) + self.PAL

    def test_transparency_composites_over_previous(self):
        f1 = np.full((4, 4), 1, np.uint8)          # all red
        f2 = np.array([[2, 0], [0, 2]], np.uint8)  # green with transparent 0s
        data = (self._header(4, 4)
                + _frame_bytes(0, 0, f1)
                + _gce(transparent=0, delay_cs=5)
                + _frame_bytes(1, 1, f2)
                + b"\x3b")
        frames = gif.decode_gif_frames(data)
        assert len(frames) == 2 and frames[1][1] == 50  # delay in ms
        canvas = frames[1][0]
        assert tuple(canvas[1, 1]) == (0, 255, 0)   # green painted
        assert tuple(canvas[2, 2]) == (0, 255, 0)
        assert tuple(canvas[1, 2]) == (255, 0, 0)   # transparent -> red
        assert tuple(canvas[0, 0]) == (255, 0, 0)   # outside frame 2

    def test_disposal_restore_background_and_previous(self):
        f1 = np.full((4, 4), 1, np.uint8)
        patch = np.full((2, 2), 2, np.uint8)
        f3 = np.full((1, 1), 3, np.uint8)
        data = (self._header(4, 4)
                + _frame_bytes(0, 0, f1)
                + _gce(disposal=3)               # restore-previous
                + _frame_bytes(0, 0, patch)
                + _frame_bytes(3, 3, f3)
                + b"\x3b")
        frames = gif.decode_gif_frames(data)
        assert len(frames) == 3
        assert tuple(frames[1][0][0, 0]) == (0, 255, 0)  # patch visible
        # after disposal 3 the patch region reverted to frame 1's red
        assert tuple(frames[2][0][0, 0]) == (255, 0, 0)
        assert tuple(frames[2][0][3, 3]) == (0, 0, 255)

    def test_first_frame_is_decode_gif(self):
        f1 = np.full((4, 4), 1, np.uint8)
        data = self._header(4, 4) + _frame_bytes(0, 0, f1) + b"\x3b"
        assert np.array_equal(gif.decode_gif(data),
                              np.tile(np.array([255, 0, 0], np.uint8), (4, 4, 1)))

    def test_frame_outside_canvas_rejected(self):
        f = np.full((3, 3), 1, np.uint8)
        data = self._header(4, 4) + _frame_bytes(2, 2, f) + b"\x3b"
        with pytest.raises(ValueError, match="outside the logical canvas"):
            gif.decode_gif(data)


class TestHostileInputs:
    def test_canvas_bomb_rejected(self):
        data = bytearray(gif.encode_gif(_img(8, 8)))
        struct.pack_into("<HH", data, 6, 65535, 65535)
        with pytest.raises(ValueError, match="pixel decode cap"):
            gif.decode_gif(bytes(data))

    def test_not_a_gif(self):
        with pytest.raises(ValueError, match="not a GIF"):
            gif.decode_gif(b"PNG...nope")

    def test_truncation_and_missing_trailer(self):
        good = gif.encode_gif(_img(8, 8))
        for cut in (7, 12, len(good) // 2, len(good) - 1):
            with pytest.raises(ValueError):
                gif.decode_gif(good[:cut])

    def test_lzw_short_stream_rejected(self):
        """Frame declares more pixels than the LZW stream produces."""
        img = _img(8, 8)
        data = bytearray(gif.encode_gif(img))
        # grow the frame height field (descriptor follows the 18-byte
        # header + 3*GCT); find the 0x2C introducer instead of assuming
        i = bytes(data).index(b"\x2c")
        struct.pack_into("<H", data, i + 7, 64)
        # also grow the canvas so the bounds check passes
        struct.pack_into("<H", data, 8, 64)
        with pytest.raises(ValueError):
            gif.decode_gif(bytes(data))

    def test_index_outside_color_table(self):
        """Indices past the palette must raise, not wrap or segfault."""
        idx = np.full((4, 4), 3, np.uint8)  # palette has 4 entries: ok
        data = (b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x81, 0, 0)
                + TestAnimationSpec.PAL + _frame_bytes(0, 0, idx) + b"\x3b")
        gif.decode_gif(data)  # boundary index decodes
        # shrink the declared GCT to 2 entries -> index 3 now invalid
        data2 = (b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80, 0, 0)
                 + TestAnimationSpec.PAL[:6] + _frame_bytes(0, 0, idx) + b"\x3b")
        with pytest.raises(ValueError, match="outside the color table"):
            gif.decode_gif(data2)


class TestSparkIntegration:
    def test_image_features_gif(self, spark):
        from tilegrab_spark.operators.multimodal import image_features
        img = _img()
        rows = [("g1", bytearray(gif.encode_gif(img)), 64, 48, "gif"),
                ("g2", bytearray(gif.encode_gif(img, interlace=True)), 64, 48, "gif"),
                ("bad", bytearray(gif.encode_gif(img)[:40]), 64, 48, "gif")]
        df = spark.createDataFrame(
            rows, "image_id string, bytes binary, w int, h int, fmt string")
        got = {r.image_id: r for r in image_features(df).collect()}
        assert got["g1"].decode_ok and got["g2"].decode_ok
        assert not got["bad"].decode_ok
        # identical pixels -> identical features across plain/interlaced
        assert got["g1"].phash == got["g2"].phash
        assert got["g1"].mean_r == pytest.approx(float(img[..., 0].mean()))

    def test_sample_frames_animated_gif(self, spark):
        """sample_frames emits the frame at-or-after each every_ms tick
        using the per-frame delays (0 delay counts as 100 ms)."""
        from tilegrab_spark.kernels import png as pngk
        from tilegrab_spark.operators.multimodal import sample_frames

        pal = TestAnimationSpec.PAL
        frames = b""
        for color in (1, 2, 3, 1, 2, 3):  # 6 frames, 40 ms apart
            frames += _gce(delay_cs=4) + _frame_bytes(
                0, 0, np.full((4, 4), color, np.uint8))
        data = (b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x81, 0, 0)
                + pal + frames + b"\x3b")
        df = spark.createDataFrame(
            [("v", bytearray(data), 0),
             ("bad", bytearray(data[:20]), 0)],
            "video_id string, bytes binary, duration_ms int")
        rows = sorted(sample_frames(df, every_ms=100).collect(),
                      key=lambda r: (r.video_id, r.frame_idx))
        bad = [r for r in rows if r.video_id == "bad"]
        assert len(bad) == 1 and bad[0].frame_idx == -1
        good = [r for r in rows if r.video_id == "v"]
        # ticks at 0,100,200 ms -> frames 0 (0ms), 3 (120ms), 5 (200ms)
        assert [(r.frame_idx, r.ts_ms) for r in good] == [
            (0, 0), (3, 120), (5, 200)]
        rgb = pngk.decode_png(bytes(good[1].frame))
        assert tuple(rgb[0, 0]) == (255, 0, 0)  # frame 3 painted color 1
