"""BMP codec (kernels/bmp.py) + decode_payload routing for BMP/TIFF."""

import struct

import numpy as np
import pytest

from tilegrab_spark.kernels import bmp


def _img(h=47, w=63):
    rng = np.random.default_rng(9)
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


class TestBmp:
    def test_roundtrip_24bit_odd_stride(self):
        img = _img()  # w=63 -> 189-byte rows padded to 192
        assert np.array_equal(bmp.decode_bmp(bmp.encode_bmp(img)), img)

    def test_top_down(self):
        img = _img()
        data = bmp.encode_bmp(img)
        b = bytearray(data)
        struct.pack_into("<i", b, 22, -47)  # negative height = top-down
        stride = (63 * 3 + 3) & ~3
        rows = np.frombuffer(data[54:], np.uint8).reshape(47, stride)
        assert np.array_equal(
            bmp.decode_bmp(bytes(b[:54]) + rows[::-1].tobytes()), img)

    @staticmethod
    def _paletted(idx: np.ndarray, pal: np.ndarray, compression: int,
                  body: bytes) -> bytes:
        h, w = idx.shape
        pal_bgra = np.zeros((256, 4), np.uint8)
        pal_bgra[:, :3] = pal[:, ::-1]
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, compression,
                           len(body), 0, 0, 256, 0)
        hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + 1024 + len(body),
                          0, 0, 14 + 40 + 1024)
        return hdr + info + pal_bgra.tobytes() + body

    def test_8bit_palette(self):
        rng = np.random.default_rng(3)
        pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
        idx = rng.integers(0, 256, (20, 30)).astype(np.uint8)
        stride = (30 + 3) & ~3
        rows = np.zeros((20, stride), np.uint8)
        rows[:, :30] = idx[::-1]
        out = bmp.decode_bmp(self._paletted(idx, pal, 0, rows.tobytes()))
        assert np.array_equal(out, pal[idx])

    def test_rle8(self):
        """Encoded runs, end-of-line, absolute literals, delta, EOB —
        every RLE8 opcode, against a hand-derived expectation."""
        rng = np.random.default_rng(4)
        pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
        rle = bytes([
            8, 5,          # bottom row: 8 pixels of color 5
            0, 0,          # end of line
            3, 1, 5, 2,    # row 2: 3x color1 + 5x color2
            0, 0,
            0, 3, 9, 8, 7, 0,  # absolute run of 3 literals (padded)
            0, 2, 2, 1,    # delta: skip 2 right, 1 up
            2, 6,          # 2 pixels of color 6 at the new position
            0, 1,          # end of bitmap
        ])
        exp = np.zeros((4, 8), np.uint8)
        exp[3, :] = 5
        exp[2, :3] = 1
        exp[2, 3:] = 2
        exp[1, :3] = [9, 8, 7]
        exp[0, 5:7] = 6
        out = bmp.decode_bmp(self._paletted(exp, pal, 1, rle))
        assert np.array_equal(out, pal[exp])

    def test_32bit_alpha_dropped(self):
        img = _img()
        bgra = np.concatenate(
            [img[::-1, :, ::-1], np.full((47, 63, 1), 7, np.uint8)], -1)
        info = struct.pack("<IiiHHIIiiII", 40, 63, 47, 1, 32, 0,
                           bgra.nbytes, 0, 0, 0, 0)
        hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + bgra.nbytes, 0, 0, 54)
        assert np.array_equal(
            bmp.decode_bmp(hdr + info + bgra.tobytes()), img)

    def test_hostile_inputs(self):
        good = bmp.encode_bmp(_img(8, 8))
        with pytest.raises(ValueError, match="not a BMP"):
            bmp.decode_bmp(b"PNG")
        for cut in (10, 40, len(good) // 2):
            with pytest.raises(ValueError):
                bmp.decode_bmp(good[:cut])
        b = bytearray(good)
        struct.pack_into("<ii", b, 18, 1 << 15, 1 << 14)
        with pytest.raises(ValueError, match="pixel decode cap"):
            bmp.decode_bmp(bytes(b))

    def test_fuzz_contract(self):
        base = bmp.encode_bmp(_img(16, 16))
        for seed in range(60):
            r = np.random.default_rng(seed)
            for _ in range(10):
                x = bytearray(base)
                if r.integers(0, 2):
                    x = x[: int(r.integers(1, len(x)))]
                else:
                    x[int(r.integers(0, len(x)))] ^= int(r.integers(1, 256))
                try:
                    bmp.decode_bmp(bytes(x))
                except ValueError:
                    pass


class TestPayloadRouting:
    def test_bmp_and_tiff_through_image_features(self, spark):
        from tilegrab_spark.kernels import geotiff
        from tilegrab_spark.operators.multimodal import image_features
        img = _img(32, 32)
        tif = geotiff.encode_geotiff(img, (0.0, 0.0, 32.0, 32.0), epsg=3857)
        rows = [("b", bytearray(bmp.encode_bmp(img)), 32, 32, "bmp"),
                ("t", bytearray(tif), 32, 32, "tif"),
                ("x", bytearray(b"BMnope"), 32, 32, "bmp")]
        df = spark.createDataFrame(
            rows, "image_id string, bytes binary, w int, h int, fmt string")
        got = {r.image_id: r for r in image_features(df).collect()}
        assert got["b"].decode_ok and got["t"].decode_ok
        assert not got["x"].decode_ok
        assert got["b"].mean_r == pytest.approx(float(img[..., 0].mean()))
        assert got["b"].phash == got["t"].phash  # same pixels, two formats
