"""Kernel goldens — pure numpy, no Spark (fast gate).

Golden values are the reference's own test assertions
(tests/test_dataset.py:15-21) and FIXTURES.md §4 derivations.
"""

import json

import numpy as np
import pytest

from tilegrab_spark.kernels import geo, png


@pytest.fixture(scope="module")
def t_ring_4326():
    doc = json.load(open("/root/reference/tests/data/T.geojson"))
    ring = np.array(doc["features"][0]["geometry"]["coordinates"][0][0])
    lon, lat = geo.mercator_to_lonlat(ring[:, 0], ring[:, 1])
    return np.column_stack([lon, lat])


def test_reprojection_golden_bbox(t_ring_4326):
    # reference tests/test_dataset.py:15-21 asserts to 9 places
    lon, lat = t_ring_4326[:, 0], t_ring_4326[:, 1]
    assert lon.min() == pytest.approx(80.59111369868114, abs=1e-9)
    assert lat.max() == pytest.approx(7.267703227740259, abs=1e-9)
    assert lat.min() == pytest.approx(7.253238366601672, abs=1e-9)
    assert lon.max() == pytest.approx(80.60679900129578, abs=1e-9)


def test_mercator_roundtrip():
    lon = np.linspace(-179, 179, 41)
    lat = np.linspace(-84, 84, 41)
    x, y = geo.lonlat_to_mercator(lon, lat)
    lon2, lat2 = geo.mercator_to_lonlat(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_tile_bounds_golden():
    # FIXTURES.md §4.3 (derived from tiles/tile.py:58-77)
    b = geo.tile_bounds(23712, 16265, 15)
    assert b[0] == pytest.approx(80.5078125, abs=1e-12)
    assert b[1] == pytest.approx(1.2962761196418153, abs=1e-12)
    assert b[2] == pytest.approx(80.518798828125, abs=1e-12)
    assert b[3] == pytest.approx(1.3072596122756706, abs=1e-12)


def test_encode_decode_inverse():
    # encoding the center of a tile's bounds returns the tile
    rng = np.random.default_rng(42)
    for z in (2, 8, 15, 18):
        n = 1 << z
        xs = rng.integers(0, n, 50)
        ys = rng.integers(0, n, 50)
        mnl, mnt, mxl, mxt = geo.tile_bounds(xs, ys, z)
        cx, cy = (mnl + mxl) / 2, (mnt + mxt) / 2
        ex, ey = geo.lonlat_to_tile(cx, cy, z)
        np.testing.assert_array_equal(ex, xs)
        np.testing.assert_array_equal(ey, ys)


def test_epsilon_edge_next_tile():
    # a point exactly on a tile's right edge counts in the next tile
    # (EPSILON nudging, collection.py:104-107)
    mnl, mnt, mxl, mxt = geo.tile_bounds(100, 100, 10)
    x, _ = geo.lonlat_to_tile(mxl, (mnt + mxt) / 2, 10)
    assert int(x) == 101


def test_golden_tile_sets(t_ring_4326):
    lon, lat = t_ring_4326[:, 0], t_ring_4326[:, 1]
    bbox = (lon.min(), lat.min(), lon.max(), lat.max())
    expected = {12: (2, 2), 14: (4, 3), 15: (9, 5), 16: (16, 7)}
    for zoom, (nb, ns) in expected.items():
        x0, x1, y0, y1 = geo.bbox_tile_range(*bbox, zoom)
        xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1), indexing="ij")
        xs, ys = xs.ravel(), ys.ravel()
        assert len(xs) == nb
        mnl, mnt, mxl, mxt = geo.tile_bounds(xs, ys, zoom)
        hit = geo.boxes_intersect_polygons(mnl, mnt, mxl, mxt, [[t_ring_4326]])
        assert int(hit.sum()) == ns


def test_box_polygon_edge_cases():
    tri = [np.array([[0.0, 0.0], [4.0, 0.0], [2.0, 4.0]])]
    # box fully inside
    assert geo.boxes_intersect_polygons([1.8], [0.5], [2.2], [1.0], [tri])[0]
    # polygon fully inside box
    assert geo.boxes_intersect_polygons([-1], [-1], [5], [5], [tri])[0]
    # disjoint
    assert not geo.boxes_intersect_polygons([5], [5], [6], [6], [tri])[0]
    # touching at a corner counts (shapely intersects semantics)
    assert geo.boxes_intersect_polygons([4.0], [-1.0], [5.0], [0.0], [tri])[0]
    # box in the hole of a donut does NOT intersect
    donut = [
        np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]),
        np.array([[3.0, 3.0], [7.0, 3.0], [7.0, 7.0], [3.0, 7.0]]),
    ]
    assert not geo.boxes_intersect_polygons([4.5], [4.5], [5.5], [5.5], [donut])[0]
    assert geo.boxes_intersect_polygons([2.0], [2.0], [5.0], [5.0], [donut])[0]


def test_pack_unpack_cell_id():
    xs = np.array([0, 1, 47439, (1 << 29) - 1])
    ys = np.array([0, 2, 31441, (1 << 29) - 1])
    zs = np.array([0, 1, 16, 31])
    cid = geo.pack_cell_id(xs, ys, zs)
    x2, y2, z2 = geo.unpack_cell_id(cid)
    np.testing.assert_array_equal(x2, xs)
    np.testing.assert_array_equal(y2, ys)
    np.testing.assert_array_equal(z2, zs)


def test_grid_ring():
    r0 = geo.grid_ring(5, 5, 0, 8)
    assert r0.tolist() == [[5, 5]]
    r2 = geo.grid_ring(5, 5, 2, 8)
    assert len(r2) == 16
    cheb = np.maximum(np.abs(r2[:, 0] - 5), np.abs(r2[:, 1] - 5))
    assert (cheb == 2).all()
    # clipping at the world edge
    rc = geo.grid_ring(0, 0, 1, 4)
    assert ((rc >= 0).all()) and len(rc) == 3


def test_mercator_extent_golden():
    e = geo.tile_extent_mercator(47439, 31441, 47442, 31444, 16)
    np.testing.assert_allclose(
        e,
        (8971261.135774568, 809009.5073703043, 8973707.120679691, 811455.4922754318),
        rtol=0,
        atol=1e-6,
    )


class TestPng:
    def test_roundtrip_filters(self):
        arr = png.synth_tile_pixels(47439, 31441, 16, 0)
        for ft in (0, 2):
            assert (png.decode_png(png.encode_png(arr, filter_type=ft)) == arr).all()

    def test_decode_sub_filter(self):
        # hand-build a Sub-filtered PNG and decode it
        import struct
        import zlib

        arr = png.synth_tile_pixels(1, 2, 3, 0, w=16, h=16)
        rows = []
        for r in range(16):
            row = arr[r].reshape(-1).astype(np.int16)
            delta = row.copy()
            delta[3:] = (row[3:] - row[:-3]) % 256
            rows.append(b"\x01" + delta.astype(np.uint8).tobytes())
        raw = b"".join(rows)
        ihdr = struct.pack(">IIBBBBB", 16, 16, 8, 2, 0, 0, 0)
        data = (
            png._PNG_SIG
            + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IDAT", zlib.compress(raw))
            + png._chunk(b"IEND", b"")
        )
        assert (png.decode_png(data) == arr).all()

    def test_decode_rgba_drops_alpha(self):
        import struct
        import zlib

        arr = np.zeros((4, 4, 4), np.uint8)
        arr[:, :, 0] = 7
        arr[:, :, 3] = 200
        raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(4))
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0)
        data = (
            png._PNG_SIG
            + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IDAT", zlib.compress(raw))
            + png._chunk(b"IEND", b"")
        )
        out = png.decode_png(data)
        assert out.shape == (4, 4, 3) and (out[:, :, 0] == 7).all()

    def test_phash_deterministic_and_discriminative(self):
        a = png.synth_tile_pixels(47439, 31441, 16, 0)
        b = png.synth_tile_pixels(47440, 31441, 16, 0)
        assert png.phash64(a) == png.phash64(a)
        assert png.hamming64(png.phash64(a), png.phash64(a)) == 0
        assert isinstance(png.phash64(b), int)

    def test_synth_pixels_deterministic(self):
        a = png.synth_tile_pixels(10, 20, 5, 1)
        b = png.synth_tile_pixels(10, 20, 5, 1)
        assert (a == b).all()
        assert not (a == png.synth_tile_pixels(10, 20, 5, 2)).all()


class TestPngPaletteGray:
    """decode_png breadth (VERDICT r1 #2): palette / grayscale /
    gray+alpha / 16-bit — what PIL gives the reference for free
    (images/image.py:28); real OSM tiles are frequently palette-PNG.
    Fixtures are built chunk-by-chunk so every combination is pinned to
    a hand-computed RGB expansion."""

    @staticmethod
    def _build(w, h, bitdepth, color, raw_rows, plte=None, trns=None):
        import struct
        import zlib

        from tilegrab_spark.kernels.png import _PNG_SIG, _chunk

        ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, color, 0, 0, 0)
        out = _PNG_SIG + _chunk(b"IHDR", ihdr)
        if plte is not None:
            out += _chunk(b"PLTE", bytes(plte))
        if trns is not None:
            out += _chunk(b"tRNS", bytes(trns))
        out += _chunk(b"IDAT", zlib.compress(raw_rows)) + _chunk(b"IEND", b"")
        return out

    def test_palette_8bit(self):
        from tilegrab_spark.kernels import png

        plte = [255, 0, 0, 0, 255, 0, 0, 0, 255, 17, 34, 51]
        # 4x2, filter 0 rows, indices 0..3
        raw = b"\x00" + bytes([0, 1, 2, 3]) + b"\x00" + bytes([3, 2, 1, 0])
        img = png.decode_png(self._build(4, 2, 8, 3, raw, plte=plte))
        assert img.shape == (2, 4, 3)
        assert img[0, 0].tolist() == [255, 0, 0]
        assert img[0, 3].tolist() == [17, 34, 51]
        assert img[1, 0].tolist() == [17, 34, 51]
        assert img[1, 3].tolist() == [255, 0, 0]

    def test_palette_subbyte_depths(self):
        from tilegrab_spark.kernels import png

        plte = [10, 20, 30, 200, 100, 50]
        # 1-bit, 8 px/row: indices 0,1 alternate -> byte 0b01010101
        raw = b"\x00" + bytes([0b01010101])
        img = png.decode_png(self._build(8, 1, 1, 3, raw, plte=plte))
        assert img[0, 0].tolist() == [10, 20, 30]
        assert img[0, 1].tolist() == [200, 100, 50]
        # 2-bit, 4 px in one byte: 00 01 01 00
        raw2 = b"\x00" + bytes([0b00010100])
        img2 = png.decode_png(self._build(4, 1, 2, 3, raw2, plte=plte))
        assert [v.tolist() for v in img2[0]] == [
            [10, 20, 30], [200, 100, 50], [200, 100, 50], [10, 20, 30]]
        # 4-bit, width 3 (odd: low nibble of last byte is padding)
        raw4 = b"\x00" + bytes([0x01, 0x10])
        img4 = png.decode_png(self._build(3, 1, 4, 3, raw4, plte=plte))
        assert [v.tolist() for v in img4[0]] == [
            [10, 20, 30], [200, 100, 50], [200, 100, 50]]

    def test_palette_with_trns_drops_alpha(self):
        from tilegrab_spark.kernels import png

        plte = [9, 9, 9, 30, 60, 90]
        raw = b"\x00" + bytes([0, 1])
        img = png.decode_png(
            self._build(2, 1, 8, 3, raw, plte=plte, trns=[0, 255])
        )
        # transparency info dropped, RGB expansion kept (forced-RGB canvas)
        assert img[0, 0].tolist() == [9, 9, 9]
        assert img[0, 1].tolist() == [30, 60, 90]

    def test_grayscale_depths(self):
        import numpy as np

        from tilegrab_spark.kernels import png

        # 8-bit gray with Sub filter (bpp=1)
        raw = bytes([1, 10, 10, 10, 10])  # deltas -> 10,20,30,40
        img = png.decode_png(self._build(4, 1, 8, 0, raw))
        assert img[0, :, 0].tolist() == [10, 20, 30, 40]
        assert np.array_equal(img[:, :, 0], img[:, :, 1])
        # 1-bit gray: 0 -> 0, 1 -> 255
        img1 = png.decode_png(self._build(8, 1, 1, 0, b"\x00" + bytes([0b10000001])))
        assert img1[0, 0].tolist() == [255, 255, 255]
        assert img1[0, 1].tolist() == [0, 0, 0]
        assert img1[0, 7].tolist() == [255, 255, 255]
        # 4-bit gray scales by 17
        img4 = png.decode_png(self._build(2, 1, 4, 0, b"\x00" + bytes([0x0F])))
        assert img4[0, 0].tolist() == [0, 0, 0]
        assert img4[0, 1].tolist() == [255, 255, 255]
        # 16-bit gray: high byte
        raw16 = b"\x00" + bytes([0xAB, 0xCD, 0x12, 0x34])
        img16 = png.decode_png(self._build(2, 1, 16, 0, raw16))
        assert img16[0, 0].tolist() == [0xAB] * 3
        assert img16[0, 1].tolist() == [0x12] * 3

    def test_gray_alpha_and_rgb16(self):
        from tilegrab_spark.kernels import png

        # gray+alpha 8-bit: alpha dropped
        raw = b"\x00" + bytes([100, 255, 200, 0])
        img = png.decode_png(self._build(2, 1, 8, 4, raw))
        assert img[0, 0].tolist() == [100] * 3
        assert img[0, 1].tolist() == [200] * 3
        # RGB 16-bit: high bytes
        raw16 = b"\x00" + bytes([0x11, 0x00, 0x22, 0xFF, 0x33, 0x80])
        img16 = png.decode_png(self._build(1, 1, 16, 2, raw16))
        assert img16[0, 0].tolist() == [0x11, 0x22, 0x33]

    def test_palette_filtered_rows_roundtrip_vs_rgb(self):
        """A palette image with mixed filters decodes to exactly the
        same pixels as the equivalent plain-RGB encode of its expansion
        (the RGB-expanded oracle)."""
        import numpy as np

        from tilegrab_spark.kernels import png

        rng = np.random.default_rng(5)
        idx = rng.integers(0, 16, (24, 24), dtype=np.uint8)
        plte_arr = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        # filter type 2 (Up) rows after the first
        rows = bytearray()
        prev = np.zeros(24, dtype=np.uint8)
        for r in range(24):
            rows += b"\x02" + bytes((idx[r] - prev) & 0xFF)
            prev = idx[r]
        img = png.decode_png(
            self._build(24, 24, 8, 3, bytes(rows), plte=plte_arr.reshape(-1).tolist())
        )
        want = plte_arr[idx]
        assert np.array_equal(img, want)
        # and our own RGB encoder agrees with itself on the expansion
        rt = png.decode_png(png.encode_png(want, filter_type=2))
        assert np.array_equal(rt, want)

    def test_unsupported_combos_raise(self):
        import pytest

        from tilegrab_spark.kernels import png

        # interlaced 1x1 now decodes (Adam7 support): single pass-1 pixel
        import struct
        import zlib

        from tilegrab_spark.kernels.png import _PNG_SIG, _chunk

        ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)
        data = (
            _PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03"))
            + _chunk(b"IEND", b"")
        )
        assert png.decode_png(data).tolist() == [[[1, 2, 3]]]
        # unknown interlace method still raises
        ihdr2 = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 2)
        bad2 = (
            _PNG_SIG + _chunk(b"IHDR", ihdr2)
            + _chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03"))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="unsupported"):
            png.decode_png(bad2)
        # palette without PLTE
        with pytest.raises(ValueError, match="PLTE"):
            png.decode_png(self._build(1, 1, 8, 3, b"\x00\x00"))
        # palette index beyond PLTE
        with pytest.raises(ValueError, match="palette index"):
            png.decode_png(self._build(1, 1, 8, 3, b"\x00\x05", plte=[1, 2, 3]))


class TestPngAdam7:
    """Adam7 interlaced decode: build interlaced streams by slicing a
    known image into the seven pass sub-images (filter-0 and Up-filtered
    rows), and check the decode equals the original."""

    @staticmethod
    def _interlace(arr, color=2, filter_up=False):
        import struct
        import zlib

        import numpy as np

        from tilegrab_spark.kernels.png import _ADAM7_PASSES, _PNG_SIG, _chunk

        h, w, _ = arr.shape
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7_PASSES:
            sub = arr[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            ph, pw, ch = sub.shape
            if filter_up:
                flat = sub.reshape(ph, pw * ch)
                delta = flat.copy()
                delta[1:] = flat[1:] - flat[:-1]
                for r in range(ph):
                    raw += b"\x02" + delta[r].tobytes()
            else:
                for r in range(ph):
                    raw += b"\x00" + sub[r].tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)
        return (
            _PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )

    def test_rgb_interlaced(self):
        import numpy as np

        from tilegrab_spark.kernels import png

        arr = png.synth_tile_pixels(10, 20, 8, 0, 21, 13)  # odd dims
        got = png.decode_png(self._interlace(arr))
        assert np.array_equal(got, arr)

    def test_rgb_interlaced_up_filter(self):
        import numpy as np

        from tilegrab_spark.kernels import png

        arr = png.synth_tile_pixels(3, 4, 9, 0, 16, 16)
        got = png.decode_png(self._interlace(arr, filter_up=True))
        assert np.array_equal(got, arr)

    def test_tiny_interlaced(self):
        # dimensions smaller than one pass block: most passes are empty
        import numpy as np

        from tilegrab_spark.kernels import png

        arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        got = png.decode_png(self._interlace(arr))
        assert np.array_equal(got, arr)
