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
