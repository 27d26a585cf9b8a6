"""Cloud-Optimized GeoTIFF sink (kernels/cog.py) — round-trip, layout
rules, overview oracle, export integration, hostile input."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.kernels import cog, geotiff, png
from tilegrab_spark.operators.image_join import join_images
from tilegrab_spark.operators.mosaic import mosaic
from tilegrab_spark.operators.tiles import tiles_for
from tilegrab_spark.sources.export import export_mosaics
from tilegrab_spark.sources.images import read_image_table


def _scene(h, w, seed=3):
    rng = np.random.default_rng(seed)
    # smooth-ish content: gradient + blocky noise, exercises the
    # predictor without being trivially compressible
    g = np.add.outer(np.arange(h) % 251, np.arange(w) % 241)[..., None]
    n = rng.integers(0, 40, (h // 8 + 1, w // 8 + 1, 3)).repeat(8, 0).repeat(8, 1)
    return ((g + n[:h, :w]) % 256).astype(np.uint8)


def test_cog_roundtrip_and_overview_oracle():
    arr = _scene(700, 900)
    bounds = (100.0, 200.0, 1000.0, 900.0)
    data = cog.encode_cog(arr, bounds)
    levels, b, epsg = cog.read_cog(data)
    assert b == bounds and epsg == 3857
    assert np.array_equal(levels[0], arr)
    # overview chain == repeated 2:1 block-mean (the pyramid box filter)
    cur = arr
    for lv in levels[1:]:
        cur = cog.downsample2x(cur)
        assert np.array_equal(lv, cur)
    # terminates once a level fits one tile
    assert max(levels[-1].shape[:2]) <= 256 < max(levels[-2].shape[:2])


def test_cog_layout_rules():
    data = cog.encode_cog(_scene(700, 900), (0.0, 0.0, 9.0, 7.0))
    info = cog.validate_cog_layout(data)
    assert info["levels"] == 3 and info["tiled"]
    # header-first: all metadata within the first few KB regardless of
    # the 2.4 MB of pixels behind it
    assert info["header_bytes"] < 4096
    # a plain strip GeoTIFF fails validation (not tiled)
    strip = geotiff.encode_geotiff(_scene(64, 64), (0, 0, 1, 1))
    with pytest.raises(ValueError, match="not tiled"):
        cog.validate_cog_layout(strip)
    with pytest.raises(ValueError, match="use read_geotiff"):
        cog.read_cog(strip)
    # reader dispatch the other way: strip reader on tiled input
    with pytest.raises(ValueError):
        geotiff.read_geotiff(data)


def test_cog_single_tile_and_odd_dims():
    for h, w in [(200, 200), (256, 256), (257, 511), (1, 1), (300, 17)]:
        arr = _scene(h, w, seed=h * 1000 + w)
        data = cog.encode_cog(arr, (0.0, 0.0, float(w), float(h)))
        levels, b, _ = cog.read_cog(data)
        assert np.array_equal(levels[0], arr), (h, w)
        cog.validate_cog_layout(data)


def test_cog_explicit_overviews_validated():
    arr = _scene(512, 512)
    good = [cog.downsample2x(arr)]
    data = cog.encode_cog(arr, (0, 0, 1, 1), overviews=good)
    assert len(cog.read_cog(data)[0]) == 2
    with pytest.raises(ValueError, match="expected 2:1"):
        cog.encode_cog(arr, (0, 0, 1, 1), overviews=[arr[:100, :100]])
    with pytest.raises(ValueError, match="multiple of 16"):
        cog.encode_cog(arr, (0, 0, 1, 1), tile=100)


def test_cog_hostile_input():
    arr = _scene(300, 300)
    data = bytearray(cog.encode_cog(arr, (0, 0, 1, 1)))
    # truncation anywhere raises ValueError, never crashes/hangs
    for cut in (3, 9, 40, 200, len(data) // 2, len(data) - 7):
        with pytest.raises(ValueError):
            cog.read_cog(bytes(data[:cut]))
    # IFD pointer cycle
    looped = bytearray(data)
    looped[4:8] = struct.pack("<I", 8)
    (n,) = struct.unpack_from("<H", looped, 8)
    struct.pack_into("<I", looped, 8 + 2 + n * 12, 8)  # next IFD -> self
    with pytest.raises(ValueError, match="cycle"):
        cog.read_cog(bytes(looped))
    levels, _, _ = cog.read_cog(bytes(data))  # sanity before fuzz
    assert levels[0].shape == (300, 300, 3)


def test_cog_zlib_bomb_capped():
    """A tile whose deflate stream expands to 64 MB must decode without
    ever materializing more than one tile's worth of pixels (the
    decompressobj max_length cap)."""
    arr = _scene(256, 256)  # exactly one tile, one level
    data = bytearray(cog.encode_cog(arr, (0, 0, 1, 1)))
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    tile_off = tile_cnt = None
    cnt_field_pos = None
    for i in range(n):
        base = ifd_off + 2 + i * 12
        tag, _typ, _count = struct.unpack_from("<HHI", data, base)
        if tag == 324:
            (tile_off,) = struct.unpack_from("<I", data, base + 8)
        elif tag == 325:
            cnt_field_pos = base + 8
            (tile_cnt,) = struct.unpack_from("<I", data, cnt_field_pos)
    assert tile_off is not None and tile_off + tile_cnt == len(data)
    bomb = zlib.compress(b"\0" * (1 << 26), 9)  # 64 MB of zeros
    struct.pack_into("<I", data, cnt_field_pos, len(bomb))
    bombed = bytes(data[:tile_off]) + bomb
    levels, _, _ = cog.read_cog(bombed)
    # cap held: the tile decoded as the first 256*256*3 bytes (zeros)
    assert levels[0].shape == (256, 256, 3) and not levels[0].any()


def test_cog_compresses_smooth_content():
    arr = np.tile(np.arange(1024, dtype=np.uint8)[None, :, None], (1024, 1, 3))
    raw = arr.nbytes
    assert len(cog.encode_cog(arr, (0, 0, 1, 1))) < raw // 20


def test_export_mosaics_cog(spark, t_geom, image_table, tmp_path):
    """fmt='cog': same golden bounds as the plain GeoTIFF sink, pixels
    identical to the mosaic canvas, layout validates, overviews match
    the block-mean oracle."""
    tiles = tiles_for(spark, t_geom, 16, by="shape")
    images = read_image_table(spark, image_table).filter(
        ~F.col("image_id").rlike("_1[0-9][0-9]$")
    )
    m = mosaic(join_images(tiles, images.drop("cell_id")))
    files = export_mosaics(m, tmp_path / "out", fmt="cog")
    assert [f.name for f in files] == ["1_mosaic.tif"]
    data = files[0].read_bytes()
    cog.validate_cog_layout(data)
    levels, bounds, epsg = cog.read_cog(data)
    row = m.collect()[0]
    canvas = png.decode_png(bytes(row.bytes))
    assert np.array_equal(levels[0], canvas)
    assert len(levels) >= 2  # 1024px canvas -> at least two overviews
    assert np.array_equal(levels[1], cog.downsample2x(canvas))
    assert epsg == 3857
    assert bounds[0] == 8971261.135774568  # FIXTURES §4.4 golden
    assert abs(bounds[3] - 811455.4922754318) < 1e-6
