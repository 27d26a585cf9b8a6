"""File export sinks + GeoJSON projection (S5/S6/S7/P4 parity)."""

import json

from pyspark.sql import functions as F

from tests.conftest import T_SHAPE_Z16
from tilegrab_spark.functions.cells import tile_bounds_cols, tile_geojson_col
from tilegrab_spark.kernels import png
from tilegrab_spark.operators.image_join import join_images
from tilegrab_spark.operators.mosaic import mosaic
from tilegrab_spark.operators.tiles import tiles_for
from tilegrab_spark.sources.export import export_mosaics, export_tiles
from tilegrab_spark.sources.images import read_image_table


def test_export_mosaics_with_georeference(spark, t_geom, image_table, tmp_path):
    tiles = tiles_for(spark, t_geom, 16, by="shape")
    images = read_image_table(spark, image_table).filter(
        ~F.col("image_id").rlike("_1[0-9][0-9]$")
    )
    m = mosaic(join_images(tiles, images.drop("cell_id")))
    files = export_mosaics(m, tmp_path / "out", georeference=True)
    names = sorted(f.name for f in files)
    assert names == ["1_mosaic.geo.json", "1_mosaic.pgw", "1_mosaic.png"]
    img = png.decode_png((tmp_path / "out" / "1_mosaic.png").read_bytes())
    assert img.shape == (1024, 1024, 3)
    meta = json.loads((tmp_path / "out" / "1_mosaic.geo.json").read_text())
    assert meta["crs"] == "EPSG:3857"
    assert meta["bounds"][0] == 8971261.135774568  # FIXTURES §4.4 golden
    # world file: pixel size = extent / pixels
    pgw = (tmp_path / "out" / "1_mosaic.pgw").read_text().splitlines()
    assert float(pgw[0]) > 0 and float(pgw[3]) < 0


def test_export_tiles_reference_naming(spark, t_geom, image_table, tmp_path):
    tiles = tiles_for(spark, t_geom, 16, by="shape")
    images = read_image_table(spark, image_table).filter(
        ~F.col("image_id").rlike("_1[0-9][0-9]$")
    )
    j = join_images(tiles, images.drop("cell_id"))
    n = export_tiles(j, tmp_path / "tiles")
    present = [t for t in T_SHAPE_Z16 if t != (47441, 31442)]
    assert n == len(present)
    for x, y in present:
        assert (tmp_path / "tiles" / f"16_{x}_{y}.png").exists()


def test_tile_geojson_col(spark):
    df = spark.createDataFrame([(16, 47439, 31441)], "z int, x long, y long")
    mnl, mnt, mxl, mxt = tile_bounds_cols(F.col("x"), F.col("y"), F.col("z"))
    row = df.withColumn("gj", tile_geojson_col(mnl, mnt, mxl, mxt)).collect()[0]
    gj = json.loads(row.gj)
    assert gj["type"] == "Polygon"
    ring = gj["coordinates"][0]
    assert len(ring) == 5 and ring[0] == ring[-1]
    # matches the reference's 5-point ring order (tile.py:83-92)
    assert ring[0][0] == ring[1][0] and ring[1][1] == ring[2][1]


def test_geotiff_kernel_roundtrip():
    import numpy as np

    from tilegrab_spark.kernels import geotiff

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    bounds = (100.0, -250.0, 1060.0, 390.0)  # sx=10, sy=10
    data = geotiff.encode_geotiff(arr, bounds)
    got, got_bounds, epsg = geotiff.read_geotiff(data)
    assert (got == arr).all()
    assert got_bounds == bounds
    assert epsg == 3857
    assert data[:2] == b"II"  # little-endian TIFF magic


def test_export_mosaics_real_geotiff(spark, t_geom, image_table, tmp_path):
    """S7: fmt='tiff' writes a REAL georeferenced GeoTIFF (exporter.py:
    47-74 parity): pixels identical to the mosaic canvas, EPSG:3857
    bounds = the FIXTURES §4.4 mercator golden, standard tags."""
    tiles = tiles_for(spark, t_geom, 16, by="shape")
    images = read_image_table(spark, image_table).filter(
        ~F.col("image_id").rlike("_1[0-9][0-9]$")
    )
    m = mosaic(join_images(tiles, images.drop("cell_id")))
    files = export_mosaics(m, tmp_path / "out", fmt="tiff")
    assert [f.name for f in files] == ["1_mosaic.tif"]

    from tilegrab_spark.kernels import geotiff

    arr, bounds, epsg = geotiff.read_geotiff(files[0].read_bytes())
    row = m.collect()[0]
    assert (arr == png.decode_png(bytes(row.bytes))).all()
    assert epsg == 3857
    assert bounds[0] == 8971261.135774568  # FIXTURES §4.4 golden
    assert abs(bounds[3] - 811455.4922754318) < 1e-6


def test_export_mosaics_jpg(spark, t_geom, image_table, tmp_path):
    """--jpg parity (exporter.py:37-45): lossy export through the
    baseline JPEG codec, within the 40dB PSNR gate of the PNG canvas."""
    from tilegrab_spark.kernels import jpeg

    tiles = tiles_for(spark, t_geom, 16, by="shape")
    images = read_image_table(spark, image_table).filter(
        ~F.col("image_id").rlike("_1[0-9][0-9]$")
    )
    m = mosaic(join_images(tiles, images.drop("cell_id")))
    files = export_mosaics(m, tmp_path / "out", fmt="jpg")
    assert [f.name for f in files] == ["1_mosaic.jpg"]
    got = jpeg.decode_jpeg(files[0].read_bytes())
    want = png.decode_png(bytes(m.collect()[0].bytes))
    assert got.shape == want.shape
    assert jpeg.psnr(got, want) >= 40.0


def test_export_mosaics_webp_lossless(spark, t_geom, image_table, tmp_path):
    """fmt='webp' exports a VP8L canvas that decodes byte-equal to the
    PNG canvas (lossless transcode)."""
    import numpy as np

    from tilegrab_spark.kernels import webp

    tiles = tiles_for(spark, t_geom, 16, by="shape")
    images = read_image_table(spark, image_table).filter(
        ~F.col("image_id").rlike("_1[0-9][0-9]$")
    )
    m = mosaic(join_images(tiles, images.drop("cell_id")))
    paths = export_mosaics(m, tmp_path / "wp", fmt="webp")
    assert [p.name for p in paths] == ["1_mosaic.webp"]
    want = png.decode_png(bytes(m.collect()[0].bytes))
    assert np.array_equal(webp.decode_webp(paths[0].read_bytes()), want)


def test_export_mosaics_webp_lossy(spark, t_geom, image_table, tmp_path):
    """fmt='webp_lossy' exports a VP8 intra canvas.  VP8 is inherently
    4:2:0, and the synthetic XOR tiles carry near-Nyquist chroma, so the
    subsampling ceiling alone caps absolute PSNR around 25 dB on this
    content (measured conversion-only, no codec).  The codec gate is
    therefore relative: coding loss beyond the unavoidable 4:2:0
    round-trip must clear the usual 40 dB (smooth-content absolute PSNR
    is gated at 40 dB in tests/test_vp8.py)."""
    from tilegrab_spark.kernels import jpeg, webp
    from tilegrab_spark.kernels.vp8 import _rgb_to_yuv420, _yuv420_to_rgb

    tiles = tiles_for(spark, t_geom, 16, by="shape")
    images = read_image_table(spark, image_table).filter(
        ~F.col("image_id").rlike("_1[0-9][0-9]$")
    )
    m = mosaic(join_images(tiles, images.drop("cell_id")))
    paths = export_mosaics(m, tmp_path / "wpl", fmt="webp_lossy")
    assert [p.name for p in paths] == ["1_mosaic.webp"]
    got = webp.decode_webp(paths[0].read_bytes())
    want = png.decode_png(bytes(m.collect()[0].bytes))
    assert got.shape == want.shape
    h, w = want.shape[:2]
    ceiling = _yuv420_to_rgb(*_rgb_to_yuv420(want), h, w)
    assert jpeg.psnr(got, ceiling) >= 40.0
    assert jpeg.psnr(got, want) >= jpeg.psnr(ceiling, want) - 1.0
