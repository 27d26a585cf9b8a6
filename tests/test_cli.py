"""CLI surface: flag parity with the reference (cli.py:17-124) and an
end-to-end run against a synthetic image table."""

import pytest

from tilegrab_spark.cli import main, parse_args


def test_flag_surface_parity():
    a = parse_args(
        ["--source", "s.geojson", "--shape", "--osm", "--zoom", "16",
         "--group-tiles", "2x2", "--tile-limit", "99", "--invert",
         "--no-parallel", "--no-progress", "--quiet"]
    )
    assert a.shape and a.osm and a.zoom == 16 and a.invert
    assert a.group_tiles == "2x2" and a.tile_limit == 99
    assert a.parallel is False and a.progress is False and a.quiet


def test_mutually_exclusive_groups():
    with pytest.raises(SystemExit):
        parse_args(["--source", "s", "--shape", "--bbox", "--osm", "--zoom", "1"])
    with pytest.raises(SystemExit):
        parse_args(["--source", "s", "--osm", "--zoom", "1"])  # no extent
    with pytest.raises(SystemExit):
        parse_args(["--source", "s", "--shape", "--osm", "--png", "--tiff", "--zoom", "1"])


def test_cli_end_to_end(spark, image_table, tmp_path):
    # reuses the session via getOrCreate inside main()
    rc = main(
        ["--source", "/root/reference/tests/data/T.geojson", "--shape", "--osm",
         "--zoom", "16", "--images", image_table,
         "--tiles-out", str(tmp_path / "tiles"), "--out", str(tmp_path / "out"),
         "--tiff", "--quiet"]
    )
    assert rc == 0
    m = spark.read.parquet(str(tmp_path / "out" / "mosaics"))
    r = m.collect()[0]
    assert (r.w, r.h) == (1024, 1024)
    assert r.merc_xmin == pytest.approx(8971261.135774568)
    tiles = spark.read.parquet(str(tmp_path / "tiles"))
    # all 7 shape tiles have src-0 images (the fixture gap is a bbox-only
    # tile), + 40 hot-cell dupes
    assert tiles.count() == 7 + 40
    met = spark.read.parquet(str(tmp_path / "out" / "metrics"))
    assert {x.stage for x in met.collect()} == {"fetch", "mosaic"}


def test_cli_webp_export(spark, image_table, tmp_path):
    """--webp (engine extension): the exported VP8L mosaic decodes
    byte-equal to the PNG canvas in the parquet table."""
    import numpy as np

    from tilegrab_spark.kernels import png, webp

    rc = main(
        ["--source", "/root/reference/tests/data/T.geojson", "--shape", "--osm",
         "--zoom", "16", "--images", image_table,
         "--tiles-out", str(tmp_path / "tiles"), "--out", str(tmp_path / "out"),
         "--webp", "--quiet"]
    )
    assert rc == 0
    files = sorted((tmp_path / "out" / "webp").glob("*.webp"))
    assert len(files) == 1
    canvas = png.decode_png(
        bytes(spark.read.parquet(str(tmp_path / "out" / "mosaics")).collect()[0].bytes)
    )
    assert np.array_equal(webp.decode_webp(files[0].read_bytes()), canvas)


def test_cli_quickstart_shapefile_artifact_parity(spark, image_table, tmp_path):
    """VERDICT r2 #8: the reference README quickstart shape — a .shp
    source, --shape --osm --zoom 16 --tiff — run end to end, asserting
    artifact-for-artifact equivalence against the golden fixtures:
    per-tile files (--tile-files ~ reference saved_tiles/), the mosaic
    canvas, and the GeoTIFF's pixels + EPSG:3857 bounds."""
    import numpy as np

    from tests.conftest import T_SHAPE_Z16
    from tests.test_vector_files import MERC_PRJ, _t_ring, _write_shp
    from tilegrab_spark.kernels import geotiff, png
    from tilegrab_spark.sources.images import expected_pixels

    shp = tmp_path / "boundary.shp"
    _write_shp(shp, _t_ring())
    (tmp_path / "boundary.prj").write_text(MERC_PRJ)  # T ring is EPSG:3857

    rc = main(
        ["--source", str(shp), "--shape", "--osm", "--zoom", "16",
         "--images", image_table, "--tile-files",
         "--tiles-out", str(tmp_path / "tiles"), "--out", str(tmp_path / "out"),
         "--tiff", "--quiet"]
    )
    assert rc == 0

    # 1) per-tile files: exactly the golden 7 shape tiles, each decoding
    # to the deterministic synthetic pixels for its cell
    files = sorted((tmp_path / "tiles" / "files").glob("*.png"))
    golden = sorted(f"16_{x}_{y}.png" for x, y in T_SHAPE_Z16)
    assert [f.name for f in files] == golden
    hot = (47440, 31441)
    for f in files:
        z, x, y = (int(v) for v in f.stem.split("_"))
        if (x, y) == hot:
            continue  # hot cell: 40 src variants share the filename
        assert np.array_equal(
            png.decode_png(f.read_bytes()), expected_pixels(f"16_{x}_{y}_0")
        )

    # 2) mosaic canvas: whole-extent 1024x1024
    m = spark.read.parquet(str(tmp_path / "out" / "mosaics")).collect()[0]
    canvas = png.decode_png(bytes(m.bytes))
    assert canvas.shape == (1024, 1024, 3)

    # 3) GeoTIFF artifact: pixels byte-equal to the canvas, golden
    # mercator bounds (FIXTURES.md §4), EPSG:3857
    tifs = sorted((tmp_path / "out" / "tiff").glob("*.tif"))
    assert len(tifs) == 1
    arr, bounds, epsg = geotiff.read_geotiff(tifs[0].read_bytes())
    assert np.array_equal(arr, canvas)
    assert epsg == 3857
    assert bounds == pytest.approx(
        (8971261.135774568, 809009.5073703043, 8973707.120679691, 811455.4922754318)
    )


def test_cli_pmtiles_archive(spark, image_table, tmp_path):
    """--pmtiles packs the fetched tiles into one Hilbert-clustered
    archive whose contents match the per-tile files byte-for-byte."""
    from tests.conftest import T_GEOJSON, T_SHAPE_Z16
    from tilegrab_spark.kernels.pmtiles import read_pmtiles

    rc = main(
        ["--source", str(T_GEOJSON), "--shape", "--osm", "--zoom", "16",
         "--images", image_table, "--pmtiles", "--download-only",
         "--tiles-out", str(tmp_path / "tiles"), "--quiet"]
    )
    assert rc == 0
    got = read_pmtiles(
        (tmp_path / "tiles" / "pmtiles" / "tiles.pmtiles").read_bytes()
    )
    assert set(got["tiles"]) == {(16, x, y) for x, y in T_SHAPE_Z16}
    assert got["header"]["clustered"] is True
    # payloads are the fetch table's bytes; a tile fetched under two
    # geometries keeps the deterministic max(bytes) payload
    fetched: dict = {}
    for r in spark.read.parquet(str(tmp_path / "tiles")).collect():
        if r.bytes is None:
            continue
        k = (r.z, r.x, r.y)
        b = bytes(r.bytes)
        fetched[k] = max(fetched[k], b) if k in fetched else b
    assert got["tiles"] == fetched
