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
