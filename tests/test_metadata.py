"""EXIF/PNG metadata kernels + extraction operator: build-then-parse
round trips in both byte orders, GPS DMS conversion exactness, PNG
text-chunk variants, malformed-structure surfacing, geotag cell keys
vs the engine's own encode."""

import numpy as np
import pytest

from tilegrab_spark.kernels import exif, jpeg, png
from tilegrab_spark.operators.metadata import extract_image_metadata, geotag_cells


def _jpeg_with(app1=None, **kw):
    arr = np.full((16, 16, 3), 128, dtype=np.uint8)
    base = jpeg.encode_jpeg(arr)
    seg = app1 if app1 is not None else exif.build_exif_app1(**kw)
    return exif.inject_jpeg_app1(base, seg)


@pytest.mark.parametrize("endian", ["<", ">"])
def test_exif_roundtrip_both_byte_orders(endian):
    data = _jpeg_with(
        make="TileCam", model="TG-1", orientation=6,
        datetime="2026:08:19 12:00:00",
        lon=11.5755, lat=48.1374, alt_m=519.3, endian=endian,
    )
    m = exif.parse_jpeg_exif(data)
    assert m["make"] == "TileCam" and m["model"] == "TG-1"
    assert m["orientation"] == 6
    assert m["datetime"] == "2026:08:19 12:00:00"
    assert m["lat"] == pytest.approx(48.1374, abs=5e-7)
    assert m["lon"] == pytest.approx(11.5755, abs=5e-7)
    assert m["alt_m"] == pytest.approx(519.3, abs=0.01)


def test_exif_southern_western_negative_alt():
    m = exif.parse_jpeg_exif(_jpeg_with(lon=-70.6693, lat=-33.4489, alt_m=-12.0))
    assert m["lat"] == pytest.approx(-33.4489, abs=5e-7)
    assert m["lon"] == pytest.approx(-70.6693, abs=5e-7)
    assert m["alt_m"] == pytest.approx(-12.0, abs=0.01)


def test_gps_to_decimal_exact():
    assert exif.gps_to_decimal([(48, 1), (8, 1), (15, 1)], "N") == 48 + 8 / 60 + 15 / 3600
    assert exif.gps_to_decimal([(48, 1), (8, 1), (15, 1)], "S") == -(48 + 8 / 60 + 15 / 3600)
    assert exif.gps_to_decimal((90, 2), "E") == 45.0  # single rational
    with pytest.raises(ValueError):
        exif.gps_to_decimal([(1, 0)], "N")


def test_jpeg_without_app1_is_empty_not_error():
    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    assert exif.parse_jpeg_exif(jpeg.encode_jpeg(arr)) == {}


def test_malformed_raises():
    with pytest.raises(ValueError):
        exif.parse_jpeg_exif(b"not a jpeg")
    bad = _jpeg_with(make="X")
    # corrupt the TIFF byte-order mark inside APP1
    i = bad.find(b"Exif\x00\x00") + 6
    with pytest.raises(ValueError):
        exif.parse_jpeg_exif(bad[:i] + b"XX" + bad[i + 2:])
    with pytest.raises(ValueError):
        exif.parse_png_text(b"\x89PNX" + b"\x00" * 16)


def test_png_text_chunks_all_kinds():
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    base = png.encode_png(arr)
    iend = base.rfind(b"IEND") - 4
    chunks = (
        exif.build_png_text_chunk("Title", "Munich tiles")
        + exif.build_png_text_chunk("Comment", "z" * 300, kind="zTXt")
        + exif.build_png_text_chunk("Unicode", "münchen ✓", kind="iTXt")
    )
    data = base[:iend] + chunks + base[iend:]
    m = exif.parse_png_text(data)
    assert m["Title"] == "Munich tiles"
    assert m["Comment"] == "z" * 300
    assert m["Unicode"] == "münchen ✓"
    assert png.decode_png(data).shape == (4, 4, 3)  # still a valid PNG


def test_extract_operator_and_geotag(spark):
    rows = [
        ("gps", bytearray(_jpeg_with(make="A", lon=11.5755, lat=48.1374)), "jpeg"),
        ("plain", bytearray(_jpeg_with(app1=exif.build_exif_app1(make="B"))), "jpeg"),
        ("bare", bytearray(jpeg.encode_jpeg(np.zeros((8, 8, 3), np.uint8))), "jpeg"),
        ("bad", bytearray(b"\xff\xd8\xff\xe1\x00\x10Exif\x00\x00XXxxxxxx"), "jpeg"),
        ("pngt", bytearray(png.encode_png(np.zeros((4, 4, 3), np.uint8))), "png"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    meta = {r.image_id: r for r in extract_image_metadata(df).collect()}
    assert meta["gps"].ok and meta["gps"].has_gps and meta["gps"].make == "A"
    assert meta["plain"].ok and not meta["plain"].has_gps and meta["plain"].make == "B"
    assert meta["bare"].ok and not meta["bare"].has_gps and meta["bare"].make is None
    assert not meta["bad"].ok
    assert meta["pngt"].ok and meta["pngt"].extra == {}

    tagged = geotag_cells(extract_image_metadata(df), zoom=15).collect()
    assert len(tagged) == 1 and tagged[0].image_id == "gps"
    from pyspark.sql import functions as F
    from tilegrab_spark.functions.cells import cell_encode_cols
    xc, yc = cell_encode_cols(F.lit(11.5755), F.lit(48.1374), 15)
    want = spark.range(1).select(xc.alias("x"), yc.alias("y")).first()
    # same cell as the engine's own encode of the embedded coordinates
    # (EXIF rationals quantize at ~1e-7 deg, far below a z15 cell)
    assert (tagged[0].x, tagged[0].y) == (want.x, want.y)
    with pytest.raises(ValueError):
        geotag_cells(df, zoom=35)


def test_strip_jpeg_removes_exif_keeps_pixels():
    arr = np.arange(16 * 16 * 3, dtype=np.uint32).reshape(16, 16, 3) % 251
    arr = arr.astype(np.uint8)
    tagged = exif.inject_jpeg_app1(
        jpeg.encode_jpeg(arr), exif.build_exif_app1(make="X", lon=1.0, lat=2.0)
    )
    clean = exif.strip_jpeg_metadata(tagged)
    assert len(clean) < len(tagged)
    assert exif.parse_jpeg_exif(clean) == {}
    np.testing.assert_array_equal(jpeg.decode_jpeg(clean), jpeg.decode_jpeg(tagged))
    assert exif.strip_jpeg_metadata(clean) == clean  # idempotent


def test_strip_png_removes_text_keeps_pixels():
    arr = np.zeros((6, 6, 3), dtype=np.uint8)
    base = png.encode_png(arr)
    iend = base.rfind(b"IEND") - 4
    tagged = (
        base[:iend]
        + exif.build_png_text_chunk("Author", "someone")
        + exif.build_png_text_chunk("C", "zzz", kind="zTXt")
        + base[iend:]
    )
    clean = exif.strip_png_metadata(tagged)
    assert exif.parse_png_text(clean) == {}
    assert clean == base  # byte-identical to the untagged encode
    np.testing.assert_array_equal(png.decode_png(clean), arr)


def test_strip_operator(spark):
    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    tagged = exif.inject_jpeg_app1(
        jpeg.encode_jpeg(arr), exif.build_exif_app1(make="Cam", lon=3.0, lat=4.0)
    )
    rows = [
        ("a", bytearray(tagged), 8, 8, "jpeg"),
        ("b", bytearray(png.encode_png(arr)), 8, 8, "png"),
        ("c", bytearray(b"????"), 8, 8, "gif"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    from tilegrab_spark.operators.metadata import strip_image_metadata

    out = {r.image_id: r for r in strip_image_metadata(df).collect()}
    assert out["a"].strip_ok and out["a"].bytes_saved > 0
    assert exif.parse_jpeg_exif(bytes(out["a"].bytes)) == {}
    assert out["b"].strip_ok and out["b"].bytes_saved == 0
    assert not out["c"].strip_ok and bytes(out["c"].bytes) == b"????"
    # schema passthrough: original columns survive
    assert out["a"].w == 8 and out["a"].fmt == "jpeg"
    with pytest.raises(ValueError):
        strip_image_metadata(df.drop("fmt"))
