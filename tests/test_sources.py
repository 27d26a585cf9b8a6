"""Provider/URL contract parity (reference tests/test_sources.py:6-33 +
FIXTURES.md §4.5), both driver-side and as Catalyst projections."""

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.sources.tile_sources import SOURCES, url_column


def test_all_providers_registered():
    assert set(SOURCES) == {"osm", "esri_wi", "gsat", "nmsat"}
    for s in SOURCES.values():
        assert s.uid and s.name and s.url_template


def test_osm_url_golden():
    assert (
        SOURCES["osm"].get_url(z=16, x=47439, y=31441)
        == "https://tile.openstreetmap.org/16/47439/31441.png"
    )


def test_url_contract_1_1_1():
    # get_url(1,1,1) contains exactly one '/1/1/1' or '&x=1&y=1&z=1'
    for uid, s in SOURCES.items():
        url = s.get_url(z=1, x=1, y=1, api_key="K" if s.requires_key else None)
        assert url.count("/1/1/1") == 1 or "&x=1&y=1&z=1" in url, (uid, url)


def test_esri_path_order_z_y_x():
    url = SOURCES["esri_wi"].get_url(z=3, x=1, y=2)
    assert url.endswith("/3/2/1")


def test_nearmap_requires_key():
    with pytest.raises(ValueError):
        SOURCES["nmsat"].get_url(z=1, x=1, y=1)
    assert "apikey=SECRET" in SOURCES["nmsat"].get_url(z=1, x=1, y=1, api_key="SECRET")


def test_url_column_matches_driver_scalar(spark):
    df = spark.createDataFrame(
        [(16, 47439, 31441), (1, 1, 1), (3, 1, 2)], "z int, x long, y long"
    )
    for uid, s in SOURCES.items():
        key = "K" if s.requires_key else None
        rows = df.withColumn(
            "url", url_column(uid, F.col("z"), F.col("x"), F.col("y"), api_key=key)
        ).collect()
        for r in rows:
            assert r.url == s.get_url(z=r.z, x=r.x, y=r.y, api_key=key), uid


def test_url_column_missing_key_raises():
    with pytest.raises(ValueError):
        url_column("nmsat", F.col("z"), F.col("x"), F.col("y"))
