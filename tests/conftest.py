import numpy as np
import pytest

from tilegrab_spark import get_spark
from tilegrab_spark.sources.geometries import geometry_from_geojson, geometry_from_rings

T_GEOJSON = "/root/reference/tests/data/T.geojson"

# Golden tile sets for the T fixture, derived from the reference's own
# formulas (FIXTURES.md §4.2) and reproduced by kernels validated against
# the reference's asserted goldens.
T_SHAPE_Z16 = [
    (47439, 31441),
    (47440, 31441),
    (47440, 31442),
    (47440, 31443),
    (47440, 31444),
    (47441, 31441),
    (47442, 31441),
]
T_BBOX_Z16 = [(x, y) for x in range(47439, 47443) for y in range(31441, 31445)]
T_SHAPE_Z15 = [
    (23719, 15720),
    (23720, 15720),
    (23720, 15721),
    (23720, 15722),
    (23721, 15720),
]

# SF polygon from reference tests/test_tiles.py:19-21
SF_RING = [(-122.4, 37.8), (-122.4, 37.85), (-122.35, 37.85), (-122.35, 37.8), (-122.4, 37.8)]


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tilegrab-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def t_geom():
    return geometry_from_geojson(T_GEOJSON, "T")


@pytest.fixture(scope="session")
def sf_geom():
    return geometry_from_rings("SF", [SF_RING])


@pytest.fixture(scope="session")
def image_table(spark, tmp_path_factory):
    """Shared synthetic image table: full T z=16 bbox + a gap + a hot cell."""
    from tilegrab_spark.sources.images import (
        cells_for_tile_sets,
        write_synthetic_image_table,
    )

    path = str(tmp_path_factory.mktemp("imgs") / "images")
    cells = cells_for_tile_sets(
        {16: T_BBOX_Z16, 15: T_SHAPE_Z15},
        srcs=(0,),
        gaps=[(16, 47441, 31442)],
        hot=((16, 47440, 31441), 40),
    )
    write_synthetic_image_table(spark, path, cells, n_buckets=4)
    return path


def oracle_canvas(tiles, minx, miny, nx, ny, src=0, zoom=16):
    """Straight-numpy mosaic oracle implementing images/mosaic.py:7-27."""
    from tilegrab_spark.kernels.png import synth_tile_pixels

    canvas = np.zeros((ny * 256, nx * 256, 3), np.uint8)
    for x, y in tiles:
        canvas[(y - miny) * 256 : (y - miny + 1) * 256, (x - minx) * 256 : (x - minx + 1) * 256] = (
            synth_tile_pixels(x, y, zoom, src)
        )
    return canvas
