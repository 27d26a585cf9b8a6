"""SQL-string surface (tilegrab_spark/sql.py): every tg_* scalar
function must be BIT-EQUAL to its functions/cells.py Catalyst twin,
and tg_tile_intersects must reproduce the golden shape-tile set."""

import json

import pytest
from pyspark.sql import functions as F

from tests.conftest import T_SHAPE_Z16
from tilegrab_spark.functions.cells import (
    cell_encode_cols,
    cell_id_col,
    tile_bounds_cols,
    tile_geojson_col,
    tile_mercator_bounds_cols,
)
from tilegrab_spark.sql import register_sql_functions


@pytest.fixture(scope="module")
def sql_fns(spark):
    return register_sql_functions(spark)


def _grid(spark):
    # tiles across zooms incl. world edges
    rows = [(z, x, y) for z in (1, 8, 16)
            for x in (0, 3, (1 << z) - 1) for y in (0, 5, (1 << z) - 1)
            if x < (1 << z) and y < (1 << z)]
    return spark.createDataFrame(rows, "z int, x bigint, y bigint")


def test_cell_id_and_unpack_match_catalyst(spark, sql_fns):
    df = _grid(spark).withColumn("want", cell_id_col("z", "x", "y"))
    df.createOrReplaceTempView("g")
    got = spark.sql("""
      SELECT z, x, y, want, tg_cell_id(z, x, y) AS got,
             tg_cell_unpack(tg_cell_id(z, x, y)) AS back
      FROM g""").collect()
    for r in got:
        assert r.got == r.want
        assert (r.back.z, r.back.x, r.back.y) == (r.z, r.x, r.y)


def test_tile_encode_matches_catalyst_with_clamps(spark, sql_fns):
    pts = [(lon, lat) for lon in (-180.0, -77.03, 0.0, 80.6, 179.999)
           for lat in (-89.9, -85.0511, -33.4, 0.0, 28.05, 85.0511, 89.9)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    for z in (2, 16):
        xc, yc = cell_encode_cols(F.col("lon"), F.col("lat"), z)
        want = df.withColumn("wx", xc).withColumn("wy", yc)
        want.createOrReplaceTempView("pts")
        rows = spark.sql(
            f"SELECT wx, wy, tg_tile_encode(lon, lat, {z}) AS e FROM pts"
        ).collect()
        for r in rows:
            assert (r.e.x, r.e.y) == (r.wx, r.wy)


def test_tile_bounds_match_catalyst_bitwise(spark, sql_fns):
    df = _grid(spark)
    mnl, mnt, mxl, mxt = tile_bounds_cols(F.col("x"), F.col("y"), F.col("z"))
    df.withColumn("a", mnl).withColumn("b", mnt).withColumn("c", mxl) \
      .withColumn("d", mxt).createOrReplaceTempView("g2")
    rows = spark.sql("""
      SELECT a, b, c, d, tg_tile_bounds(x, y, z) AS tb FROM g2""").collect()
    for r in rows:
        assert (r.tb.min_lon, r.tb.min_lat, r.tb.max_lon, r.tb.max_lat) == \
               (r.a, r.b, r.c, r.d)


def test_merc_bounds_and_geojson_match_catalyst(spark, sql_fns):
    df = _grid(spark)
    xmin, ymin, xmax, ymax = tile_mercator_bounds_cols(F.col("x"), F.col("y"), F.col("z"))
    mnl, mnt, mxl, mxt = tile_bounds_cols(F.col("x"), F.col("y"), F.col("z"))
    df.withColumn("a", xmin).withColumn("b", ymin).withColumn("c", xmax) \
      .withColumn("d", ymax).withColumn("gj", tile_geojson_col(mnl, mnt, mxl, mxt)) \
      .createOrReplaceTempView("g3")
    rows = spark.sql("""
      SELECT a, b, c, d, gj, tg_tile_merc_bounds(x, y, z) AS mb,
             tg_tile_geojson(x, y, z) AS gj2 FROM g3""").collect()
    for r in rows:
        assert (r.mb.xmin, r.mb.ymin, r.mb.xmax, r.mb.ymax) == (r.a, r.b, r.c, r.d)
        assert r.gj2 == r.gj


def test_tile_intersects_sql_matches_golden_shape_set(spark, sql_fns, t_geom):
    """The st_intersects-style predicate, pure SQL-string pipeline:
    enumerate the bbox grid with tg_* functions, filter with
    tg_tile_intersects — must equal the golden 7 shape tiles."""
    geojson = json.dumps({
        "type": "MultiPolygon",
        "coordinates": [
            [[list(map(float, pt)) for pt in ring] for ring in poly]
            for poly in t_geom.polygons
        ],
    })
    minx, miny, maxx, maxy = t_geom.bbox
    got = spark.sql(f"""
      WITH corner AS (
        SELECT tg_tile_encode({minx!r}d, {maxy!r}d, 16) AS tl,
               tg_tile_encode({maxx!r}d, {miny!r}d, 16) AS br
      ),
      grid AS (
        SELECT explode(sequence(tl.x, br.x)) AS x, tl, br FROM corner
      ),
      cells AS (
        SELECT x, explode(sequence(tl.y, br.y)) AS y FROM grid
      )
      SELECT x, y FROM cells
      WHERE tg_tile_intersects(
        tg_tile_bounds(x, y, 16).min_lon, tg_tile_bounds(x, y, 16).min_lat,
        tg_tile_bounds(x, y, 16).max_lon, tg_tile_bounds(x, y, 16).max_lat,
        '{geojson}')
    """).collect()
    assert sorted((r.x, r.y) for r in got) == sorted(T_SHAPE_Z16)


def test_tile_intersects_null_semantics(spark, sql_fns):
    """NULL geometry or bounds -> NULL (not false): NOT pred must not
    select NULL rows (round-3 review finding)."""
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 1.0, 1.0, '{"type":"Polygon","coordinates":[[[0,0],[0,2],[2,2],[2,0],[0,0]]]}'),
         (2, 0.0, 0.0, 1.0, 1.0, None),
         (3, None, 0.0, 1.0, 1.0, '{"type":"Polygon","coordinates":[[[0,0],[0,2],[2,2],[2,0],[0,0]]]}')],
        "id int, a double, b double, c double, d double, gj string",
    )
    df.createOrReplaceTempView("nulltest")
    hit = spark.sql(
        "SELECT id FROM nulltest WHERE tg_tile_intersects(a, b, c, d, gj)"
    ).collect()
    miss = spark.sql(
        "SELECT id FROM nulltest WHERE NOT tg_tile_intersects(a, b, c, d, gj)"
    ).collect()
    assert [r.id for r in hit] == [1]
    assert miss == []  # NULL rows excluded from BOTH branches
