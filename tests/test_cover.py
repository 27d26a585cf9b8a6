"""compact_cover / uncompact_cover vs a plain-Python set oracle."""

import random

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.cover import compact_cover, uncompact_cover


def _compact_oracle(tiles, zoom, min_zoom):
    """Set-based reference: promote complete sibling quads level by
    level; returns {(z, x, y)}."""
    frontier = set(tiles)
    out = set()
    for level in range(zoom, min_zoom, -1):
        quads = {}
        for x, y in frontier:
            quads.setdefault((x >> 1, y >> 1), set()).add((x, y))
        frontier = set()
        for (px, py), kids in quads.items():
            if len(kids) == 4:
                frontier.add((px, py))
            else:
                out |= {(level, x, y) for x, y in kids}
    return out | {(min_zoom, x, y) for x, y in frontier}


def _tiles_df(spark, tiles):
    return spark.createDataFrame(
        [(int(x), int(y)) for x, y in tiles], "x long, y long"
    )


def _rows(df):
    return {(r.z, r.x, r.y) for r in df.collect()}


def test_aligned_block_collapses_to_one_cell(spark):
    tiles = [(x, y) for x in range(4, 8) for y in range(8, 12)]
    got = compact_cover(_tiles_df(spark, tiles), 4, min_zoom=2)
    assert _rows(got) == {(2, 1, 2)}


def test_hole_punched_block(spark):
    tiles = [(x, y) for x in range(8, 16) for y in range(16, 24)]
    tiles.remove((9, 17))
    got = compact_cover(_tiles_df(spark, tiles), 5, min_zoom=0)
    assert _rows(got) == _compact_oracle(tiles, 5, 0)


def test_min_zoom_stops_promotion(spark):
    tiles = [(x, y) for x in range(4, 8) for y in range(8, 12)]
    df = _tiles_df(spark, tiles)
    # min_zoom == zoom: identity (plus dedup)
    got = compact_cover(df.unionByName(df), 4, min_zoom=4)
    assert _rows(got) == {(4, x, y) for x, y in tiles}
    # one level up only: four z=3 cells, never the z=2 root
    got3 = compact_cover(df, 4, min_zoom=3)
    assert _rows(got3) == {(3, x, y) for x in (2, 3) for y in (4, 5)}


def test_cell_id_packing(spark):
    got = compact_cover(_tiles_df(spark, [(5, 9)]), 4, min_zoom=4)
    [r] = got.collect()
    assert r.cell_id == (4 << 58) | (5 << 29) | 9


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_round_trip_random_sets(spark, seed):
    rng = random.Random(seed)
    zoom = 6
    tiles = {
        (rng.randrange(0, 1 << zoom), rng.randrange(0, 1 << zoom))
        for _ in range(rng.randrange(1, 400))
    }
    cover = compact_cover(_tiles_df(spark, sorted(tiles)), zoom, min_zoom=1)
    assert _rows(cover) == _compact_oracle(tiles, zoom, 1)
    back = uncompact_cover(cover, zoom)
    assert _rows(back) == {(zoom, x, y) for x, y in tiles}


def test_uncompact_multi_level_expansion(spark):
    cover = spark.createDataFrame(
        [(2, 1, 2), (4, 5, 9)], "z int, x long, y long"
    )
    got = uncompact_cover(cover, 4)
    expect = {(4, x, y) for x in range(4, 8) for y in range(8, 12)}
    expect.add((4, 5, 9))
    assert _rows(got) == expect


def test_uncompact_rejects_deeper_cells(spark):
    cover = spark.createDataFrame([(5, 1, 1)], "z int, x long, y long")
    with pytest.raises(Exception, match="deeper than target zoom"):
        uncompact_cover(cover, 4).collect()


def test_zoom_validation(spark):
    df = _tiles_df(spark, [(0, 0)])
    with pytest.raises(ValueError, match="min_zoom"):
        compact_cover(df, 4, min_zoom=5)
    with pytest.raises(ValueError, match="zoom"):
        compact_cover(df, 31)


def test_no_shuffle_in_uncompact(spark):
    cover = spark.createDataFrame([(2, 1, 2)], "z int, x long, y long")
    plan = uncompact_cover(cover, 5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
