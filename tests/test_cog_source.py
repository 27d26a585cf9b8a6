"""Distributed COG scan (sources/cog_source.py) — header-only index,
bbox pruning, range-read decode parity, overview levels, multi-file."""

import os

import numpy as np
import pytest

from tilegrab_spark.kernels import cog
from tilegrab_spark.sources.cog_source import (
    cog_tile_index,
    fetch_cog_tiles,
    read_cog_index,
    read_cog_tiles,
)


def _scene(h, w, seed):
    rng = np.random.default_rng(seed)
    g = np.add.outer(np.arange(h) % 251, np.arange(w) % 239)[..., None]
    n = rng.integers(0, 50, (h // 4 + 1, w // 4 + 1, 3)).repeat(4, 0).repeat(4, 1)
    return ((g + n[:h, :w]) % 256).astype(np.uint8)


@pytest.fixture(scope="module")
def cog_dir(tmp_path_factory):
    """Two COGs side by side in model space, known scenes."""
    d = tmp_path_factory.mktemp("coglake")
    scenes = {}
    for i, (h, w, x0) in enumerate([(700, 900, 0.0), (600, 800, 9000.0)]):
        arr = _scene(h, w, seed=i)
        bounds = (x0, 0.0, x0 + w * 10.0, h * 10.0)  # 10 model units/px
        (d / f"{i}.tif").write_bytes(cog.encode_cog(arr, bounds))
        scenes[str(d / f"{i}.tif")] = (arr, bounds)
    return d, scenes


def _reassemble(rows, lw, lh):
    canvas = np.zeros((lh, lw, 3), np.uint8)
    for r in rows:
        px = np.frombuffer(bytes(r.px), np.uint8).reshape(r.h, r.w, 3)
        canvas[r.ty * 256:r.ty * 256 + r.h, r.tx * 256:r.tx * 256 + r.w] = px
    return canvas


def test_header_only_index(cog_dir):
    d, scenes = cog_dir
    path = sorted(scenes)[0]
    idx = read_cog_index(path)
    arr, bounds = scenes[path]
    assert idx["bounds"] == bounds and idx["epsg"] == 3857
    assert idx["levels"][0]["w"] == 900 and idx["levels"][0]["h"] == 700
    assert len(idx["levels"]) == 3
    # header-first layout → the index parses from the metadata prefix
    # alone; the prefix is a tiny fraction of the file
    data = (d / "0.tif").read_bytes()
    hb = cog.validate_cog_layout(data)["header_bytes"]
    assert idx == cog.parse_index(data[:hb])
    assert hb < len(data) // 50


def test_full_scan_roundtrip(spark, cog_dir):
    d, scenes = cog_dir
    tiles = read_cog_tiles(spark, str(d)).collect()
    assert all(t.epsg == 3857 for t in tiles)
    for path, (arr, _b) in scenes.items():
        mine = [t for t in tiles if t.path == path and t.level == 0]
        h, w = arr.shape[:2]
        assert np.array_equal(_reassemble(mine, w, h), arr)


def test_bbox_pruning_and_pixel_parity(spark, cog_dir):
    d, scenes = cog_dir
    path = sorted(scenes)[0]
    arr, (xmin, ymin, xmax, ymax) = scenes[path]
    # bbox = one 256px tile in the middle of raster 0 (model units: 10/px)
    bbox = (xmin + 2600.0, ymax - 5100.0, xmin + 3000.0, ymax - 2700.0)
    idx = cog_tile_index(spark, [path], bbox=bbox).collect()
    full = cog_tile_index(spark, [path]).collect()
    assert 0 < len(idx) < len(full)
    # pruning is exact: kept == tiles whose bounds intersect the bbox
    keep = {
        (r.ty, r.tx) for r in full
        if not (r.merc_xmin >= bbox[2] or r.merc_xmax <= bbox[0]
                or r.merc_ymin >= bbox[3] or r.merc_ymax <= bbox[1])
    }
    assert {(r.ty, r.tx) for r in idx} == keep
    # decoded pixels match the source crop, tile by tile
    for t in fetch_cog_tiles(cog_tile_index(spark, [path], bbox=bbox)).collect():
        px = np.frombuffer(bytes(t.px), np.uint8).reshape(t.h, t.w, 3)
        assert np.array_equal(
            px, arr[t.ty * 256:t.ty * 256 + t.h, t.tx * 256:t.tx * 256 + t.w]
        )
        # and the georeferencing round-trips: bounds → pixel indices
        assert t.merc_xmin == pytest.approx(xmin + t.tx * 256 * 10.0)
        assert t.merc_ymax == pytest.approx(ymax - t.ty * 256 * 10.0)


def test_overview_level_scan(spark, cog_dir):
    d, scenes = cog_dir
    path = sorted(scenes)[0]
    arr, _ = scenes[path]
    lv1 = cog.downsample2x(arr)
    rows = read_cog_tiles(spark, [path], level=1).collect()
    assert np.array_equal(
        _reassemble(rows, lv1.shape[1], lv1.shape[0]), lv1
    )
    with pytest.raises(Exception, match="out of range"):
        read_cog_tiles(spark, [path], level=9).collect()


def test_fetch_reads_only_selected_ranges(spark, cog_dir):
    """The fetch stage's I/O is O(selected tiles): grand total of
    byte_count over a 1-tile bbox is far below the file size."""
    d, scenes = cog_dir
    path = sorted(scenes)[0]
    xmin, ymin, xmax, ymax = scenes[path][1]
    bbox = (xmin + 100.0, ymax - 200.0, xmin + 200.0, ymax - 100.0)
    idx = cog_tile_index(spark, [path], bbox=bbox).collect()
    assert len(idx) == 1  # one corner tile
    assert sum(r.byte_count for r in idx) < os.path.getsize(path) // 8


def test_empty_match_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no COG files"):
        read_cog_tiles(spark, str(tmp_path))
