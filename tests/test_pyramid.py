"""Pyramid rollup vs a straight-numpy downsample oracle."""

import numpy as np
from pyspark.sql import functions as F

from tilegrab_spark.kernels import png
from tilegrab_spark.operators.pyramid import build_parent_level, build_pyramid
from tilegrab_spark.sources.images import (
    read_image_table,
    write_synthetic_image_table,
)


def _oracle_parent(px, py, zoom, present):
    canvas = np.zeros((512, 512, 3), np.uint8)
    for dy in (0, 1):
        for dx in (0, 1):
            x, y = px * 2 + dx, py * 2 + dy
            if (x, y) in present:
                canvas[dy * 256 : (dy + 1) * 256, dx * 256 : (dx + 1) * 256] = (
                    png.synth_tile_pixels(x, y, zoom, 0)
                )
    return canvas.reshape(256, 2, 256, 2, 3).mean(axis=(1, 3)).astype(np.uint8)


def test_parent_level_pixel_oracle(spark, tmp_path):
    zoom = 10
    present = {(4, 4), (5, 4), (4, 5), (5, 5), (6, 4), (7, 5)}  # one full, one partial parent
    path = str(tmp_path / "imgs")
    write_synthetic_image_table(spark, path, [(zoom, x, y, 0) for x, y in present], n_buckets=2)
    children = read_image_table(spark, path)
    parents = {(r.image_id): r for r in build_parent_level(children, zoom, n_buckets=2).collect()}
    assert set(parents) == {"9_2_2_0", "9_3_2_0"}
    full = parents["9_2_2_0"]
    assert full.n_children == 4 and full.zoom == 9
    got = png.decode_png(bytes(full.bytes))
    want = _oracle_parent(2, 2, zoom, present)
    assert (got == want).all()
    partial = parents["9_3_2_0"]
    assert partial.n_children == 2
    got_p = png.decode_png(bytes(partial.bytes))
    want_p = _oracle_parent(3, 2, zoom, present)
    assert (got_p == want_p).all()


def test_build_pyramid_multi_level(spark, tmp_path):
    zoom = 6
    cells = [(zoom, x, y, 0) for x in range(8, 12) for y in range(8, 12)]  # 4x4 block
    base = str(tmp_path / "base")
    pyr = str(tmp_path / "pyr")
    write_synthetic_image_table(spark, base, cells, n_buckets=2)
    children = read_image_table(spark, base)
    build_pyramid(children, pyr, z_max=zoom, z_min=zoom - 2, n_buckets=2)
    out = read_image_table(spark, pyr)
    by_zoom = {r.zoom: r.cnt for r in out.groupBy("zoom").agg(F.count("*").alias("cnt")).collect()}
    assert by_zoom == {5: 4, 4: 1}  # 16 -> 4 -> 1
    top = out.filter(F.col("zoom") == 4).collect()[0]
    assert top.image_id == "4_2_2_0"
    # every level's rows parse back through the standard reader
    assert out.filter(F.col("x") * 2 > 0).count() >= 0
