"""Pyramid rollup vs a straight-numpy downsample oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.kernels import png
from tilegrab_spark.operators.pyramid import (
    build_parent_level,
    build_pyramid,
    dirty_ancestors,
)
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


def test_dirty_ancestors_duckdb_oracle(spark):
    import duckdb

    pts = [(37 * i % 4096, (53 * i * i + 11) % 4096) for i in range(40)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted(
        (r.zoom, r.x, r.y)
        for r in dirty_ancestors(df, z_base=12, z_min=5).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    want = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT DISTINCT 12 - g.u AS zoom, t.x >> g.u, t.y >> g.u "
            "FROM pts t, generate_series(1, 7) AS g(u)"
        ).fetchall()
    )
    assert got == want


def test_dirty_ancestors_validation(spark):
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    with pytest.raises(ValueError):
        dirty_ancestors(df, z_base=5, z_min=5)
    with pytest.raises(ValueError):
        dirty_ancestors(df, z_base=5, z_min=-1)


def test_refresh_pyramid_matches_full_rebuild(spark, tmp_path):
    """Incremental refresh after a 2-tile change == full rebuild of the
    new epoch, byte-for-pixel, and touches ONLY the dirty ancestors."""
    zoom = 6
    cells_a = [(zoom, x, y, 0) for x in range(8, 12) for y in range(8, 12)]
    # epoch B: two tiles change content (different synth src), in two
    # DIFFERENT level-5 parents so the dirty set has 2 + 1 cells
    changed_xy = [(8, 8), (11, 10)]
    cells_b = [
        (z, x, y, 1 if (x, y) in changed_xy else s) for z, x, y, s in cells_a
    ]
    base_a, base_b = str(tmp_path / "a"), str(tmp_path / "b")
    pyr_a, pyr_b = str(tmp_path / "pa"), str(tmp_path / "pb")
    write_synthetic_image_table(spark, base_a, cells_a, n_buckets=2)
    write_synthetic_image_table(spark, base_b, cells_b, n_buckets=2)
    build_pyramid(read_image_table(spark, base_a), pyr_a, z_max=zoom, z_min=zoom - 2, n_buckets=2)
    build_pyramid(read_image_table(spark, base_b), pyr_b, z_max=zoom, z_min=zoom - 2, n_buckets=2)

    from tilegrab_spark.operators.dedup import release_signature_caches
    from tilegrab_spark.operators.pyramid import refresh_pyramid

    changed = spark.createDataFrame(changed_xy, "x long, y long")
    repl = refresh_pyramid(
        read_image_table(spark, base_b),
        read_image_table(spark, pyr_a),
        changed,
        z_base=zoom,
        z_min=zoom - 2,
        n_buckets=2,
    ).collect()
    release_signature_caches()

    # exactly the dirty ancestors: (5,4,4), (5,5,5), (4,2,2)
    assert sorted(r.image_id for r in repl) == ["4_2_2_0", "5_4_4_0", "5_5_5_0"]
    oracle = {r.image_id: r for r in read_image_table(spark, pyr_b).collect()}
    for r in repl:
        want = png.decode_png(bytes(oracle[r.image_id].bytes))
        got = png.decode_png(bytes(r.bytes))
        assert (got == want).all(), r.image_id
        assert r.n_children == oracle[r.image_id].n_children
    # untouched overview cells were already correct for epoch B (their
    # subtrees didn't change) — replacing only the dirty set yields the
    # full-rebuild pyramid
    old = {r.image_id: bytes(r.bytes) for r in read_image_table(spark, pyr_a).collect()}
    dirty_ids = {r.image_id for r in repl}
    for iid, b in oracle.items():
        if iid not in dirty_ids:
            assert old[iid] == bytes(b.bytes), iid
