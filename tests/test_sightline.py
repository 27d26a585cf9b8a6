"""Pairwise line-of-sight: numpy step-walk oracle parity on random
terrain, wall blocking, flat visibility, unknown surfacing, height
overrides, and the explode guard."""

import math

import numpy as np
import pytest

from tilegrab_spark.kernels.png import encode_png
from tilegrab_spark.operators.sightline import line_of_sight

Z, TP, G = 5, 32, 2


def _images_from_elev(spark, elev):
    """elev: (G*TP, G*TP) uint8 world grid -> image-table tiles."""
    rows = []
    for tx in range(G):
        for ty in range(G):
            a = elev[ty * TP:(ty + 1) * TP, tx * TP:(tx + 1) * TP]
            rgb = np.repeat(a[:, :, None], 3, axis=2).astype(np.uint8)
            rows.append((Z, tx, ty, bytearray(encode_png(rgb)), TP, TP, "png"))
    return spark.createDataFrame(
        rows, "z int, x long, y long, bytes binary, w int, h int, fmt string"
    )


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(i,) + p for i, p in enumerate(pairs)],
        "pair_id long, gx_a long, gy_a long, gx_b long, gy_b long",
    )


def _oracle(elev, a, b, h_a, h_b):
    """Same stepping convention as the operator: n = chebyshev,
    pixel = floor(lerp + 0.5), interior strict clearance."""
    n = max(abs(b[0] - a[0]), abs(b[1] - a[1]))
    if n <= 1:
        return True, None
    ea = float(elev[a[1], a[0]]) + h_a
    eb = float(elev[b[1], b[0]]) + h_b
    min_c = math.inf
    for i in range(1, n):
        t = i / n
        gx = math.floor(a[0] + t * (b[0] - a[0]) + 0.5)
        gy = math.floor(a[1] + t * (b[1] - a[1]) + 0.5)
        c = (ea + t * (eb - ea)) - float(elev[gy, gx])
        min_c = min(min_c, c)
    return min_c > 0, min_c


def test_flat_terrain_all_visible(spark):
    elev = np.zeros((G * TP, G * TP), dtype=np.uint8)
    images = _images_from_elev(spark, elev)
    pairs = [(1, 1, 60, 50), (5, 40, 55, 5), (10, 10, 10, 10), (3, 3, 4, 4)]
    out = {r.pair_id: r for r in line_of_sight(
        images, _pairs_df(spark, pairs), zoom=Z, tile_px=TP).collect()}
    assert len(out) == 4
    for r in out.values():
        assert r.status == "visible" and r.visible
        assert r.n_missing == 0


def test_wall_blocks_and_clearance_sign(spark):
    elev = np.zeros((G * TP, G * TP), dtype=np.uint8)
    elev[:, 30:34] = 200  # vertical wall
    images = _images_from_elev(spark, elev)
    pairs = [(5, 20, 60, 20),   # crosses the wall -> blocked
             (5, 20, 25, 20)]   # stays west of it -> visible
    out = {r.pair_id: r for r in line_of_sight(
        images, _pairs_df(spark, pairs), zoom=Z, tile_px=TP,
        observer_height=10.0, target_height=10.0).collect()}
    assert out[0].status == "blocked" and out[0].visible is False
    assert out[0].min_clearance < 0
    assert out[1].status == "visible"


def test_matches_oracle_on_random_terrain(spark):
    rng = np.random.default_rng(12)
    elev = rng.integers(0, 120, size=(G * TP, G * TP)).astype(np.uint8)
    images = _images_from_elev(spark, elev)
    pairs = []
    for _ in range(25):
        pairs.append(tuple(int(v) for v in rng.integers(0, G * TP, size=4)))
    out = {r.pair_id: r for r in line_of_sight(
        images, _pairs_df(spark, pairs), zoom=Z, tile_px=TP,
        observer_height=5.0, target_height=5.0).collect()}
    assert len(out) == len(pairs)
    for i, p in enumerate(pairs):
        want_vis, want_min = _oracle(elev, p[:2], p[2:], 5.0, 5.0)
        r = out[i]
        assert r.status in ("visible", "blocked")
        assert bool(r.visible) == want_vis, (i, p)
        if want_min is not None:
            assert r.min_clearance == pytest.approx(want_min, abs=1e-9), (i, p)


def test_missing_tile_is_unknown_not_visible(spark):
    from pyspark.sql import functions as F

    elev = np.zeros((G * TP, G * TP), dtype=np.uint8)
    images = _images_from_elev(spark, elev).filter(
        ~((F.col("x") == 1) & (F.col("y") == 0))
    )
    pairs = [(1, 5, 60, 5),   # crosses the missing tile (x in [32,63], y<32)
             (1, 40, 20, 40)]  # stays in present tiles
    out = {r.pair_id: r for r in line_of_sight(
        images, _pairs_df(spark, pairs), zoom=Z, tile_px=TP).collect()}
    assert out[0].status == "unknown" and out[0].visible is None
    assert out[0].n_missing > 0
    assert out[1].status == "visible"


def test_height_override_columns(spark):
    elev = np.zeros((G * TP, G * TP), dtype=np.uint8)
    elev[:, 30:34] = 50
    images = _images_from_elev(spark, elev)
    df = spark.createDataFrame(
        [(0, 10, 20, 55, 20, 100.0, 100.0), (1, 10, 20, 55, 20, 1.0, 1.0)],
        "pair_id long, gx_a long, gy_a long, gx_b long, gy_b long, h_a double, h_b double",
    )
    out = {r.pair_id: r for r in line_of_sight(images, df, zoom=Z, tile_px=TP).collect()}
    assert out[0].status == "visible"   # flies over the 50-high wall
    assert out[1].status == "blocked"


def test_max_steps_guard(spark):
    elev = np.zeros((G * TP, G * TP), dtype=np.uint8)
    images = _images_from_elev(spark, elev)
    with pytest.raises(ValueError, match="max_steps"):
        line_of_sight(
            images, _pairs_df(spark, [(0, 0, 60, 60)]), zoom=Z, tile_px=TP,
            max_steps=10,
        )
