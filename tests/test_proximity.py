"""Proximity raster: bit-exact octile closed-form oracle, Voronoi
allocation ties, explicit-sources path, threshold/band selection, and
feature extraction."""

import math

import numpy as np
import pytest

from tilegrab_spark.kernels.png import encode_png
from tilegrab_spark.operators.dedup import release_signature_caches
from tilegrab_spark.operators.proximity import feature_pixels, proximity

Z, TP, G = 5, 32, 2
SQ2 = math.sqrt(2.0)


def _mask_images(spark, feats, value=9):
    """feats: set of (gx, gy) feature pixels -> mask image table."""
    rows = []
    for tx in range(G):
        for ty in range(G):
            lab = np.zeros((TP, TP), dtype=np.uint8)
            for gx, gy in feats:
                if tx * TP <= gx < (tx + 1) * TP and ty * TP <= gy < (ty + 1) * TP:
                    lab[gy - ty * TP, gx - tx * TP] = value
            rgb = np.repeat(lab[:, :, None], 3, axis=2)
            rows.append((Z, tx, ty, bytearray(encode_png(rgb)), TP, TP, "png"))
    return spark.createDataFrame(
        rows, "z int, x long, y long, bytes binary, w int, h int, fmt string"
    )


def _octile(dx, dy):
    a, b = abs(dx), abs(dy)
    return max(a, b) - min(a, b) + SQ2 * min(a, b)


def _collect_dist(out_rows):
    world = {}
    alloc = {}
    for r in out_rows:
        assert r.status == "ok"
        d = np.frombuffer(bytes(r.dist), dtype="<f8").reshape(r.h, r.w)
        a = np.frombuffer(bytes(r.alloc), dtype="<i8").reshape(r.h, r.w)
        world[(int(r.x), int(r.y))] = d
        alloc[(int(r.x), int(r.y))] = a
    return world, alloc


def test_octile_closed_form(spark):
    # rtol 1e-12: the wavefront accumulates 1/sqrt(2) per step along the
    # optimal path, so values differ from the one-multiply closed form
    # by a few ULPs (the cost_distance suite's EXACT-equality contract
    # is vs a same-accumulation-order Dijkstra oracle, not this form).
    feats = [(10, 12), (50, 40), (33, 20)]
    images = _mask_images(spark, feats)
    out = proximity(images, zoom=Z, tile_px=TP).collect()
    release_signature_caches()
    world, _ = _collect_dist(out)
    assert set(world) == {(x, y) for x in range(G) for y in range(G)}
    cs, rs = np.meshgrid(np.arange(TP), np.arange(TP))
    for (tx, ty), d in world.items():
        gx, gy = tx * TP + cs, ty * TP + rs
        want = np.full((TP, TP), np.inf)
        for fx, fy in feats:
            a, b = np.abs(gx - fx), np.abs(gy - fy)
            want = np.minimum(want, np.maximum(a, b) - np.minimum(a, b)
                              + SQ2 * np.minimum(a, b))
        np.testing.assert_allclose(d, want, rtol=1e-12, atol=0)


def test_alloc_is_octile_voronoi_with_min_sid_ties(spark):
    feats = [(8, 8), (24, 8)]
    images = _mask_images(spark, feats)
    out = proximity(images, zoom=Z, tile_px=TP).collect()
    release_signature_caches()
    world, alloc = _collect_dist(out)
    n_world = (1 << Z) * TP
    sids = {f: f[1] * n_world + f[0] for f in feats}
    d = world[(0, 0)]
    a = alloc[(0, 0)]
    for r in range(TP):
        for c in range(TP):
            gx, gy = c, r
            dists = {f: _octile(gx - f[0], gy - f[1]) for f in feats}
            best = min(dists.values())
            winners = sorted(sids[f] for f, v in dists.items() if v == best)
            assert a[r, c] == winners[0], (gx, gy)


def test_explicit_sources_and_threshold(spark):
    # empty mask + explicit point sources; also check threshold gates
    images = _mask_images(spark, [], value=0)
    src = spark.createDataFrame([(5, 5)], "gx long, gy long")
    out = proximity(images, zoom=Z, tile_px=TP, sources=src).collect()
    release_signature_caches()
    world, _ = _collect_dist(out)
    assert world[(0, 0)][5, 5] == 0.0
    # low-value mask pixels below threshold are not features
    faint = _mask_images(spark, [(9, 9)], value=3)
    rows = feature_pixels(faint, zoom=Z, tile_px=TP, threshold=4).collect()
    assert rows == []
    rows = feature_pixels(faint, zoom=Z, tile_px=TP, threshold=3).collect()
    assert [(r.gx, r.gy) for r in rows] == [(9, 9)]


def test_feature_pixels_extraction_matches_mask(spark):
    rng = np.random.default_rng(4)
    feats = {(int(rng.integers(0, G * TP)), int(rng.integers(0, G * TP))) for _ in range(40)}
    images = _mask_images(spark, feats)
    got = {(r.gx, r.gy) for r in feature_pixels(images, zoom=Z, tile_px=TP).collect()}
    assert got == feats


def test_validation(spark):
    images = _mask_images(spark, [(1, 1)])
    with pytest.raises(ValueError):
        feature_pixels(images, zoom=23)
    with pytest.raises(ValueError):
        feature_pixels(images, zoom=Z, threshold=0)
