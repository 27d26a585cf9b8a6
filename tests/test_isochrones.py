"""Isochrones: band classification vs the octile-metric oracle on a
uniform friction surface, polygonize pixel-count invariants, and the
end-to-end composition."""

import math

import numpy as np
import pytest

from tilegrab_spark.kernels.png import decode_png, encode_png
from tilegrab_spark.operators.costdistance import cost_distance
from tilegrab_spark.operators.dedup import release_signature_caches
from tilegrab_spark.operators.isochrones import cost_bands, isochrones

Z, TP, G = 5, 32, 2  # G x G tiles of TP px


def _uniform_images(spark, value=1):
    rows = []
    rgb = np.full((TP, TP, 3), value, dtype=np.uint8)
    data = encode_png(rgb, filter_type=0)
    for x in range(G):
        for y in range(G):
            rows.append((Z, x, y, bytearray(data), TP, TP, "png"))
    return spark.createDataFrame(
        rows, "z int, x long, y long, bytes binary, w int, h int, fmt string"
    )


def _octile(dx, dy):
    a, b = abs(dx), abs(dy)
    return max(a, b) - min(a, b) + math.sqrt(2.0) * min(a, b)


@pytest.fixture(scope="module")
def cost_out(spark):
    images = _uniform_images(spark)
    src = spark.createDataFrame([(30, 30)], "gx long, gy long")
    out = cost_distance(images, src, zoom=Z, tile_px=TP).localCheckpoint()
    yield out
    release_signature_caches()


def test_cost_bands_match_octile_oracle(spark, cost_out):
    thr = [8.0, 16.0, 24.0]
    got = {}
    for r in cost_bands(cost_out, thr, drop_empty=False).collect():
        lab = decode_png(bytes(r.bytes))[:, :, 0]
        got[(int(r.x), int(r.y))] = lab
    assert set(got) == {(x, y) for x in range(G) for y in range(G)}
    for (tx, ty), lab in got.items():
        for r in range(TP):
            for c in range(TP):
                d = _octile(tx * TP + c - 30, ty * TP + r - 30)
                want = 0
                for i, t in enumerate(thr):
                    if d <= t:
                        want = i + 1
                        break
                assert lab[r, c] == want, (tx, ty, r, c, d)


def test_cost_bands_drop_empty_prunes_far_tiles(spark):
    # source at tile (0,0) center, tiny threshold: only that tile
    # holds band pixels, the other three drop
    images = _uniform_images(spark)
    src = spark.createDataFrame([(16, 16)], "gx long, gy long")
    out = cost_distance(images, src, zoom=Z, tile_px=TP)
    rows = cost_bands(out, [4.0]).collect()
    release_signature_caches()
    assert {(int(r.x), int(r.y)) for r in rows} == {(0, 0)}


def test_cost_bands_validation(spark, cost_out):
    for bad in ([], [3.0, 2.0], [0.0], [float("inf")], list(range(1, 300))):
        with pytest.raises(ValueError):
            cost_bands(cost_out, bad)


def test_isochrones_end_to_end_region_px_invariant(spark):
    images = _uniform_images(spark)
    src = spark.createDataFrame([(30, 30)], "gx long, gy long")
    thr = [8.0, 20.0]
    rings = isochrones(images, src, thr, zoom=Z, tile_px=TP).collect()
    release_signature_caches()
    assert rings
    # threshold column maps label -> thresholds[label-1]
    for r in rings:
        assert r.threshold == thr[r.label - 1]
    # per band, polygonized pixel mass == direct octile pixel count
    per_band_px = {}
    for r in rings:
        if r.ring_idx == 0:
            per_band_px[r.label] = per_band_px.get(r.label, 0) + r.region_px
    want = {1: 0, 2: 0}
    for gy in range(G * TP):
        for gx in range(G * TP):
            d = _octile(gx - 30, gy - 30)
            if d <= thr[0]:
                want[1] += 1
            elif d <= thr[1]:
                want[2] += 1
    # region_px counts each region once (rows repeat per ring); dedupe
    seen = {}
    for r in rings:
        seen[r.region_id] = (r.label, r.region_px)
    got = {1: 0, 2: 0}
    for lab, px in seen.values():
        got[lab] += px
    assert got == want


def test_isochrones_bands_nest(spark):
    """Every band-1 pixel's region sits inside the reach of band 2:
    coarse nesting check via ring bounding boxes."""
    images = _uniform_images(spark)
    src = spark.createDataFrame([(30, 30)], "gx long, gy long")
    rings = isochrones(images, src, [6.0, 18.0], zoom=Z, tile_px=TP).collect()
    release_signature_caches()
    boxes = {}
    for r in rings:
        if r.ring_idx != 0:
            continue
        xs, ys = list(r.xs), list(r.ys)
        b = (min(xs), min(ys), max(xs), max(ys))
        prev = boxes.get(r.label)
        boxes[r.label] = (
            b if prev is None else (
                min(prev[0], b[0]), min(prev[1], b[1]),
                max(prev[2], b[2]), max(prev[3], b[3]),
            )
        )
    assert set(boxes) == {1, 2}
    inner, outer = boxes[1], boxes[2]
    assert outer[0] <= inner[0] and outer[1] <= inner[1]
    assert outer[2] >= inner[2] and outer[3] >= inner[3]
