"""Polygonize vs an independent flood-fill + rasterize-back oracle.

The strong checks: (1) per region, sum of signed ring areas equals the
region's pixel count exactly; (2) rasterizing the rings back (even-odd
ray casting at pixel centers) reproduces the flood-fill region map
pixel-for-pixel; (3) output is invariant to input partitioning."""

from collections import deque

import numpy as np
import pytest

from tilegrab_spark.operators.dedup import release_signature_caches
from tilegrab_spark.operators.polygonize import polygonize, polygons_lonlat

SCHEMA = "z int, x long, y long, bytes binary, w int, h int, fmt string"


def _tiles_from_world(world: np.ndarray, tile: int, zoom: int, origin=(0, 0)):
    """Split a (H, W) label raster into (z, x, y, raw-rgb) tile rows."""
    H, W = world.shape
    rows = []
    for ty in range(H // tile):
        for tx in range(W // tile):
            lab = world[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile]
            rgb = np.repeat(lab[:, :, None], 3, axis=2).astype(np.uint8)
            rows.append(
                (zoom, origin[0] + tx, origin[1] + ty, bytes(rgb.tobytes()), tile, tile, "raw")
            )
    return rows


def _flood_regions(world: np.ndarray):
    """4-connectivity flood fill: region map (H, W) of dense ids + per
    region (label, pixel set)."""
    H, W = world.shape
    rid = -np.ones((H, W), dtype=np.int64)
    regions = []
    for r in range(H):
        for c in range(W):
            if rid[r, c] >= 0:
                continue
            q, lab = deque([(r, c)]), world[r, c]
            rid[r, c] = len(regions)
            px = [(r, c)]
            while q:
                cr, cc = q.popleft()
                for nr, nc in ((cr - 1, cc), (cr + 1, cc), (cr, cc - 1), (cr, cc + 1)):
                    if 0 <= nr < H and 0 <= nc < W and rid[nr, nc] < 0 and world[nr, nc] == lab:
                        rid[nr, nc] = rid[r, c]
                        q.append((nr, nc))
                        px.append((nr, nc))
            regions.append((int(lab), set(px)))
    return rid, regions


def _rasterize(rings, H, W):
    """Even-odd ray casting at pixel centers over a region's rings →
    set of (row, col) inside."""
    vsegs = []  # (x, ymin, ymax)
    for xs, ys in rings:
        for i in range(len(xs) - 1):
            if xs[i] == xs[i + 1]:
                vsegs.append((xs[i], min(ys[i], ys[i + 1]), max(ys[i], ys[i + 1])))
    inside = set()
    for r in range(H):
        cy = r + 0.5
        xs_at = sorted(x for x, y0, y1 in vsegs if y0 < cy < y1)
        for c in range(W):
            cx = c + 0.5
            cnt = sum(1 for x in xs_at if x > cx)
            if cnt % 2 == 1:
                inside.add((r, c))
    return inside


def _run(spark, world, tile, zoom, n_parts=None, origin=(0, 0)):
    df = spark.createDataFrame(_tiles_from_world(world, tile, zoom, origin), SCHEMA)
    if n_parts:
        df = df.repartition(n_parts)
    out = polygonize(df, zoom=zoom).collect()
    release_signature_caches()
    by_region = {}
    for row in out:
        by_region.setdefault(row.region_id, []).append(row)
    for rows in by_region.values():
        rows.sort(key=lambda r: r.ring_idx)
    return by_region


def _world_basic():
    world = np.zeros((32, 32), dtype=np.uint8)
    world[10:22, 10:22] = 7  # rectangle spanning all four 16px tiles
    world[2:7, 2:7] = 3  # donut shell in tile (0,0)
    world[4, 4] = 0  # its hole (a background island)
    world[25, 25] = 9  # single pixel
    return world


def test_invariant_and_oracle_parity(spark):
    world = _world_basic()
    got = _run(spark, world, 16, 1)
    _, regions = _flood_regions(world)

    # engine regions == oracle regions, matched by (label, pixel count)
    want = sorted((lab, len(px)) for lab, px in regions)
    have = sorted((rows[0].label, rows[0].region_px) for rows in got.values())
    assert have == want

    for rows in got.values():
        assert all(r.closed for r in rows)
        # the invariant: signed ring areas sum to the pixel count
        assert sum(r.signed_area_px for r in rows) == rows[0].region_px
        assert rows[0].is_hole is False and rows[0].signed_area_px > 0
        assert all(r.is_hole for r in rows[1:])

    # rasterize back: every region's rings reproduce its pixel set
    oracle_sets = {}
    for lab, px in regions:
        oracle_sets.setdefault((lab, len(px)), []).append(px)
    for rows in got.values():
        rings = [(r.xs, r.ys) for r in rows]
        inside = _rasterize(rings, 32, 32)
        key = (rows[0].label, rows[0].region_px)
        assert any(inside == px for px in oracle_sets[key]), key


def test_rectangle_is_five_vertices(spark):
    world = _world_basic()
    got = _run(spark, world, 16, 1)
    rect = [rows for rows in got.values() if rows[0].label == 7]
    assert len(rect) == 1 and len(rect[0]) == 1
    ring = rect[0][0]
    # spans four tiles, yet collinear border joints are dropped
    assert ring.n_vertices == 5
    assert sorted(zip(ring.xs, ring.ys))[0] == (10, 10)
    assert ring.signed_area_px == 144


def test_donut_rings_and_background_holes(spark):
    world = _world_basic()
    got = _run(spark, world, 16, 1)
    donut = next(rows for rows in got.values() if rows[0].label == 3)
    assert len(donut) == 2
    assert donut[0].signed_area_px == 25 and donut[1].signed_area_px == -1
    assert donut[0].region_px == 24
    # the background region has one hole per island it surrounds
    bg = next(rows for rows in got.values() if rows[0].label == 0 and rows[0].region_px > 100)
    assert sum(1 for r in bg if r.is_hole) == 3  # donut shell, rect, pixel 9


def test_partition_invariance(spark):
    world = _world_basic()
    a = _run(spark, world, 16, 1)
    b = _run(spark, world, 16, 1, n_parts=7)

    def canon(by_region):
        return sorted(
            tuple((tuple(r.xs), tuple(r.ys), r.is_hole) for r in rows)
            for rows in by_region.values()
        )

    assert canon(a) == canon(b)


def test_pinch_vertex_decomposes_cleanly(spark):
    # two diagonal single-pixel islands meeting at one vertex: the
    # surrounding region's boundary has a degree-4 vertex; the chainer
    # must split it into two non-crossing holes (invariant would break
    # on a crossing figure-eight ring).
    world = np.zeros((16, 16), dtype=np.uint8)
    world[5, 6] = 2
    world[6, 5] = 2
    got = _run(spark, world, 8, 1)
    bg = next(rows for rows in got.values() if rows[0].label == 0)
    holes = [r for r in bg if r.is_hole]
    assert len(holes) == 2
    assert all(h.signed_area_px == -1 and h.n_vertices == 5 for h in holes)
    assert sum(r.signed_area_px for r in bg) == bg[0].region_px == 16 * 16 - 2


def test_coverage_edge_missing_tile(spark):
    # drop one of the four tiles: regions stop exactly at the coverage
    # edge and the invariant still holds on what remains
    world = _world_basic()
    rows = [r for r in _tiles_from_world(world, 16, 1) if (r[1], r[2]) != (1, 1)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = polygonize(df, zoom=1).collect()
    release_signature_caches()
    by_region = {}
    for row in out:
        by_region.setdefault(row.region_id, []).append(row)
    total = sum(rows[0].region_px for rows in by_region.values())
    assert total == 3 * 16 * 16
    for rows in by_region.values():
        assert sum(r.signed_area_px for r in rows) == rows[0].region_px
    # the rectangle lost its (1,1) quadrant
    rect = next(rows for rows in by_region.values() if rows[0].label == 7)
    assert rect[0].region_px == 144 - 6 * 6


def test_random_worlds_match_oracle(spark):
    rng = np.random.default_rng(23)
    for _ in range(3):
        world = rng.integers(0, 3, (16, 16), dtype=np.uint8)
        got = _run(spark, world, 8, 1)
        _, regions = _flood_regions(world)
        want = sorted((lab, len(px)) for lab, px in regions)
        have = sorted((rows[0].label, rows[0].region_px) for rows in got.values())
        assert have == want
        for rows in got.values():
            assert sum(r.signed_area_px for r in rows) == rows[0].region_px
        # full rasterize-back parity on the hardest case
        oracle_sets = {}
        for lab, px in regions:
            oracle_sets.setdefault((lab, len(px)), []).append(px)
        for rows in got.values():
            inside = _rasterize([(r.xs, r.ys) for r in rows], 16, 16)
            assert any(
                inside == px for px in oracle_sets[(rows[0].label, rows[0].region_px)]
            )


def test_large_tile_offsets_exact_keys(spark):
    # regression: region keys at zoom-16-scale tile offsets exceed
    # float64's 53-bit mantissa — any int→float coercion in the union
    # frame rounds keys to multiples of 8 and welds ~8 regions into one
    rng = np.random.default_rng(31)
    world = rng.integers(0, 4, (32, 32), dtype=np.uint8)
    got = _run(spark, world, 16, 16, origin=(47439, 31441))
    _, regions = _flood_regions(world)
    want = sorted((lab, len(px)) for lab, px in regions)
    have = sorted((rows[0].label, rows[0].region_px) for rows in got.values())
    assert have == want
    for rows in got.values():
        assert all(r.closed for r in rows)
        assert sum(r.signed_area_px for r in rows) == rows[0].region_px


def test_lonlat_conversion_and_validation(spark):
    world = _world_basic()
    df = spark.createDataFrame(_tiles_from_world(world, 16, 1), SCHEMA)
    rings = polygonize(df, zoom=1)
    ll = polygons_lonlat(rings, tile_px=16).collect()
    release_signature_caches()
    for r in ll:
        assert len(r.lons) == len(r.xs)
        assert all(-180.0 <= v <= 180.0 for v in r.lons)
        assert all(-86.0 <= v <= 86.0 for v in r.lats)
    with pytest.raises(ValueError, match="zoom"):
        polygonize(df, zoom=23)


def test_polygons_geojson_structure_and_winding(spark):
    import json

    from tilegrab_spark.operators.polygonize import polygons_geojson

    world = _world_basic()
    df = spark.createDataFrame(_tiles_from_world(world, 16, 1), SCHEMA)
    feats = polygons_geojson(polygonize(df, zoom=1), tile_px=16).collect()
    release_signature_caches()

    def shoelace(ring):
        s = 0.0
        for i in range(len(ring) - 1):
            s += ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
        return s / 2.0

    by_label = {}
    for f in feats:
        gj = json.loads(f.geojson)
        assert gj["type"] == "Feature"
        assert gj["geometry"]["type"] == "Polygon"
        assert gj["properties"]["label"] == f.label
        rings = gj["geometry"]["coordinates"]
        assert len(rings) == f.n_rings
        for i, ring in enumerate(rings):
            assert ring[0] == ring[-1]  # closed per RFC 7946
            # exterior counterclockwise (positive), holes clockwise
            assert (shoelace(ring) > 0) == (i == 0)
        by_label.setdefault(f.label, []).append(f)
    # the donut region is one feature with exterior + one hole
    donut = [f for f in by_label[3] if f.region_px == 24]
    assert len(donut) == 1 and donut[0].n_rings == 2


def test_polygons_to_mvt_roundtrip(spark):
    from tilegrab_spark.kernels.mvt import decode_mvt
    from tilegrab_spark.operators.vectortiles import polygons_to_mvt

    world = _world_basic()
    df = spark.createDataFrame(_tiles_from_world(world, 16, 1), SCHEMA)
    rings = polygonize(df, zoom=1)
    tiles = {(r.x, r.y): r for r in polygons_to_mvt(rings, tile_px=16).collect()}
    release_signature_caches()

    def area2(ring):
        n = len(ring)
        return sum(
            ring[i][0] * ring[(i + 1) % n][1] - ring[(i + 1) % n][0] * ring[i][1]
            for i in range(n)
        )

    # every tile of the 2x2 world emits a blob; decode them all
    assert set(tiles) == {(0, 0), (1, 0), (0, 1), (1, 1)}
    ext, tp = 4096, 16
    scale = ext // tp
    for (tx, ty), row in tiles.items():
        layers = decode_mvt(bytes(row.mvt))
        assert layers[0]["name"] == "regions"
        feats = layers[0]["features"]
        assert len(feats) == row.n_features
        # per tile: clipped areas (extent units) of all features sum to
        # the full tile square — polygonize partitions the plane
        total = sum(sum(area2(r) for r in f["geom"]) for f in feats) // 2
        assert total == (tp * scale) ** 2, (tx, ty)
        for f in feats:
            assert f["type"] == "polygon"
            assert area2(f["geom"][0]) > 0  # exterior first, positive
            assert set(f["tags"]) == {"label", "region_px"}

    # the label-7 rectangle spans all four tiles: each carries a piece
    for row in tiles.values():
        labels = {
            f["tags"]["label"]
            for f in decode_mvt(bytes(row.mvt))[0]["features"]
        }
        assert 7 in labels
    # the donut's hole ring survives as a negative-area interior ring
    t00 = decode_mvt(bytes(tiles[(0, 0)].mvt))[0]["features"]
    donut = next(f for f in t00 if f["tags"]["label"] == 3)
    assert len(donut["geom"]) == 2 and area2(donut["geom"][1]) < 0
