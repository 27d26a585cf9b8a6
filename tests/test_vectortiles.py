"""MVT sink: wire-format round-trip + contour-layer content checks."""

import numpy as np
import pytest

from tilegrab_spark.kernels.mvt import decode_mvt, encode_mvt
from tilegrab_spark.operators.contour import extract_contours, link_contours
from tilegrab_spark.operators.dedup import release_signature_caches
from tilegrab_spark.operators.vectortiles import contours_to_mvt
from tests.test_contour import TS, Z, _field_circle, _tiles_df


def test_kernel_roundtrip_all_types():
    layer = {"name": "l", "extent": 512, "features": [
        {"id": 7, "type": "line", "geom": [[(2, 2), (4, 12), (14, 22)]],
         "tags": {"lvl": 60.5, "closed": True, "n": 3, "name": "c"}},
        {"id": 8, "type": "polygon", "geom": [[(0, 0), (10, 0), (10, 10), (0, 10)]],
         "tags": {}},
        {"id": 9, "type": "point", "geom": [[(5, 5)], [(7, 7)]], "tags": {}},
    ]}
    out = decode_mvt(encode_mvt([layer]))
    assert out[0]["version"] == 2 and out[0]["extent"] == 512
    assert out[0]["features"][0]["geom"] == [[(2, 2), (4, 12), (14, 22)]]
    assert out[0]["features"][0]["tags"] == {"lvl": 60.5, "closed": True, "n": 3, "name": "c"}
    assert out[0]["features"][1]["geom"] == [[(0, 0), (10, 0), (10, 10), (0, 10)]]
    assert out[0]["features"][2]["geom"] == [[(5, 5)], [(7, 7)]]


def test_kernel_spec_command_golden():
    # MoveTo(+1,+1): command 9 then zigzag(1)=2 twice, per spec 2.1 §4.3
    data = encode_mvt([{"name": "g", "features": [
        {"id": 1, "type": "point", "geom": [[(1, 1)]], "tags": {}}]}])
    assert bytes([9, 2, 2]) in data


def test_contour_layer_tiles(spark):
    V = _field_circle(2 * TS)
    segs = extract_contours(_tiles_df(spark, V), levels=[60.5])
    try:
        labeled = link_contours(segs)
        seg_rows = labeled.collect()
        tiles = contours_to_mvt(labeled, tile_px=TS, extent=256).collect()
    finally:
        release_signature_caches()
    assert {(r.x, r.y) for r in tiles} == {(0, 0), (0, 1), (1, 0), (1, 1)}
    total_edges = 0
    for t in tiles:
        layers = decode_mvt(bytes(t.mvt))
        assert layers[0]["name"] == "contours" and layers[0]["extent"] == 256
        assert len(layers[0]["features"]) == t.n_features >= 1
        for f in layers[0]["features"]:
            assert f["type"] == "line"
            assert f["tags"]["level"] == 60.5 and f["tags"]["closed"] is True
            for part in f["geom"]:
                assert len(part) >= 2
                total_edges += len(part) - 1
                for (px, py) in part:
                    # tile-local coords stay in a sane window around the tile
                    assert -256 <= px <= 512 and -256 <= py <= 512
    # quantization at extent=256 on TS=8 tiles is 32 units/pixel: no two
    # distinct crossing points collapse, so edges == segments
    assert total_edges == len(seg_rows)


def test_piece_walk_reconnects_within_tile(spark):
    # open gradient cut: single tile column crossing -> each tile holds
    # ONE polyline piece (its own segments re-linked, not 8 features)
    V = np.tile((np.arange(2 * TS) * 8).astype(np.uint8), (2 * TS, 1))
    segs = extract_contours(_tiles_df(spark, V), levels=[59.5])
    try:
        tiles = contours_to_mvt(link_contours(segs), tile_px=TS, extent=4096).collect()
    finally:
        release_signature_caches()
    hit = {t.y: t for t in tiles if t.n_features > 0}
    assert set(hit) == {0, 1}  # the cut runs through one tile column, both rows
    # the top tile owns its boundary-band cell (halo) -> TS segments =
    # TS+1 vertices; the bottom tile's last row has no neighbor -> TS-1
    # segments = TS vertices; together the full 2*TS-1 cut
    for ty, n_verts in ((0, TS + 1), (1, TS)):
        t = hit[ty]
        assert t.n_features == 1
        f = decode_mvt(bytes(t.mvt))[0]["features"][0]
        assert len(f["geom"]) == 1 and len(f["geom"][0]) == n_verts


def test_extent_validation(spark):
    V = _field_circle(TS)
    segs = extract_contours(_tiles_df(spark, V), levels=[60.5])
    try:
        with pytest.raises(ValueError):
            contours_to_mvt(link_contours(segs), extent=8)
    finally:
        release_signature_caches()
