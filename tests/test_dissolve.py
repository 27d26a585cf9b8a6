"""Tile dissolve (adjacency CC + region aggregates) vs a union-find oracle."""

import numpy as np
import pytest

from tilegrab_spark.operators.dissolve import adjacency_edges, dissolve_tiles


def _uf_oracle(cells, diagonal=False):
    """Independent union-find dissolve over (z, x, y) tuples."""
    parent = {c: c for c in cells}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    shifts = [(1, 0), (0, 1)] + ([(1, 1), (1, -1)] if diagonal else [])
    internal = 0
    for (z, x, y) in cells:
        for dx, dy in shifts:
            if (z, x + dx, y + dy) in cells:
                union((z, x, y), (z, x + dx, y + dy))
                internal += 1
    regions = {}
    for c in cells:
        regions.setdefault(find(c), []).append(c)
    out = {}
    for members in regions.values():
        key = min((z << 58) | (x << 29) | y for z, x, y in members)
        n = len(members)
        per = 4 * n - 2 * sum(
            1
            for (z, x, y) in members
            if True
            for dx, dy in [(1, 0), (0, 1)]
            if (z, x + dx, y + dy) in set(members)
        )
        out[key] = (
            n,
            min(x for _, x, _ in members),
            min(y for *_, y in members),
            max(x for _, x, _ in members),
            max(y for *_, y in members),
            per,
        )
    return out


def _run(spark, cells, diagonal=False):
    df = spark.createDataFrame(list(cells), "z int, x long, y long")
    return {
        r.region_id: (r.n_tiles, r.minx, r.miny, r.maxx, r.maxy, r.perimeter)
        for r in dissolve_tiles(df, diagonal=diagonal).collect()
    }


def test_dissolve_plus_shape_and_singleton(spark):
    plus = {(16, 10, 10), (16, 9, 10), (16, 11, 10), (16, 10, 9), (16, 10, 11)}
    lone = {(16, 50, 50)}
    got = _run(spark, plus | lone)
    want = _uf_oracle(plus | lone)
    assert got == want
    assert len(got) == 2
    # plus shape: 5 tiles, 4 internal edges -> perimeter 12
    plus_key = min((16 << 58) | (x << 29) | y for _, x, y in plus)
    assert got[plus_key][0] == 5 and got[plus_key][5] == 12
    lone_key = (16 << 58) | (50 << 29) | 50
    assert got[lone_key] == (1, 50, 50, 50, 50, 4)


def test_dissolve_matches_union_find_random(spark):
    rng = np.random.default_rng(11)
    cells = {
        (12, int(x), int(y))
        for x, y in rng.integers(0, 30, size=(260, 2))
    }
    for diagonal in (False, True):
        got = _run(spark, cells, diagonal)
        want = _uf_oracle(cells, diagonal)
        assert got == want


def test_dissolve_zoom_does_not_bleed(spark):
    """Identical (x, y) at two zoom levels must stay separate regions."""
    cells = {(10, 5, 5), (10, 6, 5), (11, 5, 5), (11, 6, 5)}
    got = _run(spark, cells)
    assert len(got) == 2
    assert all(v[0] == 2 and v[5] == 6 for v in got.values())


def test_diagonal_mode_connects_corners(spark):
    cells = {(16, 0, 0), (16, 1, 1)}
    assert len(_run(spark, cells, diagonal=False)) == 2
    assert len(_run(spark, cells, diagonal=True)) == 1


def test_adjacency_edges_canonical_and_complete(spark):
    cells = [(16, 0, 0), (16, 1, 0), (16, 0, 1), (16, 1, 1)]
    df = spark.createDataFrame(cells, "z int, x long, y long")
    edges = {(r.cell_a, r.cell_b) for r in adjacency_edges(df).collect()}
    pack = lambda x, y: (16 << 58) | (x << 29) | y
    want = {
        tuple(sorted(p))
        for p in [
            (pack(0, 0), pack(1, 0)),
            (pack(0, 0), pack(0, 1)),
            (pack(1, 0), pack(1, 1)),
            (pack(0, 1), pack(1, 1)),
        ]
    }
    assert edges == want
    assert all(a < b for a, b in edges)


def test_dissolve_partition_invariant(spark):
    rng = np.random.default_rng(5)
    cells = list({(14, int(x), int(y)) for x, y in rng.integers(0, 20, size=(150, 2))})
    a = spark.createDataFrame(cells, "z int, x long, y long").repartition(13)
    b = spark.createDataFrame(list(reversed(cells)), "z int, x long, y long").coalesce(1)
    ra = {r.region_id: r.n_tiles for r in dissolve_tiles(a).collect()}
    rb = {r.region_id: r.n_tiles for r in dissolve_tiles(b).collect()}
    assert ra == rb
