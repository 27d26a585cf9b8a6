"""Spatial autocorrelation (Moran/LISA/Gi*) vs an independent dense-matrix oracle."""

import math

import numpy as np
import pytest

from tilegrab_spark.operators.spatialstats import (
    getis_ord_gi,
    local_morans,
    morans_i,
    spatial_lag,
)

Z = 12


def _neighbors(cells, diagonal=False):
    s = set(cells)
    shifts = [(1, 0), (-1, 0), (0, 1), (0, -1)]
    if diagonal:
        shifts += [(1, 1), (1, -1), (-1, 1), (-1, -1)]
    return {
        c: [(c[0] + dx, c[1] + dy) for dx, dy in shifts if (c[0] + dx, c[1] + dy) in s]
        for c in cells
    }


def _oracle_global(cells, vals, diagonal=False):
    nb = _neighbors(cells, diagonal)
    n = len(cells)
    x = np.array([vals[c] for c in cells], dtype=float)
    xbar = x.mean()
    z = x - xbar
    m2 = float((z * z).sum())
    idx = {c: i for i, c in enumerate(cells)}
    cross = sum(z[idx[c]] * z[idx[d]] for c in cells for d in nb[c])  # ordered pairs
    sq = sum((x[idx[c]] - x[idx[d]]) ** 2 for c in cells for d in nb[c])  # ordered
    e_dir = sum(len(v) for v in nb.values())  # = 2 * undirected edges
    s0 = float(e_dir)
    s1 = 2.0 * e_dir  # binary symmetric: (w_ij + w_ji)^2 = 4 per undirected pair
    s2 = float(sum((2 * len(v)) ** 2 for v in nb.values()))
    if e_dir == 0 or m2 == 0 or n < 2:
        return dict(n=n, edges=e_dir // 2, s0=int(s0), s1=int(s1), s2=int(s2),
                    I=None, E=None, V=None, zscore=None, C=None)
    i_stat = (n / s0) * cross / m2
    e_i = -1.0 / (n - 1)
    v_i = (n * n * s1 - n * s2 + 3 * s0 * s0) / ((n * n - 1) * s0 * s0) - e_i * e_i
    gearys = (n - 1) * sq / (2.0 * s0 * m2)
    return dict(n=n, edges=e_dir // 2, s0=int(s0), s1=int(s1), s2=int(s2),
                I=i_stat, E=e_i, V=v_i, zscore=(i_stat - e_i) / math.sqrt(v_i),
                C=gearys)


def _oracle_lisa(cells, vals, diagonal=False):
    nb = _neighbors(cells, diagonal)
    x = np.array([vals[c] for c in cells], dtype=float)
    xbar, n = x.mean(), len(cells)
    m2n = float(((x - xbar) ** 2).sum()) / n
    out = {}
    for c in cells:
        zi = vals[c] - xbar
        zlag = sum(vals[d] - xbar for d in nb[c])
        if not nb[c] or m2n == 0:
            out[c] = (len(nb[c]), None, None)
            continue
        q = ("H" if zi >= 0 else "L") + ("H" if zlag >= 0 else "L")
        quad = {"HH": "HH", "LL": "LL", "HL": "HL", "LH": "LH"}[q]
        out[c] = (len(nb[c]), zi / m2n * zlag, quad)
    return out


def _oracle_gi(cells, vals, diagonal=False, star=True):
    nb = _neighbors(cells, diagonal)
    x = np.array([vals[c] for c in cells], dtype=float)
    n_all = len(cells)
    out = {}
    for c in cells:
        if star:
            n = n_all
            w = len(nb[c]) + 1
            s = sum(vals[d] for d in nb[c]) + vals[c]
            mean = x.mean()
            var = float((x * x).mean()) - mean * mean
        else:
            n = n_all - 1
            w = len(nb[c])
            s = sum(vals[d] for d in nb[c])
            rest = np.array([vals[d] for d in cells if d != c], dtype=float)
            mean = rest.mean()
            var = float((rest * rest).mean()) - mean * mean
        denom_inner = (n * w - w * w) / (n - 1) if n > 1 else 0.0
        if var <= 0 or denom_inner <= 0 or n <= 1:
            out[c] = None
            continue
        out[c] = (s - mean * w) / (math.sqrt(var) * math.sqrt(denom_inner))
    return out


def _df(spark, cells, vals):
    return spark.createDataFrame(
        [(Z, cx, cy, float(vals[(cx, cy)])) for cx, cy in cells],
        "z int, x long, y long, val double",
    )


def _irregular():
    rng = np.random.default_rng(7)
    cells = [(cx, cy) for cx in range(6) for cy in range(6) if (cx, cy) != (2, 3)]
    cells += [(10, 10)]  # isolated
    vals = {c: float(rng.normal(5.0, 2.0)) for c in cells}
    return cells, vals


@pytest.mark.parametrize("diagonal", [False, True])
def test_global_moran_vs_oracle(spark, diagonal):
    cells, vals = _irregular()
    got = morans_i(_df(spark, cells, vals), "val", diagonal=diagonal).collect()[0]
    want = _oracle_global(cells, vals, diagonal)
    assert got.n == want["n"] and got.n_edges == want["edges"]
    assert (got.s0, got.s1, got.s2) == (want["s0"], want["s1"], want["s2"])
    for a, b in [(got.morans_i, want["I"]), (got.expected_i, want["E"]),
                 (got.variance_i, want["V"]), (got.z_score, want["zscore"]),
                 (got.gearys_c, want["C"])]:
        assert a == pytest.approx(b, abs=1e-9)


def test_local_moran_vs_oracle(spark):
    cells, vals = _irregular()
    rows = {(r.x, r.y): r for r in local_morans(_df(spark, cells, vals), "val").collect()}
    want = _oracle_lisa(cells, vals)
    assert set(rows) == set(cells)
    for c, (w, li, quad) in want.items():
        r = rows[c]
        assert r.w == w
        if li is None:
            assert r.local_i is None and r.quadrant is None
        else:
            assert r.local_i == pytest.approx(li, abs=1e-9)
            assert r.quadrant == quad


@pytest.mark.parametrize("star", [True, False])
def test_gi_vs_oracle(spark, star):
    cells, vals = _irregular()
    rows = {(r.x, r.y): r.gi_z for r in
            getis_ord_gi(_df(spark, cells, vals), "val", star=star).collect()}
    want = _oracle_gi(cells, vals, star=star)
    for c, gz in want.items():
        if gz is None:
            assert rows[c] is None
        else:
            assert rows[c] == pytest.approx(gz, abs=1e-9)


def test_checkerboard_is_negative(spark):
    cells = [(cx, cy) for cx in range(8) for cy in range(8)]
    vals = {(cx, cy): float((cx + cy) % 2) for cx, cy in cells}
    got = morans_i(_df(spark, cells, vals), "val").collect()[0]
    assert got.morans_i < -0.9  # perfect rook alternation -> I == -1
    assert got.z_score < -5
    assert got.gearys_c > 1.5  # C > 1 = negative spatial association


def test_constant_surface_is_null(spark):
    cells = [(cx, cy) for cx in range(4) for cy in range(4)]
    vals = {c: 3.0 for c in cells}
    got = morans_i(_df(spark, cells, vals), "val").collect()[0]
    assert got.morans_i is None and got.z_score is None
    lisa = local_morans(_df(spark, cells, vals), "val").collect()
    assert all(r.local_i is None for r in lisa)


def test_isolated_cell_and_lag(spark):
    cells, vals = _irregular()
    rows = {(r.x, r.y): r for r in spatial_lag(_df(spark, cells, vals), "val").collect()}
    assert rows[(10, 10)].w == 0 and rows[(10, 10)].lag == 0.0
    nb = _neighbors(cells)
    for c in [(0, 0), (3, 3), (5, 5)]:
        assert rows[c].w == len(nb[c])
        assert rows[c].lag == pytest.approx(sum(vals[d] for d in nb[c]), abs=1e-9)


def test_hot_cluster_center_is_hottest(spark):
    cells = [(cx, cy) for cx in range(9) for cy in range(9)]
    vals = {c: 1.0 for c in cells}
    for cx in (3, 4, 5):
        for cy in (3, 4, 5):
            vals[(cx, cy)] = 10.0
    rows = {(r.x, r.y): r for r in getis_ord_gi(_df(spark, cells, vals), "val").collect()}
    hottest = max(rows, key=lambda c: rows[c].gi_z)
    assert hottest == (4, 4)
    assert rows[(4, 4)].spot.startswith("hot")
    assert rows[(0, 0)].gi_z < 0
