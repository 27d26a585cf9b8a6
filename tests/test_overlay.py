"""Vector-overlay suite: clip kernels, polygon↔polygon spatial join,
exact tile∩polygon areas, areal interpolation.

Oracle policy: every result is checked against an INDEPENDENT scalar
implementation written here (plain-loop Sutherland–Hodgman, shoelace,
even-odd PIP, CCW segment tests) — none of it imports the engine
kernels it verifies.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from tilegrab_spark.kernels.clip import (
    clip_ring_to_box,
    polygon_area,
    polygon_box_area,
    ring_signed_area,
    segments_intersect_any,
    _ring_segments,
)
from tilegrab_spark.kernels.geo import WEB_MERCATOR_EXTENT, WGS84_RADIUS, tile_bounds

# ---------------------------------------------------------------- oracle


def sh_clip_scalar(poly, bx0, by0, bx1, by1):
    """Independent plain-loop Sutherland–Hodgman against a box."""
    def clip_edge(pts, inside, intersect):
        out = []
        n = len(pts)
        for i in range(n):
            cur, nxt = pts[i], pts[(i + 1) % n]
            ic, inx = inside(cur), inside(nxt)
            if ic:
                out.append(cur)
            if ic != inx:
                out.append(intersect(cur, nxt))
        return out

    pts = [tuple(p) for p in poly]
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]

    def ix(c, n, x):  # intersection with vertical line
        t = (x - c[0]) / (n[0] - c[0])
        return (x, c[1] + t * (n[1] - c[1]))

    def iy(c, n, y):
        t = (y - c[1]) / (n[1] - c[1])
        return (c[0] + t * (n[0] - c[0]), y)

    for inside, inter in (
        (lambda p: p[0] >= bx0, lambda c, n: ix(c, n, bx0)),
        (lambda p: p[0] <= bx1, lambda c, n: ix(c, n, bx1)),
        (lambda p: p[1] >= by0, lambda c, n: iy(c, n, by0)),
        (lambda p: p[1] <= by1, lambda c, n: iy(c, n, by1)),
    ):
        if not pts:
            return []
        pts = clip_edge(pts, inside, inter)
    return pts


def shoelace_scalar(pts):
    if len(pts) >= 2 and tuple(pts[0]) == tuple(pts[-1]):
        pts = pts[:-1]
    if len(pts) < 3:
        return 0.0
    s = 0.0
    for i in range(len(pts)):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % len(pts)]
        s += x0 * y1 - x1 * y0
    return 0.5 * s


def pip_scalar(px, py, rings):
    """Even-odd over all rings (holes included)."""
    inside = False
    for ring in rings:
        pts = [tuple(p) for p in ring]
        if pts[0] == pts[-1]:
            pts = pts[:-1]
        n = len(pts)
        for i in range(n):
            x1, y1 = pts[i]
            x2, y2 = pts[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
                if px < xint:
                    inside = not inside
    return inside


def seg_int_scalar(a, b, c, d, proper=False):
    def cross(o, u, v):
        return (u[0] - o[0]) * (v[1] - o[1]) - (u[1] - o[1]) * (v[0] - o[0])

    d1, d2 = cross(a, b, c), cross(a, b, d)
    d3, d4 = cross(c, d, a), cross(c, d, b)
    if proper:
        return (d1 * d2 < 0) and (d3 * d4 < 0)
    if d1 == d2 == d3 == d4 == 0:
        return (
            min(a[0], b[0]) <= max(c[0], d[0])
            and min(c[0], d[0]) <= max(a[0], b[0])
            and min(a[1], b[1]) <= max(c[1], d[1])
            and min(c[1], d[1]) <= max(a[1], b[1])
        )
    return (
        min(d1, d2) <= 0 <= max(d1, d2) and min(d3, d4) <= 0 <= max(d3, d4)
    )


def polys_intersect_scalar(a_rings, b_rings):
    for r in a_rings:
        for p in r:
            if pip_scalar(p[0], p[1], b_rings):
                return True
    for r in b_rings:
        for p in r:
            if pip_scalar(p[0], p[1], a_rings):
                return True
    def segs(rings):
        out = []
        for ring in rings:
            pts = [tuple(p) for p in ring]
            if pts[0] == pts[-1]:
                pts = pts[:-1]
            for i in range(len(pts)):
                out.append((pts[i], pts[(i + 1) % len(pts)]))
        return out
    for (a, b) in segs(a_rings):
        for (c, d) in segs(b_rings):
            if seg_int_scalar(a, b, c, d):
                return True
    return False


def poly_contains_scalar(a_rings, b_rings):
    for r in b_rings:
        for p in r:
            if not pip_scalar(p[0], p[1], a_rings):
                return False
    for r in a_rings:
        for p in r:
            if pip_scalar(p[0], p[1], b_rings):
                return False
    def segs(rings):
        out = []
        for ring in rings:
            pts = [tuple(p) for p in ring]
            if pts[0] == pts[-1]:
                pts = pts[:-1]
            for i in range(len(pts)):
                out.append((pts[i], pts[(i + 1) % len(pts)]))
        return out
    for (a, b) in segs(a_rings):
        for (c, d) in segs(b_rings):
            if seg_int_scalar(a, b, c, d):
                return False
    return True


def square(cx, cy, half):
    return [
        [cx - half, cy - half],
        [cx + half, cy - half],
        [cx + half, cy + half],
        [cx - half, cy + half],
        [cx - half, cy - half],
    ]


# ------------------------------------------------------------ kernel tests


class TestClipKernels:
    def test_square_area_and_sign(self):
        s = np.array(square(0, 0, 1.0))
        assert ring_signed_area(s) == pytest.approx(4.0)
        assert ring_signed_area(s[::-1]) == pytest.approx(-4.0)

    def test_clip_analytic_overlap(self):
        s = np.array(square(0, 0, 1.0))
        clipped = clip_ring_to_box(s, 0.0, 0.0, 2.0, 2.0)
        assert abs(ring_signed_area(clipped)) == pytest.approx(1.0)

    def test_clip_inside_outside(self):
        s = np.array(square(0, 0, 1.0))
        inside = clip_ring_to_box(s, -5, -5, 5, 5)
        assert abs(ring_signed_area(inside)) == pytest.approx(4.0)
        assert clip_ring_to_box(s, 10, 10, 20, 20).shape[0] == 0

    def test_box_inside_ring_clips_to_box(self):
        s = np.array(square(0, 0, 10.0))
        clipped = clip_ring_to_box(s, -1, -1, 1, 1)
        assert abs(ring_signed_area(clipped)) == pytest.approx(4.0)

    def test_polygon_box_area_with_hole(self):
        outer = np.array(square(0, 0, 2.0))
        hole = np.array(square(0, 0, 1.0))
        # box covers right half: outer∩box = 2x4=8, hole∩box = 1x2=2
        a = polygon_box_area([outer, hole], 0, -5, 5, 5)
        assert a == pytest.approx(6.0)
        assert polygon_area([outer, hole]) == pytest.approx(12.0)

    def test_clip_random_vs_scalar_oracle(self):
        rng = np.random.default_rng(7)
        for _ in range(200):
            n = rng.integers(3, 9)
            ang = np.sort(rng.uniform(0, 2 * math.pi, n))
            rad = rng.uniform(0.3, 2.0, n)
            poly = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)
            bx0, by0 = rng.uniform(-2, 0.5, 2)
            bx1 = bx0 + rng.uniform(0.2, 3.0)
            by1 = by0 + rng.uniform(0.2, 3.0)
            got = abs(ring_signed_area(clip_ring_to_box(poly, bx0, by0, bx1, by1)))
            want = abs(shoelace_scalar(sh_clip_scalar(poly.tolist(), bx0, by0, bx1, by1)))
            assert got == pytest.approx(want, abs=1e-12)

    def test_segments_intersect_cases(self):
        cross_a = _ring_segments(np.array([[0, 0], [2, 2], [0, 0]], dtype=float))[:1]
        cross_b = _ring_segments(np.array([[0, 2], [2, 0], [0, 2]], dtype=float))[:1]
        assert segments_intersect_any(cross_a, cross_b)
        assert segments_intersect_any(cross_a, cross_b, proper=True)
        # endpoint touch: closed yes, proper no
        t_b = np.array([[2.0, 2.0, 3.0, 0.0]])
        assert segments_intersect_any(cross_a, t_b)
        assert not segments_intersect_any(cross_a, t_b, proper=True)
        # collinear overlap: closed yes, proper no
        col = np.array([[1.0, 1.0, 3.0, 3.0]])
        assert segments_intersect_any(cross_a, col)
        assert not segments_intersect_any(cross_a, col, proper=True)
        # disjoint
        far = np.array([[10.0, 10.0, 11.0, 11.0]])
        assert not segments_intersect_any(cross_a, far)

    def test_segments_random_vs_scalar(self):
        rng = np.random.default_rng(11)
        for _ in range(300):
            pts = rng.uniform(-1, 1, 8)
            a = pts[:4][None, :]
            b = pts[4:][None, :]
            want = seg_int_scalar(
                (pts[0], pts[1]), (pts[2], pts[3]), (pts[4], pts[5]), (pts[6], pts[7])
            )
            assert segments_intersect_any(a, b) == want


# ------------------------------------------------------------ spark tests


def _mk_polys(spark, items):
    return spark.createDataFrame(
        [(gid, rings) for gid, rings in items],
        "geom_id string, rings array<array<array<double>>>",
    )


@pytest.fixture(scope="module")
def scene(spark):
    """Two small polygon layers around (10E, 45N) with every predicate
    case: overlap, touch, containment, donut-hole, disjoint."""
    left = [
        ("L_big", [square(10.0, 45.0, 0.02)]),                       # contains L_small-sized rights
        ("L_donut", [square(10.2, 45.0, 0.02), square(10.2, 45.0, 0.008)]),
        ("L_far", [square(11.0, 44.0, 0.01)]),
        ("L_sliver", [square(10.05, 45.05, 0.001)]),
    ]
    right = [
        ("R_inner", [square(10.0, 45.0, 0.005)]),                    # inside L_big
        ("R_cross", [square(10.02, 45.0, 0.005)]),                   # straddles L_big's edge
        ("R_in_hole", [square(10.2, 45.0, 0.004)]),                  # inside L_donut's hole
        ("R_on_ring", [square(10.215, 45.0, 0.004)]),                # straddles donut annulus
        ("R_huge", [square(10.0, 45.0, 0.1)]),                       # contains L_big
        ("R_nowhere", [square(9.0, 44.0, 0.01)]),
    ]
    return left, right


def _oracle_pairs(left, right, predicate):
    out = set()
    for gid_l, lr in left:
        for gid_r, rr in right:
            if predicate == "intersects":
                ok = polys_intersect_scalar(lr, rr)
            elif predicate == "contains":
                ok = poly_contains_scalar(lr, rr)
            else:
                ok = poly_contains_scalar(rr, lr)
            if ok:
                out.add((gid_l, gid_r))
    return out


class TestSpatialJoin:
    @pytest.mark.parametrize("predicate", ["intersects", "contains", "within"])
    def test_matches_scalar_oracle(self, spark, scene, predicate):
        from tilegrab_spark.operators.overlay import spatial_join_polygons

        left, right = scene
        got = spatial_join_polygons(
            _mk_polys(spark, left),
            _mk_polys(spark, right),
            zoom=12,
            predicate=predicate,
            left_id="geom_id",
            right_id="geom_id",
        ).collect()
        got_pairs = {(r["geom_id_l"], r["geom_id_r"]) for r in got}
        assert got_pairs == _oracle_pairs(left, right, predicate)
        # exactly-once: no duplicate pair rows even with multi-cell covers
        assert len(got) == len(got_pairs)

    def test_partition_and_zoom_invariance(self, spark, scene):
        from tilegrab_spark.operators.overlay import spatial_join_polygons

        left, right = scene
        ref = None
        for zoom, nparts in ((10, 1), (13, 7)):
            got = {
                (r["geom_id_l"], r["geom_id_r"])
                for r in spatial_join_polygons(
                    _mk_polys(spark, left).repartition(nparts),
                    _mk_polys(spark, right).repartition(nparts),
                    zoom=zoom,
                ).collect()
            }
            if ref is None:
                ref = got
            assert got == ref

    def test_cover_guard_raises(self, spark):
        from tilegrab_spark.operators.overlay import spatial_join_polygons

        big = _mk_polys(spark, [("W", [square(0.0, 0.0, 40.0)])])
        small = _mk_polys(spark, [("S", [square(0.0, 0.0, 0.1)])])
        with pytest.raises(Exception, match="max_cover_cells"):
            spatial_join_polygons(big, small, zoom=12, max_cover_cells=64).collect()


def _merc(pts):
    out = []
    for x, y in pts:
        out.append(
            (
                WGS84_RADIUS * math.radians(x),
                WGS84_RADIUS * math.log(math.tan(math.pi / 4 + math.radians(y) / 2)),
            )
        )
    return out


class TestTileAreas:
    def test_exact_tile_polygon_is_full_tile(self, spark):
        from tilegrab_spark.operators.overlay import tile_polygon_areas

        z, x, y = 10, 536, 371  # near (8.4E, 47N)
        mnx, mny, mxx, mxy = (float(v) for v in tile_bounds(x, y, z))
        ring = [[mnx, mny], [mxx, mny], [mxx, mxy], [mnx, mxy], [mnx, mny]]
        rows = tile_polygon_areas(
            _mk_polys(spark, [("T", [ring])]), zoom=z
        ).collect()
        ts = 2.0 * WEB_MERCATOR_EXTENT / (1 << z)
        by_tile = {(r["x"], r["y"]): r["area_m2"] for r in rows}
        # the tile itself carries the full area; float boundary rows, if
        # any, are vanishing
        assert by_tile[(x, y)] == pytest.approx(ts * ts, rel=1e-9)
        assert sum(by_tile.values()) == pytest.approx(ts * ts, rel=1e-9)

    def test_areas_match_scalar_oracle_and_conserve(self, spark):
        from tilegrab_spark.operators.overlay import tile_polygon_areas

        ring = [
            [8.40, 47.00],
            [8.46, 47.01],
            [8.47, 47.05],
            [8.42, 47.06],
            [8.39, 47.03],
            [8.40, 47.00],
        ]
        hole = square(8.43, 47.03, 0.005)
        z = 13
        rows = tile_polygon_areas(
            _mk_polys(spark, [("P", [ring, hole])]), zoom=z
        ).collect()
        ts = 2.0 * WEB_MERCATOR_EXTENT / (1 << z)
        ext = WEB_MERCATOR_EXTENT
        merc_outer = _merc([(p[0], p[1]) for p in ring])
        merc_hole = _merc([(p[0], p[1]) for p in hole])
        total = 0.0
        for r in rows:
            bx0 = -ext + r["x"] * ts
            by1 = ext - r["y"] * ts
            want = abs(
                shoelace_scalar(sh_clip_scalar(merc_outer, bx0, by1 - ts, bx0 + ts, by1))
            ) - abs(
                shoelace_scalar(sh_clip_scalar(merc_hole, bx0, by1 - ts, bx0 + ts, by1))
            )
            # engine and oracle interpolate crossing points with
            # different (algebraically equal) float formulas
            assert r["area_m2"] == pytest.approx(want, rel=1e-8)
            total += r["area_m2"]
        full = abs(shoelace_scalar(merc_outer)) - abs(shoelace_scalar(merc_hole))
        assert total == pytest.approx(full, rel=1e-9)


class TestArealInterpolate:
    def test_extensive_mass_conservation(self, spark):
        from tilegrab_spark.operators.overlay import areal_interpolate

        zones = spark.createDataFrame(
            [
                ("A", [square(10.0, 45.0, 0.03)], 1000.0),
                ("B", [square(10.05, 45.02, 0.02)], 300.0),
            ],
            "geom_id string, rings array<array<array<double>>>, pop double",
        )
        tiles = areal_interpolate(zones, zoom=13, value_cols=["pop"]).collect()
        assert sum(r["pop"] for r in tiles) == pytest.approx(1300.0, rel=1e-9)
        assert all(r["pop"] > 0 for r in tiles)

    def test_intensive_constant_rate(self, spark):
        from tilegrab_spark.operators.overlay import areal_interpolate

        zones = spark.createDataFrame(
            [
                ("A", [square(10.0, 45.0, 0.03)], 7.5),
                ("B", [square(10.002, 45.001, 0.02)], 7.5),
            ],
            "geom_id string, rings array<array<array<double>>>, rate double",
        )
        tiles = areal_interpolate(
            zones, zoom=13, value_cols=["rate"], intensive=True
        ).collect()
        assert tiles
        for r in tiles:
            assert r["rate"] == pytest.approx(7.5, rel=1e-12)

    def test_validation(self, spark):
        from tilegrab_spark.operators.overlay import areal_interpolate

        zones = _mk_polys(spark, [("A", [square(0, 0, 0.01)])])
        with pytest.raises(ValueError, match="value_cols"):
            areal_interpolate(zones, zoom=10, value_cols=[])
