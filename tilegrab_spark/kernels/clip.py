"""Polygon clipping / area / segment-intersection kernels (pure numpy).

These back the vector-overlay operators (operators/overlay.py): exact
polygon∩box areas via Sutherland–Hodgman clipping (exact for a CONVEX
clip region — an axis-aligned tile box is the convex case, so no
general-polygon clipper is needed), shoelace areas, and vectorized
segment-segment intersection tests for the polygon↔polygon join refine.

Same policy as kernels/geo.py: float64 throughout, no geometry
libraries (none exist in the runtime), every routine oracle-tested
against an independent scalar implementation (tests/test_overlay.py).

The reference (a tile downloader) has no vector-overlay analogue; these
kernels extend the engine the same way zonal/focal/contour do.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "clip_ring_to_box",
    "ring_signed_area",
    "polygon_box_area",
    "polygon_area",
    "segments_intersect_any",
]


def _clip_halfplane(pts: np.ndarray, sig: np.ndarray) -> np.ndarray:
    """One Sutherland–Hodgman pass: keep the region where ``sig >= 0``.

    ``pts``: (N,2) open ring (last->first edge implied). ``sig``: signed
    distance-like values, >=0 inside, with the property that the clip
    boundary is the zero set of a LINEAR function (so the crossing point
    interpolates exactly). Returns the clipped open ring (M,2), possibly
    empty.
    """
    n = pts.shape[0]
    if n == 0:
        return pts
    inside = sig >= 0.0
    if inside.all():
        return pts
    if not inside.any():
        return pts[:0]
    nxt = np.roll(np.arange(n), -1)
    in_cur = inside
    in_nxt = inside[nxt]
    cross = in_cur != in_nxt
    # interpolation parameter t on crossing edges: sig_cur / (sig_cur - sig_nxt)
    # (denominator nonzero exactly where cross is True)
    sc = sig
    sn = sig[nxt]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(cross, sc / np.where(cross, sc - sn, 1.0), 0.0)
    inter = pts + t[:, None] * (pts[nxt] - pts)
    # per edge i emit: pts[i] if in_cur[i]  (order key 2*i),
    #                  inter[i] if cross[i] (order key 2*i+1)
    keys = np.concatenate(
        [2 * np.nonzero(in_cur)[0], 2 * np.nonzero(cross)[0] + 1]
    )
    out = np.concatenate([pts[in_cur], inter[cross]], axis=0)
    order = np.argsort(keys, kind="stable")
    return out[order]


def clip_ring_to_box(
    ring: np.ndarray, bx0: float, by0: float, bx1: float, by1: float
) -> np.ndarray:
    """Clip one ring (open or closed (N,2) float64) to the axis-aligned
    box ``[bx0,bx1] x [by0,by1]`` — Sutherland–Hodgman, exact for the
    convex box. Returns an OPEN ring (M,2); M==0 when the ring misses
    the box entirely."""
    pts = np.asarray(ring, dtype=np.float64)
    if pts.shape[0] >= 2 and pts[0, 0] == pts[-1, 0] and pts[0, 1] == pts[-1, 1]:
        pts = pts[:-1]  # open it: SH treats the ring cyclically
    if pts.shape[0] < 3:
        return pts[:0]
    pts = _clip_halfplane(pts, pts[:, 0] - bx0)   # x >= bx0
    pts = _clip_halfplane(pts, bx1 - pts[:, 0])   # x <= bx1
    pts = _clip_halfplane(pts, pts[:, 1] - by0)   # y >= by0
    pts = _clip_halfplane(pts, by1 - pts[:, 1])   # y <= by1
    return pts


def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area of an (open or closed) ring; CCW positive."""
    pts = np.asarray(ring, dtype=np.float64)
    if pts.shape[0] >= 2 and pts[0, 0] == pts[-1, 0] and pts[0, 1] == pts[-1, 1]:
        pts = pts[:-1]
    if pts.shape[0] < 3:
        return 0.0
    x = pts[:, 0]
    y = pts[:, 1]
    xn = np.roll(x, -1)
    yn = np.roll(y, -1)
    return float(0.5 * np.sum(x * yn - xn * y))


def polygon_area(rings: list) -> float:
    """Area of a polygon given as [outer, hole, hole, ...] rings:
    |outer| minus the |hole|s (holes assumed inside the outer and
    disjoint — the GeoJSON polygon contract)."""
    if not rings:
        return 0.0
    a = abs(ring_signed_area(rings[0]))
    for h in rings[1:]:
        a -= abs(ring_signed_area(h))
    return a


def polygon_box_area(
    rings: list, bx0: float, by0: float, bx1: float, by1: float
) -> float:
    """Exact area of polygon ∩ box. Clips each ring independently
    (outer adds, holes subtract — valid because a hole lies inside its
    outer, so hole∩box ⊆ outer∩box)."""
    if not rings:
        return 0.0
    a = abs(ring_signed_area(clip_ring_to_box(rings[0], bx0, by0, bx1, by1)))
    if a == 0.0:
        return 0.0
    for h in rings[1:]:
        a -= abs(ring_signed_area(clip_ring_to_box(h, bx0, by0, bx1, by1)))
    return max(a, 0.0)


def _ring_segments(ring: np.ndarray) -> np.ndarray:
    """(N,4) [x0,y0,x1,y1] edges of a ring (closing edge included)."""
    pts = np.asarray(ring, dtype=np.float64)
    if pts.shape[0] >= 2 and (pts[0] == pts[-1]).all():
        pts = pts[:-1]
    if pts.shape[0] < 2:
        return np.empty((0, 4), dtype=np.float64)
    nxt = np.roll(pts, -1, axis=0)
    return np.concatenate([pts, nxt], axis=1)


def segments_intersect_any(
    segs_a: np.ndarray, segs_b: np.ndarray, *, proper: bool = False,
    block: int = 512,
) -> bool:
    """True when any segment of A intersects any segment of B.

    Closed-set semantics by default (shared endpoints / touching /
    collinear overlap all count); ``proper=True`` counts only strict
    interior crossings (each segment's endpoints strictly on opposite
    sides of the other's line) — the test a containment predicate needs
    to allow boundary contact.

    Vectorized orientation tests over (block x block) chunks so the
    pairwise table never exceeds ~block^2 floats regardless of ring
    sizes.
    """
    A = np.asarray(segs_a, dtype=np.float64)
    B = np.asarray(segs_b, dtype=np.float64)
    if A.shape[0] == 0 or B.shape[0] == 0:
        return False
    for i0 in range(0, A.shape[0], block):
        a = A[i0 : i0 + block]
        p = a[:, None, 0:2]  # (na,1,2)
        q = a[:, None, 2:4]
        for j0 in range(0, B.shape[0], block):
            b = B[j0 : j0 + block]
            r = b[None, :, 0:2]  # (1,nb,2)
            s = b[None, :, 2:4]

            def cross(o, u, v):
                return (u[..., 0] - o[..., 0]) * (v[..., 1] - o[..., 1]) - (
                    u[..., 1] - o[..., 1]
                ) * (v[..., 0] - o[..., 0])

            d1 = cross(p, q, r)   # r relative to segment pq
            d2 = cross(p, q, s)
            d3 = cross(r, s, p)   # p relative to segment rs
            d4 = cross(r, s, q)
            if proper:
                hit = (
                    (np.sign(d1) * np.sign(d2) < 0)
                    & (np.sign(d3) * np.sign(d4) < 0)
                )
                if hit.any():
                    return True
                continue
            straddle = (
                (np.minimum(d1, d2) <= 0)
                & (np.maximum(d1, d2) >= 0)
                & (np.minimum(d3, d4) <= 0)
                & (np.maximum(d3, d4) >= 0)
            )
            if not straddle.any():
                continue
            # straddle is exact for non-collinear configurations; the
            # all-four-zero (collinear) case needs a bbox overlap check
            collinear = (d1 == 0) & (d2 == 0) & (d3 == 0) & (d4 == 0)
            non_col = straddle & ~collinear
            if non_col.any():
                return True
            if collinear.any():
                ax0 = np.minimum(p[..., 0], q[..., 0])
                ax1 = np.maximum(p[..., 0], q[..., 0])
                ay0 = np.minimum(p[..., 1], q[..., 1])
                ay1 = np.maximum(p[..., 1], q[..., 1])
                bx0 = np.minimum(r[..., 0], s[..., 0])
                bx1 = np.maximum(r[..., 0], s[..., 0])
                by0 = np.minimum(r[..., 1], s[..., 1])
                by1 = np.maximum(r[..., 1], s[..., 1])
                overlap = (
                    collinear
                    & (ax0 <= bx1) & (bx0 <= ax1)
                    & (ay0 <= by1) & (by0 <= ay1)
                )
                if overlap.any():
                    return True
    return False
