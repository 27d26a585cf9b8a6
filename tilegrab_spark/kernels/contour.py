"""Marching squares — iso-contour segment extraction, pure numpy.

The kernel behind ``operators/contour.py``: given a scalar field
sampled at pixel corners, emit the line segments of the ``level``
iso-contour cell by cell (the classic marching-squares table, with the
saddle cases 5/10 disambiguated by the cell-center average — the
standard deterministic rule).

Coordinate convention: field value ``V[r, c]`` sits at grid point
``(x = origin_x + c, y = origin_y + r)``; a cell is the unit square
between four adjacent grid points, and crossing positions are linear
interpolations along its edges. Every edge crossing is computed from
the SAME ordered pixel pair no matter which of the two touching cells
(or tiles) emits it — ``t = (level - v0) / (v1 - v0)`` with ``v0`` the
lower-index pixel — so segments produced independently for adjacent
cells/tiles meet in bit-identical endpoints. That float determinism is
what lets the distributed operator link segments across tile borders
by exact endpoint equality, no tolerance snapping.

Cells with any NaN corner are skipped (the operator uses NaN padding
where a tile has no neighbor). Inside = ``value >= level``; a corner
exactly at ``level`` counts inside, and crossings on edges whose both
ends are inside/outside never occur, so the interpolation denominator
is never zero.
"""

from __future__ import annotations

import numpy as np

__all__ = ["marching_squares"]

# case index bit layout: TL=1, TR=2, BR=4, BL=8.
# each entry: tuple of (edge_a, edge_b) segments, edges T/R/B/L.
_CASES = {
    0: (),
    1: (("T", "L"),),
    2: (("T", "R"),),
    3: (("L", "R"),),
    4: (("R", "B"),),
    6: (("T", "B"),),
    7: (("L", "B"),),
    8: (("B", "L"),),
    9: (("T", "B"),),
    11: (("R", "B"),),
    12: (("L", "R"),),
    13: (("T", "R"),),
    14: (("T", "L"),),
    15: (),
}
_SADDLE_INSIDE = {5: (("T", "R"), ("B", "L")), 10: (("T", "L"), ("R", "B"))}
_SADDLE_OUTSIDE = {5: (("T", "L"), ("R", "B")), 10: (("T", "R"), ("B", "L"))}


def _edge_points(edge: str, r, c, tl, tr, br, bl, level, oy, ox):
    """(x, y) arrays of the crossing on ``edge`` for cells (r, c)."""
    if edge == "T":
        t = (level - tl) / (tr - tl)
        return ox + c + t, oy + r + 0.0 * t
    if edge == "B":
        t = (level - bl) / (br - bl)
        return ox + c + t, oy + r + 1.0 + 0.0 * t
    if edge == "L":
        t = (level - tl) / (bl - tl)
        return ox + c + 0.0 * t, oy + r + t
    t = (level - tr) / (br - tr)  # R
    return ox + c + 1.0 + 0.0 * t, oy + r + t


def marching_squares(
    V: np.ndarray, level: float, *, origin=(0.0, 0.0)
) -> np.ndarray:
    """Extract iso-contour segments from field ``V`` at ``level``.

    Returns an ``(n, 4)`` float64 array of ``[x1, y1, x2, y2]`` rows in
    grid coordinates offset by ``origin=(origin_y, origin_x)``. NaN
    corners suppress their cells.
    """
    V = np.asarray(V, dtype=np.float64)
    if V.ndim != 2 or V.shape[0] < 2 or V.shape[1] < 2:
        return np.empty((0, 4), dtype=np.float64)
    oy, ox = float(origin[0]), float(origin[1])
    tl, tr = V[:-1, :-1], V[:-1, 1:]
    bl, br = V[1:, :-1], V[1:, 1:]
    valid = ~(np.isnan(tl) | np.isnan(tr) | np.isnan(bl) | np.isnan(br))
    lvl = float(level)
    case = (
        (tl >= lvl).astype(np.int8)
        + 2 * (tr >= lvl).astype(np.int8)
        + 4 * (br >= lvl).astype(np.int8)
        + 8 * (bl >= lvl).astype(np.int8)
    )
    case = np.where(valid, case, -1)
    out = []

    def emit(mask, segs):
        if not mask.any() or not segs:
            return
        r, c = np.nonzero(mask)
        a, b, d, e = tl[mask], tr[mask], br[mask], bl[mask]
        for ea, eb in segs:
            x1, y1 = _edge_points(ea, r, c, a, b, d, e, lvl, oy, ox)
            x2, y2 = _edge_points(eb, r, c, a, b, d, e, lvl, oy, ox)
            out.append(np.stack([x1, y1, x2, y2], axis=1))

    for idx, segs in _CASES.items():
        if segs:
            emit(case == idx, segs)
    for idx in (5, 10):
        m = case == idx
        if m.any():
            center_in = (tl + tr + bl + br) >= 4.0 * lvl
            emit(m & center_in, _SADDLE_INSIDE[idx])
            emit(m & ~center_in, _SADDLE_OUTSIDE[idx])
    if not out:
        return np.empty((0, 4), dtype=np.float64)
    return np.concatenate(out, axis=0)
