"""Pure-numpy geospatial kernels: slippy-map (XYZ / Web-Mercator) tile math
and box-vs-polygon intersection.

These are the engine's numeric contract, re-derived from the reference's
formulas (cited per function; reference = thiwaK/tilegrab at
/root/reference). Everything is float64 and vectorized — these kernels run
both driver-side (tiny broadcast geometry prep) and inside Arrow-batched
pandas UDFs on executors. No shapely / geopandas / pyproj dependency.
"""

from __future__ import annotations

import math

import numpy as np

# Constants — must match the reference exactly (FIXTURES.md §4.6).
EPSILON = 1e-14        # reference: tiles/collection.py:13
LL_EPSILON = 1e-11     # reference: tiles/collection.py:14
MERCATOR_LAT_LIMIT = 85.051129          # reference: tiles/collection.py:120-127
WEB_MERCATOR_EXTENT = 20037508.342789244  # reference: images/collection.py:12
WGS84_RADIUS = 6378137.0               # spherical Mercator radius (EPSG:3857)
TILE_EPSG = 4326                        # reference: dataset.py:9
EXPORT_EPSG = 3857                      # reference: images/exporter.py:11
TILE_W = 256                            # reference: images/image.py:16-17
TILE_H = 256


# ---------------------------------------------------------------------------
# P1: lon/lat -> tile index (cell encode).  reference: tiles/collection.py:86-117
# ---------------------------------------------------------------------------

def lonlat_to_tile(lon, lat, zoom: int):
    """Vectorized forward Web-Mercator tile encode with the reference's
    epsilon-floor and world-edge clamps (tiles/collection.py:86-117).

    Accepts scalars or arrays; returns (xtile, ytile) int64 arrays.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = lon / 360.0 + 0.5
    sinlat = np.sin(np.radians(lat))
    y = 0.5 - 0.25 * np.log((1.0 + sinlat) / (1.0 - sinlat)) / np.pi
    z2 = math.pow(2, zoom)

    xtile = np.where(
        x <= 0, 0,
        np.where(x >= 1, int(z2 - 1), np.floor((x + EPSILON) * z2)),
    ).astype(np.int64)
    ytile = np.where(
        y <= 0, 0,
        np.where(y >= 1, int(z2 - 1), np.floor((y + EPSILON) * z2)),
    ).astype(np.int64)
    return xtile, ytile


# ---------------------------------------------------------------------------
# P2: tile index -> lat/lon bounds (cell decode).  reference: tiles/tile.py:58-77
# ---------------------------------------------------------------------------

def tile_bounds(x, y, zoom):
    """Vectorized inverse: (min_lon, min_lat, max_lon, max_lat) float64.

    reference: tiles/tile.py:58-77.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = np.power(2.0, np.asarray(zoom, dtype=np.float64))
    min_lon = x / n * 360.0 - 180.0
    max_lon = (x + 1) / n * 360.0 - 180.0

    def tile_y_to_lat(yt):
        merc_y = np.pi * (1 - 2 * yt / n)
        return np.degrees(np.arctan(np.sinh(merc_y)))

    max_lat = tile_y_to_lat(y)
    min_lat = tile_y_to_lat(y + 1)
    return min_lon, min_lat, max_lon, max_lat


# ---------------------------------------------------------------------------
# P3: tile index -> Web-Mercator meter bounds.  reference: images/collection.py:86-97
# ---------------------------------------------------------------------------

def tile_extent_mercator(minx, miny, maxx, maxy, zoom: int):
    """Web-Mercator (EPSG:3857) bounds of a tile-index extent.

    reference: images/collection.py:86-97 (`TileImageCollection.bounds`).
    Returns (xmin, ymin, xmax, ymax) in meters.
    """
    n = 2 ** zoom
    tile_size_m = 2 * WEB_MERCATOR_EXTENT / n
    xmin = -WEB_MERCATOR_EXTENT + minx * tile_size_m
    xmax = -WEB_MERCATOR_EXTENT + (maxx + 1) * tile_size_m
    ymax = WEB_MERCATOR_EXTENT - miny * tile_size_m
    ymin = WEB_MERCATOR_EXTENT - (maxy + 1) * tile_size_m
    return xmin, ymin, xmax, ymax


# ---------------------------------------------------------------------------
# P10: EPSG:3857 -> EPSG:4326 reprojection.  reference: dataset.py:105-107
# (reference delegates to geopandas.to_crs; this is the closed-form inverse
#  spherical Mercator, validated against the reference's golden bbox in
#  tests/test_dataset.py:15-21 to <=1e-13)
# ---------------------------------------------------------------------------

def mercator_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / WGS84_RADIUS)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / WGS84_RADIUS)) - np.pi / 2.0)
    return lon, lat


def lonlat_to_mercator(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = np.radians(lon) * WGS84_RADIUS
    y = np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) * WGS84_RADIUS
    return x, y


# ---------------------------------------------------------------------------
# F1/F4: bbox -> tile index ranges.  reference: tiles/collection.py:119-143
# ---------------------------------------------------------------------------

def bbox_tile_range(minx: float, miny: float, maxx: float, maxy: float, zoom: int):
    """Tile-index range [x0..x1] x [y0..y1] covering a 4326 bbox, with the
    reference's Mercator clamp and LL_EPSILON lower-right shrink
    (tiles/collection.py:119-130). Returns (x0, x1, y0, y1) ints inclusive.
    """
    w, s, e, n = minx, miny, maxx, maxy
    if s < -MERCATOR_LAT_LIMIT or n > MERCATOR_LAT_LIMIT:
        w = max(-180.0, w)
        s = max(-MERCATOR_LAT_LIMIT, s)
        e = min(180.0, e)
        n = min(MERCATOR_LAT_LIMIT, n)
    ulx, uly = lonlat_to_tile(w, n, zoom)
    lrx, lry = lonlat_to_tile(e - LL_EPSILON, s + LL_EPSILON, zoom)
    return int(ulx), int(lrx), int(uly), int(lry)


# ---------------------------------------------------------------------------
# Packed cell id:  cell_id = z<<58 | x<<29 | y   (SURVEY.md §1.1; the XYZ
# quadtree key is our H3/S2-style discrete spatial index)
# ---------------------------------------------------------------------------

def pack_cell_id(x, y, z):
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    z = np.asarray(z, dtype=np.int64)
    return (z << 58) | (x << 29) | y


def unpack_cell_id(cell_id):
    cell_id = np.asarray(cell_id, dtype=np.int64)
    z = cell_id >> 58
    x = (cell_id >> 29) & ((1 << 29) - 1)
    y = cell_id & ((1 << 29) - 1)
    return x, y, z


# ---------------------------------------------------------------------------
# F2: box-vs-polygon intersection (the spatial-join refine kernel).
# reference semantics: shapely box(tile).intersects(geometry).any()
# (tiles/collection.py:145) — touching counts as intersecting.
# ---------------------------------------------------------------------------

def _point_in_rings(px, py, rings):
    """Even-odd ray-cast PIP for a batch of points against a polygon's rings
    (outer ring + holes handled naturally by even-odd). px/py: (N,) arrays.
    rings: list of (M_i, 2) float64 arrays. Returns (N,) bool.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    for ring in rings:
        xs = ring[:, 0]
        ys = ring[:, 1]
        x1, y1 = xs[:-1], ys[:-1]
        x2, y2 = xs[1:], ys[1:]
        # For each point (broadcast N x M segments)
        pyc = py[:, None]
        pxc = px[:, None]
        cond = (y1 > pyc) != (y2 > pyc)
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            xint = x1 + (pyc - y1) * (x2 - x1) / (y2 - y1)
        crosses = cond & (pxc < xint)
        inside ^= (crosses.sum(axis=1) % 2).astype(bool)
    return inside


def _segments_intersect_boxes(bx0, by0, bx1, by1, segs):
    """For each box (N,) and segment set (M,4 as x1,y1,x2,y2): does any
    segment intersect the (closed) box? Liang-Barsky clip, vectorized N x M.
    Returns (N,) bool.
    """
    x1 = segs[:, 0][None, :]
    y1 = segs[:, 1][None, :]
    dx = (segs[:, 2] - segs[:, 0])[None, :]
    dy = (segs[:, 3] - segs[:, 1])[None, :]
    bx0 = np.asarray(bx0, dtype=np.float64)[:, None]
    by0 = np.asarray(by0, dtype=np.float64)[:, None]
    bx1 = np.asarray(bx1, dtype=np.float64)[:, None]
    by1 = np.asarray(by1, dtype=np.float64)[:, None]

    t0 = np.zeros((bx0.shape[0], segs.shape[0]))
    t1 = np.ones_like(t0)
    ok = np.ones(t0.shape, dtype=bool)

    for p, q in (
        (-dx, x1 - bx0),
        (dx, bx1 - x1),
        (-dy, y1 - by0),
        (dy, by1 - y1),
    ):
        p = np.broadcast_to(p, t0.shape)
        q = np.broadcast_to(q, t0.shape)
        zero = p == 0
        # p==0: segment parallel to this boundary; reject if q<0 (outside)
        ok &= ~(zero & (q < 0))
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            r = np.where(zero, 0.0, q / np.where(zero, 1.0, p))
        t0 = np.where(p < 0, np.maximum(t0, r), t0)  # entering
        t1 = np.where(p > 0, np.minimum(t1, r), t1)  # leaving
    ok &= t0 <= t1
    return ok.any(axis=1)


def boxes_intersect_polygons(bx0, by0, bx1, by1, polygons):
    """Batch test: for each axis-aligned box, does it intersect ANY polygon?

    polygons: list of polygons; each polygon = list of rings; each ring =
    (M,2) float64 closed array (first==last not required; closed implicitly).
    Semantics match shapely's ``box.intersects(geom).any()`` used at
    reference tiles/collection.py:145: touching boundaries => True.

    intersects  iff  any ring segment intersects the closed box
                 OR  a box corner lies inside the polygon (box within poly)
    (polygon-within-box is covered by the segment test: its vertices are
    inside the box, and a degenerate point-segment still clips in.)
    """
    bx0 = np.atleast_1d(np.asarray(bx0, dtype=np.float64))
    by0 = np.atleast_1d(np.asarray(by0, dtype=np.float64))
    bx1 = np.atleast_1d(np.asarray(bx1, dtype=np.float64))
    by1 = np.atleast_1d(np.asarray(by1, dtype=np.float64))
    n = bx0.shape[0]
    result = np.zeros(n, dtype=bool)
    for poly in polygons:
        rings = [np.asarray(r, dtype=np.float64) for r in poly]
        closed = []
        segs = []
        for r in rings:
            if not (r[0] == r[-1]).all():
                r = np.vstack([r, r[:1]])
            closed.append(r)
            segs.append(
                np.column_stack([r[:-1, 0], r[:-1, 1], r[1:, 0], r[1:, 1]])
            )
        allsegs = np.vstack(segs)
        hit = _segments_intersect_boxes(bx0, by0, bx1, by1, allsegs)
        # boxes with no edge crossing: either fully inside or fully outside
        todo = ~hit & ~result
        if todo.any():
            inside = _point_in_rings(bx0[todo], by0[todo], closed)
            hit[todo] |= inside
        result |= hit
    return result


def _point_to_box_dist(px, py, bx0, by0, bx1, by1):
    """Distance from points (M,) to boxes (N,), broadcast (N, M). Zero
    for points inside a box."""
    dx = np.maximum(np.maximum(bx0[:, None] - px[None, :], 0.0),
                    px[None, :] - bx1[:, None])
    dy = np.maximum(np.maximum(by0[:, None] - py[None, :], 0.0),
                    py[None, :] - by1[:, None])
    return np.hypot(dx, dy)


def _points_to_segments_dist(px, py, segs):
    """Distance from points (K,) to segments (M,4), broadcast (K, M):
    classic clamped projection onto each segment."""
    x1, y1 = segs[:, 0][None, :], segs[:, 1][None, :]
    dx = (segs[:, 2] - segs[:, 0])[None, :]
    dy = (segs[:, 3] - segs[:, 1])[None, :]
    wx = px[:, None] - x1
    wy = py[:, None] - y1
    L2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(L2 > 0, (wx * dx + wy * dy) / np.where(L2 > 0, L2, 1.0), 0.0)
    t = np.clip(t, 0.0, 1.0)
    return np.hypot(wx - t * dx, wy - t * dy)


def boxes_within_distance_of_polygons(bx0, by0, bx1, by1, polygons, dist):
    """Batch test: for each axis-aligned box, is it within ``dist`` of ANY
    polygon (boundary or interior)? Equivalent to intersecting the
    ``dist``-buffered geometry (P9 buffer, re-expressed as a distance
    predicate — exact for the tile-selection use, no Minkowski-sum
    geometry is ever constructed).

    selected iff box intersects the polygon
             OR min-distance(box, polygon boundary) <= dist.

    For a disjoint convex box vs a segment, the minimum distance is
    attained at a vertex of one of them, so
    min(point_to_box(seg endpoints), point_to_segment(box corners)) is
    EXACT — no sampling. Coordinates must be in a metric space (callers
    project to Web-Mercator meters first; note 3857 meters scale by
    cos(lat) vs ground meters, the standard slippy-map convention).
    """
    if dist < 0:
        raise ValueError(f"dist must be >= 0, got {dist}")
    bx0 = np.atleast_1d(np.asarray(bx0, dtype=np.float64))
    by0 = np.atleast_1d(np.asarray(by0, dtype=np.float64))
    bx1 = np.atleast_1d(np.asarray(bx1, dtype=np.float64))
    by1 = np.atleast_1d(np.asarray(by1, dtype=np.float64))
    result = boxes_intersect_polygons(bx0, by0, bx1, by1, polygons)
    if dist == 0:
        return result
    corners_x = np.stack([bx0, bx1, bx0, bx1], axis=1)  # (N, 4)
    corners_y = np.stack([by0, by0, by1, by1], axis=1)
    for poly in polygons:
        todo = ~result
        if not todo.any():
            break
        segs = []
        for r in poly:
            r = np.asarray(r, dtype=np.float64)
            if not (r[0] == r[-1]).all():
                r = np.vstack([r, r[:1]])
            segs.append(np.column_stack([r[:-1, 0], r[:-1, 1], r[1:, 0], r[1:, 1]]))
        allsegs = np.vstack(segs)
        # segment endpoints to boxes
        epx = np.concatenate([allsegs[:, 0], allsegs[:, 2]])
        epy = np.concatenate([allsegs[:, 1], allsegs[:, 3]])
        d_ep = _point_to_box_dist(epx, epy, bx0[todo], by0[todo], bx1[todo], by1[todo]).min(axis=1)
        # box corners to segments
        cx = corners_x[todo].ravel()
        cy = corners_y[todo].ravel()
        d_co = _points_to_segments_dist(cx, cy, allsegs).min(axis=1).reshape(-1, 4).min(axis=1)
        near = np.minimum(d_ep, d_co) <= dist
        idx = np.nonzero(todo)[0]
        result[idx[near]] = True
    return result


# ---------------------------------------------------------------------------
# kNN support: ring neighborhoods on the XYZ grid (the analogue of H3
# grid_ring; SURVEY.md §2.4 J-kNN). Pure index math.
# ---------------------------------------------------------------------------

def grid_ring(x: int, y: int, r: int, zoom: int):
    """All cells at Chebyshev distance exactly r from (x,y), clipped to the
    zoom's valid range. r=0 yields the cell itself. Returns (K,2) int64."""
    if r == 0:
        out = np.array([[x, y]], dtype=np.int64)
    else:
        xs = np.arange(x - r, x + r + 1, dtype=np.int64)
        ys = np.arange(y - r, y + r + 1, dtype=np.int64)
        top = np.column_stack([xs, np.full_like(xs, y - r)])
        bot = np.column_stack([xs, np.full_like(xs, y + r)])
        mid_y = ys[1:-1]
        left = np.column_stack([np.full_like(mid_y, x - r), mid_y])
        right = np.column_stack([np.full_like(mid_y, x + r), mid_y])
        out = np.vstack([top, bot, left, right])
    n = 1 << zoom
    ok = (out[:, 0] >= 0) & (out[:, 0] < n) & (out[:, 1] >= 0) & (out[:, 1] < n)
    return out[ok]


def tile_center_mercator(x, y, zoom):
    """Web-Mercator center of tile(s) — the kNN distance space (P3)."""
    n = 2 ** zoom
    ts = 2 * WEB_MERCATOR_EXTENT / n
    cx = -WEB_MERCATOR_EXTENT + (np.asarray(x, dtype=np.float64) + 0.5) * ts
    cy = WEB_MERCATOR_EXTENT - (np.asarray(y, dtype=np.float64) + 0.5) * ts
    return cx, cy
