"""Property-based tests (hypothesis) — the reference has none (SURVEY.md
§5); these pin the engine's numeric contract over the whole input space,
not just fixture goldens. Kernel-level (no Spark session) so they run in
milliseconds per example."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tilegrab_spark.kernels import geo, png

lats = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False)
lons = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
zooms = st.integers(min_value=0, max_value=20)


@given(lons, lats, zooms)
@settings(max_examples=300, deadline=None)
def test_encode_matches_reference_formula(lon, lat, zoom):
    """Vectorized encode == the reference's scalar formula
    (tiles/collection.py:86-117) for every point."""
    x, y = geo.lonlat_to_tile(lon, lat, zoom)
    # scalar re-derivation
    xf = lon / 360.0 + 0.5
    sinlat = math.sin(math.radians(lat))
    yf = 0.5 - 0.25 * math.log((1.0 + sinlat) / (1.0 - sinlat)) / math.pi
    z2 = math.pow(2, zoom)
    ex = 0 if xf <= 0 else int(z2 - 1) if xf >= 1 else int(math.floor((xf + geo.EPSILON) * z2))
    ey = 0 if yf <= 0 else int(z2 - 1) if yf >= 1 else int(math.floor((yf + geo.EPSILON) * z2))
    assert (int(x), int(y)) == (ex, ey)


@given(lons, lats, zooms)
@settings(max_examples=300, deadline=None)
def test_point_lands_in_its_tile_bounds(lon, lat, zoom):
    x, y = geo.lonlat_to_tile(lon, lat, zoom)
    mnl, mnt, mxl, mxt = geo.tile_bounds(int(x), int(y), zoom)
    # epsilon nudging means a point can sit at most EPSILON*360*2^z outside
    slack = 360.0 * geo.EPSILON * (1 << zoom) + 1e-9
    assert mnl - slack <= lon <= mxl + slack
    assert mnt - slack <= lat <= mxt + slack


@given(st.integers(0, (1 << 29) - 1), st.integers(0, (1 << 29) - 1), st.integers(0, 31))
@settings(max_examples=200, deadline=None)
def test_cell_id_pack_bijective(x, y, z):
    cid = geo.pack_cell_id(x, y, z)
    x2, y2, z2 = geo.unpack_cell_id(cid)
    assert (int(x2), int(y2), int(z2)) == (x, y, z)


@given(
    st.integers(1, 64), st.integers(1, 64),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_random_images(w, h, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    for ft in (0, 2):
        assert (png.decode_png(png.encode_png(arr, filter_type=ft)) == arr).all()


@given(st.lists(st.tuples(lons, lats), min_size=3, max_size=8), zooms.filter(lambda z: z <= 12))
@settings(max_examples=100, deadline=None)
def test_shape_plus_invert_equals_bbox(pts, zoom):
    """The J2/J3 algebra holds for arbitrary polygons: every bbox tile is
    in exactly one of {intersecting, inverted} (collection.py:144-150)."""
    ring = np.array(pts + pts[:1], dtype=np.float64)
    minx, miny = ring[:, 0].min(), ring[:, 1].min()
    maxx, maxy = ring[:, 0].max(), ring[:, 1].max()
    if maxx - minx < 1e-9 or maxy - miny < 1e-9:
        return  # degenerate
    x0, x1, y0, y1 = geo.bbox_tile_range(minx, miny, maxx, maxy, zoom)
    if (x1 - x0 + 1) * (y1 - y0 + 1) > 4096:
        return  # keep examples fast
    xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1), indexing="ij")
    xs, ys = xs.ravel(), ys.ravel()
    mnl, mnt, mxl, mxt = geo.tile_bounds(xs, ys, zoom)
    hit = geo.boxes_intersect_polygons(mnl, mnt, mxl, mxt, [[ring]])
    # partition: shape ∪ invert = bbox, disjoint (trivially true for a
    # boolean mask — the property here is that the kernel is total and
    # deterministic over arbitrary polygons)
    hit2 = geo.boxes_intersect_polygons(mnl, mnt, mxl, mxt, [[ring]])
    assert (hit == hit2).all()
    # at least one tile must intersect (the ring's own vertices are inside
    # the bbox tiles)
    assert hit.any()


@given(st.integers(0, 100), st.integers(0, 100), st.integers(0, 8), st.integers(3, 10))
@settings(max_examples=100, deadline=None)
def test_grid_ring_properties(x, y, r, zoom):
    ring = geo.grid_ring(x, y, r, zoom)
    n = 1 << zoom
    if len(ring):
        cheb = np.maximum(np.abs(ring[:, 0] - x), np.abs(ring[:, 1] - y))
        assert (cheb == r).all() or r == 0
        assert (ring >= 0).all() and (ring < n).all()
        # no duplicates
        assert len({(int(a), int(b)) for a, b in ring}) == len(ring)
