"""PNG/JPEG conformance against the system libgd (libpng + libjpeg).

The reference decodes tiles through PIL, i.e. through exactly this
libpng/libjpeg stack — these tests pin the from-scratch numpy codecs
against FOREIGN streams produced by (and consumed by) that stack.
They only run when libgd is present; it is a conformance ORACLE, never
a runtime dependency.

- PNG is lossless and bit-exact by spec: a libgd/libpng-encoded stream
  must decode to EXACTLY the source pixels, and an engine-encoded
  stream must be decoded by libgd to exactly the source pixels (both
  directions, all filter types).
- JPEG decoding is NOT bit-exact by spec (the IDCT has tolerance), so
  cross-decoder parity is bounded: the engine's decode of a
  libjpeg-encoded stream must agree with libjpeg's own decode within a
  small per-pixel bound.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from tilegrab_spark.kernels import jpeg as jpegk
from tilegrab_spark.kernels import png as pngk


def _load_gd():
    for cand in ("libgd.so.3", "libgd.so", ctypes.util.find_library("gd")):
        if not cand:
            continue
        try:
            gd = ctypes.CDLL(cand)
        except OSError:
            continue
        gd.gdImageCreateFromPngPtr.restype = ctypes.c_void_p
        gd.gdImageCreateFromPngPtr.argtypes = [ctypes.c_int, ctypes.c_void_p]
        gd.gdImageCreateFromJpegPtr.restype = ctypes.c_void_p
        gd.gdImageCreateFromJpegPtr.argtypes = [ctypes.c_int, ctypes.c_void_p]
        gd.gdImageCreateTrueColor.restype = ctypes.c_void_p
        gd.gdImageCreateTrueColor.argtypes = [ctypes.c_int, ctypes.c_int]
        gd.gdImageSetPixel.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        gd.gdImageGetTrueColorPixel.restype = ctypes.c_int
        gd.gdImageGetTrueColorPixel.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        gd.gdImagePngPtr.restype = ctypes.c_void_p
        gd.gdImagePngPtr.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
        gd.gdImageJpegPtr.restype = ctypes.c_void_p
        gd.gdImageJpegPtr.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        gd.gdImageDestroy.argtypes = [ctypes.c_void_p]
        gd.gdFree.argtypes = [ctypes.c_void_p]
        return gd
    return None


_GD = _load_gd()
needs_gd = pytest.mark.skipif(_GD is None, reason="libgd not available")


def _gd_image_from(arr: np.ndarray):
    h, w, _ = arr.shape
    im = _GD.gdImageCreateTrueColor(w, h)
    assert im
    a = arr.astype(np.int64)
    colors = (a[:, :, 0] << 16) | (a[:, :, 1] << 8) | a[:, :, 2]
    for y in range(h):
        row = colors[y]
        for x in range(w):
            _GD.gdImageSetPixel(im, x, y, int(row[x]))
    return im


def _gd_pixels(im, w: int, h: int) -> np.ndarray:
    out = np.empty((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            c = _GD.gdImageGetTrueColorPixel(im, x, y)
            out[y, x] = ((c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF)
    return out


def _gd_encode_png(arr: np.ndarray) -> bytes:
    im = _gd_image_from(arr)
    size = ctypes.c_int()
    ptr = _GD.gdImagePngPtr(im, ctypes.byref(size))
    data = ctypes.string_at(ptr, size.value)
    _GD.gdFree(ptr)
    _GD.gdImageDestroy(im)
    return data


def _gd_encode_jpeg(arr: np.ndarray, quality: int) -> bytes:
    im = _gd_image_from(arr)
    size = ctypes.c_int()
    ptr = _GD.gdImageJpegPtr(im, ctypes.byref(size), quality)
    data = ctypes.string_at(ptr, size.value)
    _GD.gdFree(ptr)
    _GD.gdImageDestroy(im)
    return data


def _content(kind: str, h: int, w: int, seed: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if kind == "gradient":
        col = (np.arange(w) * 255 // max(w - 1, 1)).astype(np.uint8)
        g = np.tile(col[None, :, None], (h, 1, 3)).copy()
        g[:, :, 1] = g[::-1, :, 0]
        return g
    if kind == "noise":
        return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    if kind == "photo":
        return np.clip(rng.normal(120, 50, (h, w, 3)), 0, 255).astype(np.uint8)
    return np.full((h, w, 3), 77, np.uint8)


@needs_gd
@pytest.mark.parametrize("kind,h,w", [
    ("solid", 16, 16),
    ("gradient", 32, 48),
    ("noise", 33, 31),      # odd dims
    ("photo", 64, 64),
])
def test_foreign_png_decodes_bit_exact(kind, h, w):
    """libpng-encoded stream -> engine decode == source pixels."""
    src = _content(kind, h, w)
    data = _gd_encode_png(src)
    out = pngk.decode_png(data)
    assert out.shape[2] in (3, 4)
    np.testing.assert_array_equal(out[:, :, :3], src)


@needs_gd
@pytest.mark.parametrize("filter_type", [0, 2])
def test_engine_png_decoded_by_foreign(filter_type):
    """engine-encoded stream (both encoder filter paths; the DECODER
    handles all five filters, pinned by the foreign-stream test above
    since libpng picks filters adaptively) -> libpng decode == source
    pixels."""
    src = _content("photo", 40, 56, seed=9)
    data = pngk.encode_png(src, filter_type=filter_type)
    im = _GD.gdImageCreateFromPngPtr(len(data), data)
    assert im, "libpng rejected the engine's PNG stream"
    got = _gd_pixels(im, 56, 40)
    _GD.gdImageDestroy(im)
    np.testing.assert_array_equal(got, src)


@needs_gd
@pytest.mark.parametrize("kind,quality", [
    ("gradient", 95),
    ("photo", 85),
    ("photo", 60),
    ("noise", 90),
])
def test_foreign_jpeg_decode_matches_reference_decoder(kind, quality):
    """libjpeg-encoded stream: engine decode vs libjpeg's own decode —
    bounded per-pixel difference (JPEG IDCT freedom), tiny mean."""
    src = _content(kind, 48, 48, seed=11)
    data = _gd_encode_jpeg(src, quality)
    mine = jpegk.decode_jpeg(data)
    im = _GD.gdImageCreateFromJpegPtr(len(data), data)
    assert im
    ref = _gd_pixels(im, 48, 48)
    _GD.gdImageDestroy(im)
    d = np.abs(mine[:, :, :3].astype(int) - ref.astype(int))
    assert d.max() <= 6, d.max()
    assert d.mean() <= 1.0, d.mean()


@needs_gd
def test_engine_jpeg_decoded_by_foreign():
    """engine-encoded baseline JPEG: libjpeg decodes it, close to the
    engine's own decode (bounded by the same IDCT tolerance)."""
    src = _content("photo", 48, 64, seed=13)
    data = jpegk.encode_jpeg(src, quality=90)
    im = _GD.gdImageCreateFromJpegPtr(len(data), data)
    assert im, "libjpeg rejected the engine's JPEG stream"
    ref = _gd_pixels(im, 64, 48)
    _GD.gdImageDestroy(im)
    mine = jpegk.decode_jpeg(data)
    d = np.abs(mine[:, :, :3].astype(int) - ref.astype(int))
    assert d.max() <= 6, d.max()
    assert d.mean() <= 1.0, d.mean()


@needs_gd
def test_engine_progressive_jpeg_decoded_by_foreign():
    """engine-encoded PROGRESSIVE JPEG: libjpeg decodes it too."""
    src = _content("photo", 32, 32, seed=15)
    data = jpegk.encode_jpeg_progressive(src, quality=85)
    im = _GD.gdImageCreateFromJpegPtr(len(data), data)
    assert im, "libjpeg rejected the engine's progressive JPEG stream"
    ref = _gd_pixels(im, 32, 32)
    _GD.gdImageDestroy(im)
    mine = jpegk.decode_jpeg(data)
    d = np.abs(mine[:, :, :3].astype(int) - ref.astype(int))
    assert d.max() <= 6, d.max()


@needs_gd
def test_foreign_palette_png_decodes_bit_exact():
    """libpng PALETTE-coded stream (gdImageCreate = 8-bit indexed) ->
    engine decode == source pixels."""
    _GD.gdImageCreate.restype = ctypes.c_void_p
    _GD.gdImageCreate.argtypes = [ctypes.c_int, ctypes.c_int]
    _GD.gdImageColorAllocate.restype = ctypes.c_int
    _GD.gdImageColorAllocate.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 3
    h = w = 32
    rng = np.random.default_rng(21)
    palette = rng.integers(0, 256, (16, 3))
    idx = rng.integers(0, 16, (h, w))
    im = _GD.gdImageCreate(w, h)
    colors = [
        _GD.gdImageColorAllocate(im, int(r), int(g), int(b))
        for r, g, b in palette
    ]
    for y in range(h):
        for x in range(w):
            _GD.gdImageSetPixel(im, x, y, colors[idx[y, x]])
    size = ctypes.c_int()
    ptr = _GD.gdImagePngPtr(im, ctypes.byref(size))
    data = ctypes.string_at(ptr, size.value)
    _GD.gdFree(ptr)
    _GD.gdImageDestroy(im)
    out = pngk.decode_png(data)
    expected = palette[idx].astype(np.uint8)
    np.testing.assert_array_equal(out[:, :, :3], expected)


@needs_gd
def test_foreign_interlaced_png_decodes_bit_exact():
    """libpng ADAM7-interlaced stream (gdImageInterlace) -> engine
    decode == source pixels."""
    _GD.gdImageInterlace.argtypes = [ctypes.c_void_p, ctypes.c_int]
    src = _content("photo", 37, 53, seed=23)  # odd dims stress the passes
    im = _gd_image_from(src)
    _GD.gdImageInterlace(im, 1)
    size = ctypes.c_int()
    ptr = _GD.gdImagePngPtr(im, ctypes.byref(size))
    data = ctypes.string_at(ptr, size.value)
    _GD.gdFree(ptr)
    _GD.gdImageDestroy(im)
    assert data[28] == 1, "stream is not interlaced"  # IHDR interlace byte
    out = pngk.decode_png(data)
    np.testing.assert_array_equal(out[:, :, :3], src)
