"""GeoTIFF/COG writer conformance against the system libtiff.

Gated on libtiff being present (oracle-only, never a runtime
dependency). The engine's from-scratch TIFF writers must produce files
a real libtiff reads BIT-EXACT — including the tiled Cloud-Optimized
layout. (libtiff warns about the GeoTIFF extension tags 33550/33922/
34735 it does not model; that is expected — they are registered
extension tags, not malformations.)
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import tempfile

import numpy as np
import pytest

from tilegrab_spark.kernels import cog as cogk
from tilegrab_spark.kernels import geotiff as geok


def _load_libtiff():
    for cand in ("libtiff.so.6", "libtiff.so.5", "libtiff.so",
                 ctypes.util.find_library("tiff")):
        if not cand:
            continue
        try:
            t = ctypes.CDLL(cand)
        except OSError:
            continue
        t.TIFFOpen.restype = ctypes.c_void_p
        t.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        t.TIFFReadRGBAImageOriented.restype = ctypes.c_int
        t.TIFFReadRGBAImageOriented.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
        ]
        t.TIFFClose.argtypes = [ctypes.c_void_p]
        t.TIFFSetErrorHandler.restype = ctypes.c_void_p
        t.TIFFSetWarningHandler.restype = ctypes.c_void_p
        t.TIFFSetWarningHandler.argtypes = [ctypes.c_void_p]
        t.TIFFSetWarningHandler(None)  # silence extension-tag warnings
        return t
    return None


_T = _load_libtiff()
needs_libtiff = pytest.mark.skipif(_T is None, reason="libtiff not available")

_ORIENTATION_TOPLEFT = 1


def _libtiff_rgb(data: bytes, w: int, h: int) -> np.ndarray:
    path = tempfile.mktemp(suffix=".tif")
    try:
        with open(path, "wb") as f:
            f.write(data)
        tif = _T.TIFFOpen(path.encode(), b"r")
        assert tif, "libtiff rejected the engine's TIFF"
        buf = (ctypes.c_uint32 * (w * h))()
        ok = _T.TIFFReadRGBAImageOriented(tif, w, h, buf, _ORIENTATION_TOPLEFT, 0)
        _T.TIFFClose(tif)
        assert ok == 1, "libtiff failed to read the image data"
        arr = np.frombuffer(bytearray(buf), dtype=np.uint32).reshape(h, w)
        return np.stack(
            [(arr & 0xFF), (arr >> 8) & 0xFF, (arr >> 16) & 0xFF], axis=2
        ).astype(np.uint8)
    finally:
        if os.path.exists(path):
            os.unlink(path)


@needs_libtiff
@pytest.mark.parametrize("h,w", [(40, 56), (256, 256), (33, 31)])
def test_geotiff_writer_read_by_libtiff_bit_exact(h, w):
    rng = np.random.default_rng(h + w)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    data = geok.encode_geotiff(img, (0.0, 0.0, float(w), float(h)))
    got = _libtiff_rgb(data, w, h)
    np.testing.assert_array_equal(got, img)


@needs_libtiff
def test_cog_writer_read_by_libtiff_bit_exact():
    """The tiled COG layout (tile grid, overview IFD chain, header-first
    offsets) must be a valid TIFF to a real libtiff — full-resolution
    IFD read back bit-exact."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (300, 520, 3)).astype(np.uint8)
    data = cogk.encode_cog(
        img, (0.0, 0.0, 520.0, 300.0),
        overviews=cogk.build_overviews(img),
    )
    got = _libtiff_rgb(data, 520, 300)
    np.testing.assert_array_equal(got, img)
