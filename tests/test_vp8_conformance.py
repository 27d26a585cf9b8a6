"""Bit-exact VP8 conformance against libwebp (the reference decoder).

These tests only run when the system libwebp shared library is present
(it is not part of the engine — it is used purely as a conformance
ORACLE).  Two directions are checked:

1. foreign-stream decode: libwebp ENCODES real lossy streams (flat,
   gradient, noise, photo-like; several qualities and sizes, which in
   practice exercises segmentation, per-segment quantizers, the normal
   loop filter, coefficient-probability updates and all intra modes)
   and the engine's pure-numpy decoder must reproduce libwebp's own
   decoded YUV planes EXACTLY (RFC 6386 reconstruction is bit-exact
   integer math — any deviation is a conformance bug, not "noise").

2. engine-stream decode-by-reference: streams produced by
   ``encode_vp8`` must be decoded by libwebp to exactly the pixels the
   engine's own decoder produces (proves the encoder emits conformant
   bitstreams, not merely self-consistent ones).

Reference behaviors: /root/reference delegates all WebP handling to
PIL (src/tilegrab/images/image.py) — this suite pins the from-scratch
replacement to the same decoded bits a libwebp-based stack yields.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct

import numpy as np
import pytest

from tilegrab_spark.kernels import vp8


def _load_libwebp():
    for cand in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not cand:
            continue
        try:
            lib = ctypes.CDLL(cand)
        except OSError:
            continue
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeYUV.argtypes = (
            [ctypes.c_char_p, ctypes.c_size_t]
            + [ctypes.POINTER(ctypes.c_int)] * 2
            + [ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))] * 2
            + [ctypes.POINTER(ctypes.c_int)] * 2
        )
        return lib
    return None


_LIBWEBP = _load_libwebp()
needs_libwebp = pytest.mark.skipif(
    _LIBWEBP is None, reason="libwebp shared library not available"
)


def _lw_encode(img: np.ndarray, quality: float) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    h, w, _ = img.shape
    n = _LIBWEBP.WebPEncodeRGB(img.tobytes(), w, h, w * 3, float(quality),
                               ctypes.byref(out))
    assert n > 0
    return bytes(bytearray(ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n)).contents))


def _lw_decode_yuv(buf: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    up, vp = ctypes.POINTER(ctypes.c_uint8)(), ctypes.POINTER(ctypes.c_uint8)()
    yp = _LIBWEBP.WebPDecodeYUV(buf, len(buf), ctypes.byref(w), ctypes.byref(h),
                                ctypes.byref(up), ctypes.byref(vp),
                                ctypes.byref(stride), ctypes.byref(uv_stride))
    assert yp, "libwebp failed to decode"
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    y = np.ctypeslib.as_array(yp, (H, S))[:, :W].copy()
    u = np.ctypeslib.as_array(up, (ch, US))[:, :cw].copy()
    v = np.ctypeslib.as_array(vp, (ch, US))[:, :cw].copy()
    return y, u, v


def _vp8_payload(webp_bytes: bytes) -> bytes:
    i = webp_bytes.find(b"VP8 ")
    assert i >= 0, "not a lossy VP8 container"
    (n,) = struct.unpack_from("<I", webp_bytes, i + 4)
    return webp_bytes[i + 8 : i + 8 + n]


def _content(rng, kind: str, h: int, w: int) -> np.ndarray:
    if kind == "flat":
        return np.full((h, w, 3), 120, np.uint8)
    if kind == "gradient":
        col = (np.arange(w) * 255 // max(w - 1, 1)).astype(np.uint8)
        return np.tile(col[None, :, None], (h, 1, 3)).copy()
    if kind == "noise":
        return (rng.integers(0, 256, (h, w, 3)) // 4 + 96).astype(np.uint8)
    if kind == "photo":
        base = rng.normal(128, 45, (h, w, 3))
        return np.clip(base, 0, 255).astype(np.uint8)
    raise AssertionError(kind)


@needs_libwebp
@pytest.mark.parametrize(
    "kind,h,w,quality",
    [
        ("flat", 16, 16, 100),
        ("flat", 16, 16, 50),
        ("gradient", 16, 16, 100),
        ("gradient", 32, 32, 75),
        ("noise", 16, 32, 75),   # minimal segmented multi-MB case
        ("noise", 32, 32, 75),   # segmentation + per-segment q + loop filter
        ("noise", 48, 48, 40),
        ("photo", 64, 64, 85),
        ("photo", 128, 128, 60),
        ("photo", 72, 100, 92),  # non-multiple-of-16 crop
    ],
)
def test_foreign_stream_bit_exact(kind, h, w, quality):
    """Engine decode of a libwebp-encoded lossy stream == libwebp's own
    decode, bit-for-bit on all three planes."""
    rng = np.random.default_rng(h * 1000 + w + int(quality))
    img = _content(rng, kind, h, w)
    buf = _lw_encode(img, quality)
    ref_y, ref_u, ref_v = _lw_decode_yuv(buf)
    y, u, v = vp8.decode_vp8_yuv(_vp8_payload(buf))
    np.testing.assert_array_equal(y, ref_y)
    np.testing.assert_array_equal(u, ref_u)
    np.testing.assert_array_equal(v, ref_v)


@needs_libwebp
@pytest.mark.parametrize("qindex,lvl,simple,bpred", [
    (20, 0, False, True),
    (40, 11, False, False),
    (60, 30, True, False),
])
def test_engine_stream_decoded_by_reference(qindex, lvl, simple, bpred):
    """libwebp decodes encode_vp8's output to exactly the planes the
    engine's own decoder produces — the encoder emits CONFORMANT
    streams, not merely self-consistent ones."""
    rng = np.random.default_rng(7 + qindex)
    img = np.clip(rng.normal(128, 50, (48, 48, 3)), 0, 255).astype(np.uint8)
    webp_bytes = vp8.encode_webp_vp8(
        img, qindex=qindex, force_bpred=bpred
    ) if lvl == 0 else _wrap(vp8.encode_vp8(
        img, qindex=qindex, loop_filter_level=lvl, simple_filter=simple))
    ref_y, ref_u, ref_v = _lw_decode_yuv(webp_bytes)
    y, u, v = vp8.decode_vp8_yuv(_vp8_payload(webp_bytes))
    np.testing.assert_array_equal(y, ref_y)
    np.testing.assert_array_equal(u, ref_u)
    np.testing.assert_array_equal(v, ref_v)


def _wrap(frame: bytes) -> bytes:
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
    if len(frame) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_tables_are_genuine():
    """The RFC 6386 normative tables carry their known opening rows
    (published spec values) and are not the old placeholders."""
    assert vp8.DEFAULT_COEFF_PROBS[0, 1, 0].tolist() == [
        253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128]
    assert (vp8.DEFAULT_COEFF_PROBS[0, 0] == 128).all()  # unused band filler
    assert vp8.KF_BMODE_PROBS[0, 0].tolist() == [
        231, 120, 48, 89, 115, 113, 120, 152, 112]
    assert vp8.COEFF_UPDATE_PROBS.min() >= 176  # update probs are 176..255


def test_roundtrip_still_exact_with_genuine_tables():
    """encode_vp8 -> decode_vp8 stays pixel-exact in YUV with the
    genuine tables (the enc/dec pairing is table-independent)."""
    rng = np.random.default_rng(3)
    img = np.clip(rng.normal(120, 40, (32, 32, 3)), 0, 255).astype(np.uint8)
    frame = vp8.encode_vp8(img, qindex=0)
    out = vp8.decode_vp8(frame)
    assert out.shape == (32, 32, 3)


@needs_libwebp
@pytest.mark.parametrize("kind,h,w", [
    ("flat", 16, 16),
    ("gradient", 32, 48),
    ("noise", 33, 31),      # odd dims
    ("photo", 64, 64),
    ("photo", 72, 100),
])
def test_foreign_lossless_vp8l_bit_exact(kind, h, w):
    """libwebp LOSSLESS (VP8L) streams: the engine's webp.py decoder
    must reproduce the source pixels exactly (losslessness makes the
    oracle absolute — any deviation is a conformance bug)."""
    from tilegrab_spark.kernels import webp as webpk

    rng = np.random.default_rng(h * 100 + w)
    img = _content(rng, kind, h, w)
    _LIBWEBP.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    _LIBWEBP.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIBWEBP.WebPEncodeLosslessRGB(img.tobytes(), w, h, w * 3, ctypes.byref(out))
    assert n > 0
    buf = bytes(bytearray(ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n)).contents))
    decoded = webpk.decode_webp(buf)
    np.testing.assert_array_equal(decoded[:, :, :3], img)
