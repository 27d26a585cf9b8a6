"""Pure-numpy BMP (Windows DIB) codec.

The remaining everyday raster format in web/enterprise corpora after
PNG/JPEG/WebP/GIF/TIFF: BITMAPFILEHEADER + BITMAPINFOHEADER (or the
larger V4/V5 headers, which begin with the same 40 bytes), bottom-up
or top-down rows padded to 4 bytes.  Decodes 24-bit BGR, 32-bit BGRA
(alpha dropped — the engine's canvas is forced RGB), and 8-bit
paletted streams, uncompressed (BI_RGB) or RLE8; encodes 24-bit
BI_RGB for fixtures/round-trips.

Same contract as the other codecs (kernels/png.py etc.): corrupt
streams raise ValueError promptly, dimensions are capped, everything
after the row extraction is vectorized numpy.
"""

from __future__ import annotations

import struct

import numpy as np

_PIXEL_CAP = 1 << 28

__all__ = ["decode_bmp", "encode_bmp", "is_bmp"]


def is_bmp(data: bytes) -> bool:
    return len(data) >= 2 and data[:2] == b"BM"


def _rle8_decode(buf: bytes, w: int, h: int) -> np.ndarray:
    """RLE8 -> (h, w) index rows in file (bottom-up) order."""
    out = np.zeros((h, w), np.uint8)
    x = y = 0
    i = 0
    n = len(buf)
    while i + 1 < n:
        count, val = buf[i], buf[i + 1]
        i += 2
        if count:  # encoded run
            if y >= h:
                raise ValueError("RLE8 run outside the bitmap")
            c = min(count, w - x)
            out[y, x: x + c] = val
            x += c
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return out
        elif val == 2:  # delta
            if i + 1 >= n:
                raise ValueError("truncated RLE8 delta")
            x += buf[i]
            y += buf[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("RLE8 delta outside the bitmap")
        else:  # absolute run of `val` literal bytes, word-aligned
            if y >= h:
                raise ValueError("RLE8 literals outside the bitmap")
            if i + val > n:
                raise ValueError("truncated RLE8 literals")
            c = min(val, w - x)
            out[y, x: x + c] = np.frombuffer(buf[i: i + c], np.uint8)
            x += c
            i += val + (val & 1)
    return out


def decode_bmp(data: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB."""
    if not is_bmp(data):
        raise ValueError("not a BMP stream")
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    (palette_n,) = struct.unpack_from("<I", data, 46)
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w < 1 or h < 1 or planes != 1:
        raise ValueError("bad BMP dimensions")
    if w * h > _PIXEL_CAP:
        raise ValueError("BMP exceeds the 2^28-pixel decode cap")
    if pix_off > len(data):
        raise ValueError("BMP pixel offset out of bounds")

    if bpp == 8:
        n_pal = palette_n or 256
        pal_off = 14 + hdr_size
        pal_raw = data[pal_off: pal_off + 4 * n_pal]
        if len(pal_raw) < 4 * n_pal:
            raise ValueError("truncated BMP palette")
        pal = np.frombuffer(pal_raw, np.uint8).reshape(n_pal, 4)[:, 2::-1]
        if compression == 1:  # RLE8
            idx = _rle8_decode(data[pix_off:], w, h)
        elif compression == 0:
            stride = (w + 3) & ~3
            need = stride * h
            raw = data[pix_off: pix_off + need]
            if len(raw) < need:
                raise ValueError("truncated BMP pixel data")
            idx = np.frombuffer(raw, np.uint8).reshape(h, stride)[:, :w]
        else:
            raise ValueError(f"unsupported BMP compression {compression}")
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("BMP pixel index outside the palette")
        img = pal[idx]
    elif bpp in (24, 32):
        if compression != 0:
            raise ValueError(f"unsupported BMP compression {compression}")
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        need = stride * h
        raw = data[pix_off: pix_off + need]
        if len(raw) < need:
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(raw, np.uint8).reshape(h, stride)
        img = rows[:, : w * nb].reshape(h, w, nb)[:, :, 2::-1]  # BGR(A)->RGB
    else:
        raise ValueError(f"unsupported BMP bit depth {bpp}")

    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit BI_RGB BMP (fixture writer)."""
    img = np.asarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    body = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(body), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return hdr + info + body
