"""Minimal pure-numpy PNG codec (8-bit RGB, color type 2).

The sandbox has no PIL, so the engine carries its own codec for the image
payload column (`bytes: binary`, fmt='png'). The reference decodes with
``PIL.Image.open(BytesIO(data))`` (images/image.py:28) and encodes with
``img.save`` (images/image.py:48) — this module provides the same
round-trip contract for the subset the engine generates: 8-bit RGB,
non-interlaced, filters 0(None)/1(Sub)/2(Up) fast-path plus 3(Average)/
4(Paeth) slow-path on decode.

Designed to be called on BATCHES inside Arrow/pandas UDFs — encode/decode
one image is vectorized numpy; per-image loops live in the UDF, not here.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, *, filter_type: int = 0, level: int = 6) -> bytes:
    """Encode an (H, W, 3) uint8 array to PNG bytes.

    filter_type 0 (None) or 2 (Up) — Up usually compresses our synthetic
    XOR-pattern tiles better; both are exactly invertible.
    """
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected (H,W,3) uint8, got {arr.shape} {arr.dtype}")
    h, w, _ = arr.shape
    if filter_type == 0:
        raw = np.concatenate(
            [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * 3)], axis=1
        ).tobytes()
    elif filter_type == 2:
        flat = arr.reshape(h, w * 3)
        delta = flat.copy()
        delta[1:] = flat[1:] - flat[:-1]  # uint8 wraps mod 256
        raw = np.concatenate(
            [np.full((h, 1), 2, dtype=np.uint8), delta], axis=1
        ).tobytes()
    else:
        raise ValueError(f"unsupported encode filter {filter_type}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, level))
        + _chunk(b"IEND", b"")
    )


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass lattice: (x_start, y_start, x_step, y_step)
_ADAM7_PASSES = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _unfilter(rows: np.ndarray, bpp: int) -> np.ndarray:
    """Invert PNG scanline filters over (h, stride+1) filter-prefixed
    rows; returns (h, stride) raw bytes."""
    h, stride1 = rows.shape
    stride = stride1 - 1
    filters = rows[:, 0]
    # fast paths: homogeneous filter images unfilter without a row loop
    if (filters == 0).all():
        return rows[:, 1:]
    if (filters == 2).all():
        # Up filter everywhere == vertical prefix-sum mod 256. A
        # Hillis-Steele doubling scan (log2(h) full-array uint8 adds,
        # wraparound IS the mod-256 semantics) measures ~4x faster than
        # np.add.accumulate's generic uint8 inner loop — this is the
        # hot path of every bench pixel stage (synthetic tiles are
        # filter-2 end to end).
        x = rows[:, 1:].copy()
        s = 1
        while s < x.shape[0]:
            x[s:] += x[:-s]
            s <<= 1
        return x
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        ft = filters[r]
        cur = rows[r, 1:].copy()
        prev = out[r - 1] if r > 0 else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            out[r] = cur
        elif ft == 1:  # Sub: cumulative along the row per byte-phase
            # stride == w*bpp for depth>=8 and bpp == 1 below 8, so the
            # reshape is always exact
            px = cur.reshape(-1, bpp)
            out[r] = (
                np.cumsum(px.astype(np.uint64), axis=0).astype(np.uint8).reshape(-1)
            )
        elif ft == 2:  # Up
            out[r] = cur + prev
        elif ft == 3:  # Average (serial in x)
            row = out[r]
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                row[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth (serial in x)
            row = out[r]
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                row[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {ft}")
    return out


def _unpack_samples(
    out: np.ndarray, h: int, w: int, channels: int, bitdepth: int
) -> np.ndarray:
    """Filtered-byte rows -> (h, w*channels) uint8 samples (sub-byte
    depths unpacked big-endian-first; 16-bit reduced to the high byte)."""
    if bitdepth < 8:
        bits = np.unpackbits(out, axis=1)[:, : w * channels * bitdepth]
        weights = (1 << np.arange(bitdepth - 1, -1, -1)).astype(np.uint8)
        return (
            bits.reshape(h, w * channels, bitdepth).astype(np.uint8) * weights
        ).sum(axis=2, dtype=np.uint16).astype(np.uint8)
    if bitdepth == 8:
        return out.reshape(h, w * channels)
    return out.reshape(h, w * channels, 2)[:, :, 0]


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to an (H, W, 3) uint8 array. Malformed or
    truncated streams raise ValueError (never zlib.error / struct.error /
    IndexError — callers like verify_images and image_features route
    decode failures to n_bad / decode_ok=False by ValueError)."""
    try:
        return _decode_png(data)
    except (zlib.error, struct.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed PNG stream: {e}") from e


def _decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to an (H, W, 3) uint8 array.

    Supports every non-interlaced combination real tile servers emit
    (parity with what PIL gives the reference at images/image.py:28 —
    OSM raster tiles are frequently 8-bit *palette* PNG):

    - color 2 (RGB) / 6 (RGBA), depth 8; depth 16 via high byte
    - color 0 (grayscale), depths 1/2/4/8/16 — replicated to RGB
    - color 3 (palette), depths 1/2/4/8 — PLTE lookup
    - color 4 (gray+alpha), depths 8/16

    Alpha (and palette tRNS transparency) is dropped: the reference
    pastes onto a forced-RGB mosaic canvas (images/mosaic.py:20).
    Adam7 interlacing is supported (seven independently-filtered
    sub-images scattered back onto the lattice). All 5 filter types;
    filters run at byte level per the spec, with sub-byte depths
    unpacked afterwards.
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color = bitdepth = None
    idat = []
    plte = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            ok = (
                interlace in (0, 1)
                and (
                    (color in (2, 6) and bitdepth in (8, 16))
                    or (color == 0 and bitdepth in (1, 2, 4, 8, 16))
                    or (color == 3 and bitdepth in (1, 2, 4, 8))
                    or (color == 4 and bitdepth in (8, 16))
                )
            )
            if w * h > 1 << 28:
                raise ValueError("PNG canvas exceeds the 2^28-pixel decode cap")
            if not ok:
                raise ValueError(
                    f"unsupported PNG: depth={bitdepth} color={color} interlace={interlace}"
                )
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if color == 3 and plte is None:
        raise ValueError("palette PNG without PLTE chunk")
    channels = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    bpp = max(1, channels * bitdepth // 8)
    if interlace == 0:
        stride = (w * channels * bitdepth + 7) // 8
        out = _unfilter(
            np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1), bpp
        )
        samples = _unpack_samples(out, h, w, channels, bitdepth)
    else:
        # Adam7: seven independently-filtered sub-images, scattered back
        # onto the full lattice
        samples = np.zeros((h, w * channels), dtype=np.uint8)
        full = samples.reshape(h, w, channels)
        off = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = (pw * channels * bitdepth + 7) // 8
            n = ph * (pstride + 1)
            rows = np.frombuffer(
                raw[off : off + n], dtype=np.uint8
            ).reshape(ph, pstride + 1)
            off += n
            sub = _unpack_samples(_unfilter(rows, bpp), ph, pw, channels, bitdepth)
            full[y0::dy, x0::dx, :] = sub.reshape(ph, pw, channels)

    if color == 3:
        idx = samples.reshape(h, w)
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return np.ascontiguousarray(plte[idx])
    if color in (0, 4):
        g = samples.reshape(h, w, channels)[:, :, 0]
        if bitdepth < 8:  # scale 1/2/4-bit gray to full 8-bit range
            g = (g.astype(np.uint16) * (255 // ((1 << bitdepth) - 1))).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(g[:, :, None], 3, axis=2))
    img = samples.reshape(h, w, channels)
    return np.ascontiguousarray(img[:, :, :3])


# ---------------------------------------------------------------------------
# phash: deterministic 64-bit average-hash of decoded pixels (image table's
# `phash:int64` column per BASELINE.json input_hint).
# ---------------------------------------------------------------------------

def phash64(arr: np.ndarray) -> int:
    """Average-hash: grayscale -> 8x8 block means -> threshold by mean ->
    64-bit int (signed, to fit Spark LongType)."""
    g = arr.astype(np.float64).mean(axis=2)
    h, w = g.shape
    bh, bw = h // 8, w // 8
    blocks = g[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).astype(np.uint64).reshape(-1)
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    return int(val.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


# ---------------------------------------------------------------------------
# Deterministic synthetic tile pixels (FIXTURES.md §2): for cell (z,x,y,src)
# P[r,c] = ((x*256+c) ^ (y*256+r) ^ (z*K_src)) & 0xFF per channel with
# per-channel offsets. Decodable/checkable with no stored reference data.
# ---------------------------------------------------------------------------

def synth_tile_pixels(x: int, y: int, z: int, src: int = 0,
                      w: int = 256, h: int = 256) -> np.ndarray:
    cols = (np.int64(x) * w + np.arange(w, dtype=np.int64))[None, :]
    rows = (np.int64(y) * h + np.arange(h, dtype=np.int64))[:, None]
    base = (cols ^ rows ^ np.int64(z * (src * 131 + 7))) & 0xFF
    out = np.empty((h, w, 3), dtype=np.uint8)
    out[:, :, 0] = base.astype(np.uint8)
    out[:, :, 1] = ((base + 85) & 0xFF).astype(np.uint8)
    out[:, :, 2] = ((base + 170) & 0xFF).astype(np.uint8)
    return out
