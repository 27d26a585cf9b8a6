"""Pure-python/numpy GIF codec (GIF87a / GIF89a).

Web-crawled training corpora are full of GIFs — the one common web
image format the engine's multimodal path lacked (PNG/JPEG/WebP are
covered by their own kernels).  Built from scratch to the public
GIF89a specification: logical screen descriptor, global/local color
tables, variable-width LSB-first LZW with dictionary resets, the
4-pass interlace, and the Graphic Control Extension (transparency,
frame delay, disposal methods 1/2/3) for animations.

``decode_gif`` returns the FIRST frame composited on the canvas as
(H, W, 3) uint8 — the shape the image operators consume.
``decode_gif_frames`` yields every composited frame plus its delay for
the video-style ``sample_frames`` path.  The LZW inner loop is a
per-code python loop over C-level bytes concatenations (the dictionary
is capped at 4096 entries by the format, so memory stays bounded);
everything after the index stream is vectorized numpy.

Same fuzz contract as the other codecs: corrupt streams raise
ValueError promptly (never another exception class), and the canvas /
total-frame-pixel caps bound hostile allocations.

The reference (a tile downloader delegating to PIL,
/root/reference/src/tilegrab/images/image.py) reads GIFs through PIL;
this module is the from-spec equivalent for the no-PIL runtime.
"""

from __future__ import annotations

import struct

import numpy as np

_PIXEL_CAP = 1 << 28          # per-canvas, matches the PNG/JPEG caps
_TOTAL_PIXEL_CAP = 1 << 30    # across all frames of one animation

__all__ = ["decode_gif", "decode_gif_frames", "encode_gif", "is_gif"]


def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


class _ByteStream:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.data[self.pos: self.pos + n]
        if len(b) < n:
            raise ValueError("truncated GIF stream")
        self.pos += n
        return b

    def u8(self) -> int:
        return self.read(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.read(2))[0]

    def sub_blocks(self) -> bytes:
        """Concatenate data sub-blocks up to the 0x00 terminator."""
        parts = []
        while True:
            n = self.u8()
            if n == 0:
                return b"".join(parts)
            parts.append(self.read(n))


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Variable-width LSB-first GIF LZW -> uint8 index array of exactly
    n_pixels (extra codes past the pixel count are ignored, a short
    stream raises)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()

    # bit accumulator over the concatenated sub-block bytes
    acc = 0
    acc_bits = 0
    pos = 0
    n = len(data)

    width = min_code_size + 1
    chains: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None

    while len(out) < n_pixels:
        while acc_bits < width:
            if pos >= n:
                raise ValueError("LZW stream ended before the pixel count")
            acc |= data[pos] << acc_bits
            acc_bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        acc_bits -= width

        if code == clear:
            chains = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(chains):
                raise ValueError("LZW first code out of range")
            entry = chains[code]
        elif code < len(chains):
            entry = chains[code]
            if len(chains) < 4096:
                chains.append(prev + entry[:1])
        elif code == len(chains) and len(chains) < 4096:
            entry = prev + prev[:1]
            chains.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
        if len(chains) == (1 << width) and width < 12:
            width += 1

    if len(out) < n_pixels:
        raise ValueError("LZW produced fewer pixels than the frame declares")
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        n_rows = len(range(start, h, step))
        out[start::step] = rows[src: src + n_rows]
        src += n_rows
    return out.reshape(-1)


def _read_color_table(s: _ByteStream, packed: int) -> np.ndarray | None:
    if not packed & 0x80:
        return None
    n = 2 << (packed & 0x07)
    return np.frombuffer(s.read(3 * n), np.uint8).reshape(n, 3)


def decode_gif_frames(data: bytes):
    """[(frame (H,W,3) uint8, delay_ms)] — every frame composited on
    the logical canvas with GIF89a disposal semantics."""
    if not is_gif(data):
        raise ValueError("not a GIF stream")
    s = _ByteStream(data)
    s.read(6)
    cw, ch = s.u16(), s.u16()
    packed = s.u8()
    s.read(2)  # background color index + aspect (bg used only pre-frame)
    if cw < 1 or ch < 1:
        raise ValueError("empty GIF canvas")
    if cw * ch > _PIXEL_CAP:
        raise ValueError("GIF canvas exceeds the 2^28-pixel decode cap")
    gct = _read_color_table(s, packed)

    canvas = np.zeros((ch, cw, 3), np.uint8)
    if gct is not None:
        canvas[:] = gct[0]  # matte the canvas in a deterministic color
    frames = []
    transparent = None
    delay_ms = 0
    disposal = 0
    total_px = 0

    while True:
        block = s.u8()
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = s.u8()
            if label == 0xF9:  # graphic control
                body = s.sub_blocks()
                if len(body) >= 4:
                    flags = body[0]
                    delay_ms = struct.unpack("<H", body[1:3])[0] * 10
                    transparent = body[3] if flags & 1 else None
                    disposal = (flags >> 2) & 0x07
            else:  # comment / plain text / application: skip
                s.sub_blocks()
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")

        fx, fy, fw, fh = s.u16(), s.u16(), s.u16(), s.u16()
        fpacked = s.u8()
        if fw < 1 or fh < 1 or fx + fw > cw or fy + fh > ch:
            raise ValueError("GIF frame outside the logical canvas")
        total_px += fw * fh
        if total_px > _TOTAL_PIXEL_CAP:
            raise ValueError("GIF animation exceeds the total pixel cap")
        lct = _read_color_table(s, fpacked)
        table = lct if lct is not None else gct
        if table is None:
            raise ValueError("GIF frame has no color table")
        mcs = s.u8()
        idx = _lzw_decode(s.sub_blocks(), mcs, fw * fh)
        if fpacked & 0x40:
            idx = _deinterlace(idx, fw, fh)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF pixel index outside the color table")

        region = canvas[fy: fy + fh, fx: fx + fw]
        saved = region.copy() if disposal == 3 else None
        rgb = table[idx.reshape(fh, fw)]
        if transparent is not None:
            mask = (idx.reshape(fh, fw) != transparent)[..., None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append((canvas.copy(), delay_ms))

        if disposal == 2:  # restore to background (transparent-black
            # per modern renderers; the matte keeps it deterministic)
            region[:] = gct[0] if gct is not None else 0
        elif disposal == 3 and saved is not None:
            region[:] = saved
        transparent = None
        disposal = 0
        delay_ms = 0

    if not frames:
        raise ValueError("GIF contains no image frames")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """(H, W, 3) uint8 — the first frame composited on the canvas."""
    return decode_gif_frames(data)[0][0]


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1

    out = bytearray()
    acc = 0
    acc_bits = 0

    def emit(code: int):
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += width
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    emit(clear)
    seq = b""
    for v in indices.tobytes():
        nxt = seq + bytes([v])
        if nxt in table:
            seq = nxt
            continue
        emit(table[seq])
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        seq = bytes([v])
    if seq:
        emit(table[seq])
    emit(end)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray, *, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 with <= 256 distinct colors -> single-frame
    GIF89a (fixture writer; exact palette, no quantization)."""
    img = np.asarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_gif expects (H, W, 3) uint8")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    bits = max(1, int(len(palette) - 1).bit_length())
    size_field = bits - 1
    table = np.zeros((2 << size_field, 3), np.uint8)
    table[: len(palette)] = palette

    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = []
        for start, step in _INTERLACE_PASSES:
            rows.append(idx[start::step])
        idx = np.concatenate(rows, axis=0)

    mcs = max(2, bits)
    lzw = _lzw_encode(idx.reshape(-1), mcs)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0)
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(0x3B)
    return bytes(out)
