"""Pure-numpy lossless WebP (VP8L) codec.

The reference gets webp for free from PIL (images/image.py:28); this
container has no image library, so the engine carries its own decoder,
implemented from the public *WebP Lossless Bitstream Specification*
(https://developers.google.com/speed/webp/docs/webp_lossless_bitstream_specification).

Decoder coverage (the full VP8L feature set):
- RIFF/WEBP container, VP8L chunk, 14-bit dimension header
- canonical prefix (huffman) codes: "simple" 1-2 symbol form and the
  code-length-coded form with 16/17/18 repeat codes and the max_symbol
  shortcut
- LZ77 backward references with the 2D distance mapping (codes 1..120
  map to a pixel neighborhood)
- color cache (1..11 bit indices, updated on every emitted pixel)
- meta prefix codes (entropy image selecting per-block code groups)
- all four transforms, inverted in reverse order: PREDICTOR (14 modes),
  COLOR (cross-channel deltas), SUBTRACT_GREEN, COLOR_INDEXING
  (palette, including sub-byte pixel bundling at sizes <=16)

Encoder: a deliberately small but spec-valid subset used by the
round-trip tests and ``encode_webp`` callers — single prefix-code
group, literals only (no LZ77/cache/transforms), code-length-coded
huffman trees built from the image's actual symbol histograms. Real
decoders (libwebp/PIL) accept such streams; our decoder accepts real
encoders' streams.

Lossy WebP (VP8) is NOT implemented — that is a full video-intra codec;
such payloads raise ValueError and route to the n_bad/decode_ok=False
paths like every other unreadable stream.
"""

from __future__ import annotations

import struct

import numpy as np

# order in which code-length-code lengths are stored (spec §"Decoding
# the Code Lengths" — same trick as DEFLATE)
_CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# 2D offsets for distance codes 1..120 (spec §"Distance Mapping"):
# (dx, dy) pairs ordered by increasing euclidean-ish distance.
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


class _LsbBitReader:
    """VP8L packs bits LSB-first within bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("VP8L bitstream underflow")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("VP8L bitstream underflow")
        b = (self.data[byte] >> (self.pos & 7)) & 1
        self.pos += 1
        return b

    def peek(self, n: int) -> int:
        """Next n (<= 25) bits without consuming; past-the-end bits read
        as zero (callers validate symbol length against the stream)."""
        byte = self.pos >> 3
        chunk = int.from_bytes(self.data[byte : byte + 4].ljust(4, b"\0"), "little")
        return (chunk >> (self.pos & 7)) & ((1 << n) - 1)


class _LsbBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int):
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Canonical prefix codes (DEFLATE convention, as VP8L specifies: codes
# assigned in symbol order within each length; the bitstream carries the
# code MSB-first via per-bit reads).
# ---------------------------------------------------------------------------

def _canonical_codes(lengths: list[int]) -> dict:
    """{(length, code): symbol} for nonzero lengths."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    table = {}
    for sym, ln in enumerate(lengths):
        if ln:
            table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
    return table


class _PrefixCode:
    def __init__(self, lengths: list[int]):
        nz = [i for i, ln in enumerate(lengths) if ln]
        if len(nz) == 1:
            # degenerate: single symbol, zero bits read
            self.single = nz[0]
            self.table = None
        else:
            self.single = None
            self.table = _canonical_codes(lengths)
            if not self.table:
                raise ValueError("empty prefix code")

    @classmethod
    def of_single(cls, symbol: int):
        pc = cls.__new__(cls)
        pc.single = symbol
        pc.table = None
        return pc

    @classmethod
    def of_pair(cls, s0: int, s1: int):
        pc = cls.__new__(cls)
        pc.single = None
        pc.table = {(1, 0): s0, (1, 1): s1}
        return pc

    def read(self, br: _LsbBitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad VP8L prefix code")

    def _try_build_lut(self) -> bool:
        """One-shot (sym << 4 | len) lookup table over max_len peeked
        bits. The stream carries code bits MSB-of-code-first, so the LUT
        index is the BIT-REVERSED code padded with every suffix. ~3-4x
        over per-bit walks in the pixel loop. Built LAZILY on first read
        and charged against a per-decode budget — a hostile stream
        declaring thousands of meta groups with deep codes must not be
        able to force unbounded table allocation before a single pixel
        decodes (it falls back to per-bit reads instead)."""
        max_len = max(ln for ln, _code in self.table)
        size = 1 << max_len
        budget = getattr(self, "lut_budget", None)
        if budget is None or budget[0] < size:
            self.lut_declined = True
            return False
        budget[0] -= size
        lut = np.zeros(size, dtype=np.int32)
        for (ln, code), sym in self.table.items():
            rev = int(f"{code:0{ln}b}"[::-1], 2)
            step = 1 << ln
            lut[rev::step] = (sym << 4) | ln
        self.lut = lut
        self.lut_bits = max_len
        return True

    def read_lut(self, br: _LsbBitReader) -> int:
        if self.single is not None:
            return self.single
        if getattr(self, "lut", None) is None:
            if getattr(self, "lut_declined", False) or not self._try_build_lut():
                return self.read(br)
        v = int(self.lut[br.peek(self.lut_bits)])
        if v == 0:
            raise ValueError("bad VP8L prefix code")
        br.pos += v & 15
        if br.pos > len(br.data) * 8:
            raise ValueError("VP8L bitstream underflow")
        return v >> 4


def _read_prefix_code(br: _LsbBitReader, alphabet_size: int) -> _PrefixCode:
    if br.bit():  # simple code
        num_symbols = br.bit() + 1
        if br.bit():  # first symbol is 8 bits
            s0 = br.bits(8)
        else:
            s0 = br.bit()
        if num_symbols == 1:
            return _PrefixCode.of_single(s0)
        s1 = br.bits(8)
        return _PrefixCode.of_pair(s0, s1)
    # code-length-coded
    num_code_lengths = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.bits(3)
    cl_code = _PrefixCode(cl_lengths)
    # optional cap on the number of coded symbols
    if br.bit():
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        sym = cl_code.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            for _ in range(3 + br.bits(2)):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif sym == 17:
            i += 3 + br.bits(3)
        else:  # 18
            i += 11 + br.bits(7)
    return _PrefixCode(lengths)


def _read_prefix_value(br: _LsbBitReader, code: int) -> int:
    """LZ77 length/distance prefix decoding (spec §"LZ77 Backward
    Reference"): codes 0-3 are literal values 1-4; beyond that, extra
    bits scale geometrically."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


# ---------------------------------------------------------------------------
# Entropy-coded image decode (the core shared by the main image, the
# transform sub-images and the entropy image).
# ---------------------------------------------------------------------------

def _color_cache_hash(argb: int, bits: int) -> int:
    return ((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - bits)


def _decode_entropy_image(
    br: _LsbBitReader, w: int, h: int, *, allow_meta: bool
) -> np.ndarray:
    """Decode a (h, w, 4) uint8 ARGB-channel image: [:, :, 0]=alpha,
    1=red, 2=green, 3=blue (stored per spec as green/red/blue/alpha
    prefix codes)."""
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"bad color cache bits {cache_bits}")
    meta = None
    block_bits = 0
    num_groups = 1
    if allow_meta and br.bit():
        block_bits = 2 + br.bits(3)
        mw = (w + (1 << block_bits) - 1) >> block_bits
        mh = (h + (1 << block_bits) - 1) >> block_bits
        meta = _decode_entropy_image(br, mw, mh, allow_meta=False)
        # meta group index = (red << 8) | green
        meta_idx = (meta[:, :, 1].astype(np.int32) << 8) | meta[:, :, 2]
        num_groups = int(meta_idx.max()) + 1
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        g = _read_prefix_code(br, green_alpha)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))

    cache = [0] * (1 << cache_bits) if cache_bits else None
    out = np.zeros(w * h, dtype=np.uint32)  # packed ARGB
    pos = 0
    total = w * h
    # large images amortize per-code LUTs (single multi-bit peek per
    # symbol instead of a per-bit tree walk); tables build lazily on
    # first use against a shared ~16 MB budget (hostile many-group
    # streams degrade to per-bit reads instead of allocating)
    readf = _PrefixCode.read
    if total >= 4096:
        lut_budget = [1 << 22]
        for grp in groups:
            for c in grp:
                c.lut_budget = lut_budget
        readf = _PrefixCode.read_lut
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            gi = int(meta_idx[y >> block_bits, x >> block_bits])
            gcode, rcode, bcode, acode, dcode = groups[gi]
        else:
            gcode, rcode, bcode, acode, dcode = groups[0]
        sym = readf(gcode, br)
        if sym < 256:
            g = sym
            r = readf(rcode, br)
            b = readf(bcode, br)
            a = readf(acode, br)
            argb = (a << 24) | (r << 16) | (g << 8) | b
            out[pos] = argb
            if cache is not None:
                cache[_color_cache_hash(argb, cache_bits)] = argb
            pos += 1
        elif sym < 256 + 24:
            length = _read_prefix_value(br, sym - 256)
            dist_code = _read_prefix_value(br, readf(dcode, br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > total:
                raise ValueError("bad VP8L backward reference")
            for i in range(length):
                argb = int(out[pos - dist])
                out[pos] = argb
                if cache is not None:
                    cache[_color_cache_hash(argb, cache_bits)] = argb
                pos += 1
        else:
            if cache is None:
                raise ValueError("cache symbol without color cache")
            argb = cache[sym - 256 - 24]
            out[pos] = argb
            cache[_color_cache_hash(argb, cache_bits)] = argb
            pos += 1
    img = np.zeros((h, w, 4), dtype=np.uint8)
    flat = out.reshape(h, w)
    img[:, :, 0] = (flat >> 24) & 0xFF  # alpha
    img[:, :, 1] = (flat >> 16) & 0xFF  # red
    img[:, :, 2] = (flat >> 8) & 0xFF   # green
    img[:, :, 3] = flat & 0xFF          # blue
    return img


# ---------------------------------------------------------------------------
# Inverse transforms.
# ---------------------------------------------------------------------------

def _avg2(a, b):
    return (int(a) + int(b)) >> 1


def _clamp_add_subtract_full(a, b, c):
    v = int(a) + int(b) - int(c)
    return 0 if v < 0 else 255 if v > 255 else v


def _clamp_add_subtract_half(a, b):
    d = int(a) - int(b)
    # C division truncates toward zero (libwebp ClampAddSubtractHalf);
    # Python // floors — they differ for negative odd d
    v = int(a) + (d // 2 if d >= 0 else -((-d) // 2))
    return 0 if v < 0 else 255 if v > 255 else v


def _apply_predictor_inverse(img: np.ndarray, modes: np.ndarray, block_bits: int):
    """In-place inverse of the predictor transform — the fast path.

    Row at a time: modes whose prediction reads only the PREVIOUS row
    (2=T, 3=TR, 4=TL, 8=avg(TL,T), 9=avg(T,TR)) and mode 0 (black)
    vectorize across each constant-mode block span; mode 1 (L) is a
    cumulative sum along x; only the L-and-up modes (5,6,7,10-13) fall
    back to the per-pixel scalar step. Real libwebp output leans heavily
    on modes 0-4, so corpus decode stays out of interpreted per-pixel
    Python almost everywhere. Equivalence with the scalar reference
    (_apply_predictor_inverse_scalar) over ALL 14 modes is pinned by
    test_webp."""
    h, w, _ = img.shape
    bs = 1 << block_bits
    for y in range(h):
        if y == 0:
            # border rule: (0,0) predicts from ARGB black, rest of row 0
            # is Left-predicted -> whole row is a cumsum with a black seed
            row = img[0].astype(np.uint32)
            row[0, 0] += 255  # alpha of the black pixel
            img[0] = np.cumsum(row, axis=0).astype(np.uint8)
            continue
        prev = img[y - 1].astype(np.int64)
        T = prev
        TL = np.empty_like(prev)
        TL[1:] = prev[:-1]
        TL[0] = prev[0]  # unused at x=0 (border rule) — any value
        TR = np.empty_like(prev)
        TR[:-1] = prev[1:]
        x = 0
        while x < w:
            if x == 0:
                # border rule: x=0 predicts from T regardless of mode
                img[y, 0] = ((img[y, 0].astype(np.int64) + T[0]) & 0xFF).astype(
                    np.uint8
                )
                # rightmost-column TR is the CURRENT row's leftmost pixel
                # (libwebp reads argb[pos - width + 1], which at x = w-1
                # is argb[y*width] — decoded just above)
                TR[-1] = img[y, 0].astype(np.int64)
                x = 1
                continue
            mode = int(modes[y >> block_bits, x >> block_bits])
            # span of constant mode: to the end of this block row
            end = min(w, ((x >> block_bits) + 1) << block_bits)
            if mode == 0:
                black = np.array([255, 0, 0, 0], dtype=np.int64)
                img[y, x:end] = (
                    (img[y, x:end].astype(np.int64) + black) & 0xFF
                ).astype(np.uint8)
            elif mode == 1:  # L: cumsum seeded by the pixel before the span
                seed = img[y, x - 1].astype(np.uint32)
                span = img[y, x:end].astype(np.uint32)
                span[0] += seed
                img[y, x:end] = np.cumsum(span, axis=0).astype(np.uint8)
            elif mode == 2:
                img[y, x:end] = (
                    (img[y, x:end].astype(np.int64) + T[x:end]) & 0xFF
                ).astype(np.uint8)
            elif mode == 3:
                img[y, x:end] = (
                    (img[y, x:end].astype(np.int64) + TR[x:end]) & 0xFF
                ).astype(np.uint8)
            elif mode == 4:
                img[y, x:end] = (
                    (img[y, x:end].astype(np.int64) + TL[x:end]) & 0xFF
                ).astype(np.uint8)
            elif mode == 8:
                pred = (TL[x:end] + T[x:end]) >> 1
                img[y, x:end] = (
                    (img[y, x:end].astype(np.int64) + pred) & 0xFF
                ).astype(np.uint8)
            elif mode == 9:
                pred = (T[x:end] + TR[x:end]) >> 1
                img[y, x:end] = (
                    (img[y, x:end].astype(np.int64) + pred) & 0xFF
                ).astype(np.uint8)
            else:
                for xi in range(x, end):
                    _predict_scalar_step(img, T, TL, TR, y, xi, mode)
            x = end


def _predict_scalar_step(img, T, TL, TR, y, x, mode):
    """One serial inverse-predictor step for the L-dependent modes."""
    L = img[y, x - 1].astype(np.int64)
    if mode == 5:
        pred = np.array(
            [_avg2(_avg2(L[i], TR[x][i]), T[x][i]) for i in range(4)], np.int64
        )
    elif mode == 6:
        pred = np.array([_avg2(L[i], TL[x][i]) for i in range(4)], np.int64)
    elif mode == 7:
        pred = np.array([_avg2(L[i], T[x][i]) for i in range(4)], np.int64)
    elif mode == 10:
        pred = np.array(
            [
                _avg2(_avg2(L[i], TL[x][i]), _avg2(T[x][i], TR[x][i]))
                for i in range(4)
            ],
            np.int64,
        )
    elif mode == 11:  # Select
        p = L + T[x] - TL[x]
        pl = int(np.abs(p - L).sum())
        pt = int(np.abs(p - T[x]).sum())
        pred = L if pl < pt else T[x]
    elif mode == 12:
        pred = np.array(
            [_clamp_add_subtract_full(L[i], T[x][i], TL[x][i]) for i in range(4)],
            np.int64,
        )
    elif mode == 13:
        pred = np.array(
            [
                _clamp_add_subtract_half(_avg2(L[i], T[x][i]), TL[x][i])
                for i in range(4)
            ],
            np.int64,
        )
    else:
        raise ValueError(f"bad predictor mode {mode}")
    img[y, x] = ((img[y, x].astype(np.int64) + pred) & 0xFF).astype(np.uint8)


def _apply_predictor_inverse_scalar(img: np.ndarray, modes: np.ndarray, block_bits: int):
    """Scalar reference implementation (spec §4.1 transcribed literally;
    kept as the equivalence oracle for the vectorized fast path)."""
    h, w, _ = img.shape
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int64)  # ARGB black
            elif y == 0:
                pred = img[0, x - 1].astype(np.int64)  # L
            elif x == 0:
                pred = img[y - 1, 0].astype(np.int64)  # T
            else:
                mode = int(modes[y >> block_bits, x >> block_bits])
                L = img[y, x - 1].astype(np.int64)
                T = img[y - 1, x].astype(np.int64)
                TL = img[y - 1, x - 1].astype(np.int64)
                TR = (
                    img[y - 1, x + 1].astype(np.int64)
                    if x + 1 < w
                    else img[y, 0].astype(np.int64)  # current row's leftmost
                )
                if mode == 0:
                    pred = np.array([255, 0, 0, 0], dtype=np.int64)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = np.array(
                        [_avg2(_avg2(L[i], TR[i]), T[i]) for i in range(4)], np.int64
                    )
                elif mode == 6:
                    pred = np.array([_avg2(L[i], TL[i]) for i in range(4)], np.int64)
                elif mode == 7:
                    pred = np.array([_avg2(L[i], T[i]) for i in range(4)], np.int64)
                elif mode == 8:
                    pred = np.array([_avg2(TL[i], T[i]) for i in range(4)], np.int64)
                elif mode == 9:
                    pred = np.array([_avg2(T[i], TR[i]) for i in range(4)], np.int64)
                elif mode == 10:
                    pred = np.array(
                        [_avg2(_avg2(L[i], TL[i]), _avg2(T[i], TR[i])) for i in range(4)],
                        np.int64,
                    )
                elif mode == 11:  # Select
                    p = L + T - TL
                    pl = int(np.abs(p - L).sum())
                    pt = int(np.abs(p - T).sum())
                    pred = L if pl < pt else T
                elif mode == 12:
                    pred = np.array(
                        [_clamp_add_subtract_full(L[i], T[i], TL[i]) for i in range(4)],
                        np.int64,
                    )
                elif mode == 13:
                    pred = np.array(
                        [
                            _clamp_add_subtract_half(_avg2(L[i], T[i]), TL[i])
                            for i in range(4)
                        ],
                        np.int64,
                    )
                else:
                    raise ValueError(f"bad predictor mode {mode}")
            img[y, x] = ((img[y, x].astype(np.int64) + pred) & 0xFF).astype(np.uint8)


def _color_delta(t: int, c: int) -> int:
    """Signed (t * c) >> 5 per spec §4.2 (both as int8)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _apply_color_transform_inverse(img: np.ndarray, elems: np.ndarray, block_bits: int):
    """Fully vectorized (no spatial dependency — blue depends only on
    the same pixel's NEW red). Per libwebp ColorCodeToMultipliers:
    green_to_red rides the BLUE channel of the transform element,
    green_to_blue the GREEN, red_to_blue the RED; deltas are
    (int8(t) * int8(c)) >> 5 with arithmetic shift."""
    h, w, _ = img.shape
    ey = np.arange(h) >> block_bits
    ex = np.arange(w) >> block_bits
    E = elems[ey][:, ex]  # (h, w, 4) per-pixel transform elements
    g2r = E[:, :, 3].astype(np.int8).astype(np.int32)
    g2b = E[:, :, 2].astype(np.int8).astype(np.int32)
    r2b = E[:, :, 1].astype(np.int8).astype(np.int32)
    g = img[:, :, 2].astype(np.int8).astype(np.int32)
    r = (img[:, :, 1].astype(np.int32) + ((g2r * g) >> 5)) & 0xFF
    rs = r.astype(np.uint8).astype(np.int8).astype(np.int32)
    b = (
        img[:, :, 3].astype(np.int32) + ((g2b * g) >> 5) + ((r2b * rs) >> 5)
    ) & 0xFF
    img[:, :, 1] = r.astype(np.uint8)
    img[:, :, 3] = b.astype(np.uint8)


def _apply_color_transform_inverse_scalar(
    img: np.ndarray, elems: np.ndarray, block_bits: int
):
    """Scalar reference (equivalence oracle for the vectorized path)."""
    h, w, _ = img.shape
    for y in range(h):
        for x in range(w):
            e = elems[y >> block_bits, x >> block_bits]
            g2r, g2b, r2b = int(e[3]), int(e[2]), int(e[1])
            a, r, g, b = (int(v) for v in img[y, x])
            r = (r + _color_delta(g2r, g)) & 0xFF
            b = (b + _color_delta(g2b, g) + _color_delta(r2b, r)) & 0xFF
            img[y, x, 1] = r
            img[y, x, 3] = b


def decode_webp(data: bytes) -> np.ndarray:
    """Decode a WebP — lossless (VP8L, this module) or lossy (VP8 key
    frame, kernels/vp8.py) — to (H, W, 3) uint8 RGB (alpha dropped:
    forced-RGB canvas like the other decoders). Malformed streams raise
    ValueError."""
    try:
        return _decode_webp(data)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed WebP stream: {e}") from e


def _decode_webp(data: bytes) -> np.ndarray:
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP header missing)")
    fourcc = data[12:16]
    if fourcc == b"VP8 ":
        from tilegrab_spark.kernels import vp8

        (size,) = struct.unpack_from("<I", data, 16)
        return vp8.decode_vp8(data[20 : 20 + size])
    if fourcc == b"VP8X":
        # extended container: scan chunks for VP8L
        pos = 12
        payload = None
        while pos + 8 <= len(data):
            tag = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            if tag == b"VP8L":
                payload = data[pos + 8 : pos + 8 + size]
                break
            if tag == b"VP8 ":
                from tilegrab_spark.kernels import vp8

                return vp8.decode_vp8(data[pos + 8 : pos + 8 + size])
            pos += 8 + size + (size & 1)
        if payload is None:
            raise ValueError("no VP8L chunk in extended WebP")
    elif fourcc == b"VP8L":
        (size,) = struct.unpack_from("<I", data, 16)
        payload = data[20 : 20 + size]
    else:
        raise ValueError(f"unknown WebP chunk {fourcc!r}")

    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _LsbBitReader(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")

    # transforms (stored in application order; inverted in reverse)
    transforms = []
    xsize = w
    while br.bit():
        ttype = br.bits(2)
        if ttype in (0, 1):  # PREDICTOR / COLOR
            block_bits = 2 + br.bits(3)
            bw = (xsize + (1 << block_bits) - 1) >> block_bits
            bh = (h + (1 << block_bits) - 1) >> block_bits
            sub = _decode_entropy_image(br, bw, bh, allow_meta=False)
            transforms.append((ttype, block_bits, sub))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append((2, None, None))
        elif ttype == 3:  # COLOR_INDEXING
            n_colors = br.bits(8) + 1
            pal_img = _decode_entropy_image(br, n_colors, 1, allow_meta=False)
            # palette entries are delta-coded against the previous entry
            pal = pal_img[0].astype(np.int32)
            pal = np.cumsum(pal, axis=0).astype(np.uint8)
            if n_colors <= 2:
                bundle_bits = 3  # 8 pixels per byte
            elif n_colors <= 4:
                bundle_bits = 2
            elif n_colors <= 16:
                bundle_bits = 1
            else:
                bundle_bits = 0
            transforms.append((3, bundle_bits, pal))
            if bundle_bits:
                xsize = (xsize + (1 << bundle_bits) - 1) >> bundle_bits

    img = _decode_entropy_image(br, xsize, h, allow_meta=True)

    for ttype, arg, sub in reversed(transforms):
        if ttype == 3:  # color indexing
            bundle_bits, pal = arg, sub
            if bundle_bits:
                ppb = 1 << bundle_bits  # pixels per packed byte
                ibits = 8 >> bundle_bits  # bits per index
                packed = img[:, :, 2]  # indices ride the green channel
                idx = np.zeros((h, img.shape[1] * ppb), dtype=np.uint8)
                for k in range(ppb):
                    idx[:, k::ppb] = (packed >> (k * ibits)) & ((1 << ibits) - 1)
                idx = idx[:, :w]
            else:
                idx = img[:, :, 2][:, :w]
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("palette index out of range")
            img = pal[idx]  # (h, w, 4) ARGB rows from the palette image
        elif ttype == 2:  # subtract green: add green back to red & blue
            g = img[:, :, 2].astype(np.uint16)
            img[:, :, 1] = ((img[:, :, 1] + g) & 0xFF).astype(np.uint8)
            img[:, :, 3] = ((img[:, :, 3] + g) & 0xFF).astype(np.uint8)
        elif ttype == 1:  # color transform
            _apply_color_transform_inverse(img, sub, arg)
        elif ttype == 0:  # predictor
            # modes ride the green channel of the sub-image
            _apply_predictor_inverse(img, sub[:, :, 2], arg)

    # ARGB (a,r,g,b) channel planes -> RGB
    return np.ascontiguousarray(img[:, :, [1, 2, 3]])


# ---------------------------------------------------------------------------
# Subset encoder (literals-only, single group, real huffman trees).
# ---------------------------------------------------------------------------

def _huffman_lengths(freqs: np.ndarray, max_len: int = 15) -> list[int]:
    """Optimal length-limited code lengths via package-merge. Always
    yields a COMPLETE prefix code (kraft sum exactly 1) — strict
    decoders (libwebp, libjpeg) reject incomplete codes, so a clamp+
    patch approach is not an option."""
    nz = [(int(f), i) for i, f in enumerate(freqs) if f > 0]
    out = [0] * len(freqs)
    if not nz:
        return out
    if len(nz) == 1:
        out[nz[0][1]] = 1
        return out
    if len(nz) > (1 << max_len):
        raise ValueError("alphabet too large for max code length")
    items = sorted((f, (i,)) for f, i in nz)
    level = []
    for _ in range(max_len):
        merged = sorted(level + items, key=lambda t: t[0])
        level = [
            (a[0] + b[0], a[1] + b[1])
            for a, b in zip(merged[0::2], merged[1::2])
        ]
    # the optimal solution takes the first n-1 packages of the top level
    for _w, syms in level[: len(nz) - 1]:
        for sym in syms:
            out[sym] += 1
    return out


def _write_prefix_code(bw: _LsbBitWriter, lengths: list[int]):
    nz = [i for i, ln in enumerate(lengths) if ln]
    if len(nz) <= 2 and all(s < 256 for s in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        if len(nz) == 1 and nz[0] <= 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(nz[0], 1)
        else:
            bw.write(1, 1)  # 8-bit first symbol
            bw.write(nz[0], 8)
        if len(nz) == 2:
            bw.write(nz[1], 8)
        return
    bw.write(0, 1)  # code-length-coded
    # lengths of the code-length code: every used value coded in 3 bits;
    # emit ALL 19 slots (num_code_lengths = 19)
    cl_freq = np.zeros(19, dtype=np.int64)
    for ln in lengths:
        cl_freq[ln] += 1
    cl_lengths = _huffman_lengths(cl_freq, max_len=7)
    bw.write(19 - 4, 4)
    for sym in _CODE_LENGTH_ORDER:
        bw.write(cl_lengths[sym], 3)
    # no max_symbol shortcut
    bw.write(0, 1)
    if sum(1 for l in cl_lengths if l) == 1:
        # single-symbol code-length code: decoders read it with ZERO
        # bits per length — emit nothing (all lengths are that symbol)
        return
    enc = _canonical_encode_table(cl_lengths)
    for ln in lengths:
        code, n = enc[ln]
        _write_code_msb(bw, code, n)


def _canonical_encode_table(lengths: list[int]) -> dict:
    table = _canonical_codes(lengths)
    return {sym: (code, ln) for (ln, code), sym in table.items()}


def _write_code_msb(bw: _LsbBitWriter, code: int, nbits: int):
    """Prefix codes are read bit-by-bit MSB-of-code-first."""
    for i in range(nbits - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def encode_webp(arr: np.ndarray) -> bytes:
    """Encode (H,W,3) uint8 RGB as a lossless VP8L WebP (literals-only
    subset: real huffman trees, no LZ77/transforms — valid per spec,
    larger than libwebp's output but exactly decodable)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected (H,W,3) uint8, got {arr.shape} {arr.dtype}")
    h, w, _ = arr.shape
    if w > 1 << 14 or h > 1 << 14:
        raise ValueError("VP8L dimension limit is 16384")
    bw = _LsbBitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no (more) transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes

    r = arr[:, :, 0].reshape(-1)
    g = arr[:, :, 1].reshape(-1)
    b = arr[:, :, 2].reshape(-1)
    gfreq = np.zeros(256 + 24, dtype=np.int64)
    np.add.at(gfreq, g, 1)
    codes = {
        "g": _huffman_lengths(gfreq),
        "r": _huffman_lengths(np.bincount(r, minlength=256)),
        "b": _huffman_lengths(np.bincount(b, minlength=256)),
        "a": [0] * 255 + [1],  # constant alpha 255: single-symbol code
        "d": [1] + [0] * 39,  # unused distance code (single symbol)
    }
    for key in ("g", "r", "b", "a", "d"):
        _write_prefix_code(bw, codes[key])
    # single-symbol codes cost ZERO bits on read — emit nothing for them
    def emitter(lengths):
        if sum(1 for ln in lengths if ln) <= 1:
            return None
        return _canonical_encode_table(lengths)

    enc_g = emitter(codes["g"])
    enc_r = emitter(codes["r"])
    enc_b = emitter(codes["b"])
    for i in range(w * h):
        for enc, v in ((enc_g, g[i]), (enc_r, r[i]), (enc_b, b[i])):
            if enc is not None:
                c, n = enc[int(v)]
                _write_code_msb(bw, c, n)
        # alpha is always the single-symbol 255 code: zero bits
    payload = b"\x2f" + bw.flush()
    riff = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        riff += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WEBP" + riff
