"""Minimal pure-stdlib GeoTIFF writer (8-bit RGB, uncompressed, single
strip) with EPSG:3857 georeferencing — the S7 sink (reference
images/exporter.py:47-74 uses rasterio's GTiff driver with
``transform=from_bounds(...)`` and ``crs=EPSG:3857``; rasterio isn't in
this sandbox, so the engine writes the same bytes itself).

Tags written (all a standard GeoTIFF reader needs):
- baseline TIFF: width/length, 8x3 bits, uncompressed, RGB, one strip
- ModelPixelScaleTag (33550): (sx, sy, 0) from bounds/size
- ModelTiepointTag  (33922): raster (0,0,0) -> model (xmin, ymax, 0)
- GeoKeyDirectoryTag (34735): ModelType=Projected, RasterType=PixelIsArea,
  ProjectedCSTypeGeoKey=3857 (WGS 84 / Pseudo-Mercator)

A matching reader (`read_geotiff`) exists for round-trip tests and for
re-ingesting exported rasters.
"""

from __future__ import annotations

import struct

import numpy as np

_II = b"II"  # little-endian
# TIFF types
_SHORT, _LONG, _DOUBLE = 3, 4, 12


def _entry(tag: int, typ: int, count: int, value_or_offset: int) -> bytes:
    return struct.pack("<HHII", tag, typ, count, value_or_offset)


def encode_geotiff(
    arr: np.ndarray,
    bounds: tuple[float, float, float, float],
    *,
    epsg: int = 3857,
) -> bytes:
    """Encode (H, W, 3) uint8 pixels + model bounds (xmin, ymin, xmax,
    ymax) into a georeferenced TIFF."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected (H,W,3) uint8, got {arr.shape} {arr.dtype}")
    h, w, _ = arr.shape
    xmin, ymin, xmax, ymax = (float(v) for v in bounds)
    sx = (xmax - xmin) / w
    sy = (ymax - ymin) / h

    pixels = arr.tobytes()
    n_entries = 13
    # layout: header(8) | IFD | out-of-line data | pixel strip
    ifd_off = 8
    ifd_size = 2 + n_entries * 12 + 4
    data_off = ifd_off + ifd_size

    out_of_line = []

    def _defer(payload: bytes) -> int:
        nonlocal data_off
        off = data_off
        out_of_line.append(payload)
        data_off += len(payload)
        return off

    bits_off = _defer(struct.pack("<HHH", 8, 8, 8))
    scale_off = _defer(struct.pack("<3d", sx, sy, 0.0))
    tiepoint_off = _defer(struct.pack("<6d", 0.0, 0.0, 0.0, xmin, ymax, 0.0))
    # GeoKeyDirectory: version 1.1.0, 3 keys, all SHORT values inline
    geokeys = struct.pack(
        "<16H",
        1, 1, 0, 3,
        1024, 0, 1, 1,      # GTModelTypeGeoKey = Projected
        1025, 0, 1, 1,      # GTRasterTypeGeoKey = PixelIsArea
        3072, 0, 1, epsg,   # ProjectedCSTypeGeoKey
    )
    geokeys_off = _defer(geokeys)
    strip_off = data_off

    entries = b"".join(
        [
            _entry(256, _LONG, 1, w),                 # ImageWidth
            _entry(257, _LONG, 1, h),                 # ImageLength
            _entry(258, _SHORT, 3, bits_off),         # BitsPerSample
            _entry(259, _SHORT, 1, 1),                # Compression = none
            _entry(262, _SHORT, 1, 2),                # Photometric = RGB
            _entry(273, _LONG, 1, strip_off),         # StripOffsets
            _entry(277, _SHORT, 1, 3),                # SamplesPerPixel
            _entry(278, _LONG, 1, h),                 # RowsPerStrip
            _entry(279, _LONG, 1, len(pixels)),       # StripByteCounts
            _entry(284, _SHORT, 1, 1),                # PlanarConfig = chunky
            _entry(33550, _DOUBLE, 3, scale_off),     # ModelPixelScale
            _entry(33922, _DOUBLE, 6, tiepoint_off),  # ModelTiepoint
            _entry(34735, _SHORT, 16, geokeys_off),   # GeoKeyDirectory
        ]
    )
    header = _II + struct.pack("<HI", 42, ifd_off)
    ifd = struct.pack("<H", n_entries) + entries + struct.pack("<I", 0)
    return header + ifd + b"".join(out_of_line) + pixels


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 12: "d"}


def _tag_values(data: bytes, en: str, typ: int, count: int, raw: bytes) -> list:
    """Decode one IFD entry's values (inline if they fit in the 4-byte
    value field, else at the offset it holds)."""
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise ValueError(f"unsupported TIFF type {typ}")
    total = size * count
    if total <= 4:
        payload = raw[:total]
    else:
        (off,) = struct.unpack(en + "I", raw)
        payload = data[off:off + total]
        if len(payload) < total:
            raise ValueError("TIFF tag payload truncated")
    if typ == 5:  # RATIONAL
        vals = struct.unpack(en + f"{2 * count}I", payload)
        return [vals[i] / max(vals[i + 1], 1) for i in range(0, len(vals), 2)]
    return list(struct.unpack(en + f"{count}{_TYPE_FMT[typ]}", payload))


def _lzw_decode(buf: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (MSB-first codes, 9->12 bits, EARLY code-width
    change): Clear=256, EOI=257. Output bounded by `expected`."""
    out = bytearray()
    CLEAR, EOI = 256, 257
    bitpos = 0
    nbits = len(buf) * 8
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None
    while bitpos + width <= nbits and len(out) < expected:
        byte = bitpos >> 3
        shift = bitpos & 7
        v = int.from_bytes(buf[byte:byte + 3].ljust(3, b"\0"), "big")
        code = (v >> (24 - shift - width)) & ((1 << width) - 1)
        bitpos += width
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if not table:
            raise ValueError("LZW data before Clear code")
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("bad LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # TIFF early change, decoder side: the table lags the encoder by
        # one entry (the encoder defines a string when it EMITS a code,
        # the decoder when it reads the NEXT one), so bump when the
        # encoder's next_code (= len(table)+1) hits 2^w - 1
        if len(table) + 1 >= (1 << width) - 1 and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("LZW strip shorter than expected")
    return bytes(out[:expected])


def _packbits_decode(buf: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(buf) and len(out) < expected:
        n = buf[i]
        i += 1
        if n < 128:
            out += buf[i:i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(buf):
                raise ValueError("PackBits run truncated")
            out += buf[i:i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("PackBits strip shorter than expected")
    return bytes(out[:expected])


def read_geotiff(data: bytes) -> tuple[np.ndarray, tuple, int]:
    """Parse a baseline TIFF — ours or third-party (VERDICT r2 #7):
    either endianness, single- or multi-strip, Compression none/LZW/
    PackBits, horizontal predictor, chunky RGB or grayscale (expanded
    to the engine's forced-RGB canvas), 8 bits/sample.  Returns
    (pixels, (xmin, ymin, xmax, ymax), epsg); TIFFs without geotags get
    pixel-space bounds (0, 0, w, h) and epsg 0."""
    try:
        return _read_geotiff(data)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed TIFF: {e}") from e


def _read_geotiff(data: bytes) -> tuple[np.ndarray, tuple, int]:
    if data[:2] == b"II":
        en = "<"
    elif data[:2] == b"MM":
        en = ">"
    else:
        raise ValueError("not a TIFF (no II/MM byte-order mark)")
    if struct.unpack_from(en + "H", data, 2)[0] != 42:
        raise ValueError("bad TIFF magic")
    (ifd_off,) = struct.unpack_from(en + "I", data, 4)
    (n,) = struct.unpack_from(en + "H", data, ifd_off)
    tags: dict[int, list] = {}
    for i in range(n):
        base = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack_from(en + "HHI", data, base)
        if typ not in _TYPE_FMT and typ != 5:
            # ASCII (DateTime/Software/...), SBYTE..SRATIONAL etc: real
            # TIFFs carry these freely — skip, never fail the parse
            continue
        tags[tag] = _tag_values(data, en, typ, count, data[base + 8:base + 12])

    def one(tag: int, default=None):
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"required TIFF tag {tag} missing")
        return default

    w, h = int(one(256)), int(one(257))
    if w * h > 1 << 28:
        raise ValueError("TIFF canvas exceeds the 2^28-pixel decode cap")
    spp = int(one(277, 1))
    photometric = int(one(262, 1))
    if photometric not in (0, 1, 2) or spp not in (1, 3):
        raise ValueError(f"unsupported TIFF photometric={photometric} spp={spp}")
    bits = tags.get(258, [8])
    if any(int(b) != 8 for b in bits):
        raise ValueError("only 8 bits/sample supported")
    if int(one(284, 1)) != 1:
        raise ValueError("planar TIFF not supported")
    compression = int(one(259, 1))
    predictor = int(one(317, 1))
    rows_per_strip = int(one(278, h))
    offsets = [int(v) for v in tags[273]]
    counts = [int(v) for v in tags[279]]
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")

    row_bytes = w * spp
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        if nrows <= 0:
            raise ValueError("more strips than image rows")
        expected = nrows * row_bytes
        strip = data[off:off + cnt]
        if len(strip) < cnt:
            raise ValueError("strip data truncated")
        if compression == 1:
            if len(strip) < expected:
                raise ValueError("uncompressed strip shorter than expected")
            raw += strip[:expected]
        elif compression == 5:
            raw += _lzw_decode(strip, expected)
        elif compression == 32773:
            raw += _packbits_decode(strip, expected)
        else:
            raise ValueError(f"unsupported TIFF compression {compression}")

    arr = np.frombuffer(bytes(raw), np.uint8).reshape(h, w, spp)
    if predictor == 2:
        arr = np.add.accumulate(arr, axis=1, dtype=np.uint8)
    elif predictor != 1:
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if photometric == 0:  # WhiteIsZero
        arr = 255 - arr
    if spp == 1:
        arr = np.repeat(arr, 3, axis=2)

    if 33550 in tags and 33922 in tags:
        sx, sy = float(tags[33550][0]), float(tags[33550][1])
        xmin, ymax = float(tags[33922][3]), float(tags[33922][4])
        bounds = (xmin, ymax - sy * h, xmin + sx * w, ymax)
    else:
        bounds = (0.0, 0.0, float(w), float(h))
    epsg = 0
    gk = tags.get(34735, [])
    for j in range(4, len(gk) - 3, 4):
        if int(gk[j]) == 3072:
            epsg = int(gk[j + 3])
    return np.ascontiguousarray(arr), bounds, epsg
