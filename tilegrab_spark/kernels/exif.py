"""Image metadata kernels — pure-python EXIF (JPEG APP1 / TIFF IFD)
and PNG text-chunk parsing, plus builders for synthesizing tagged
payloads in tests and fixtures.

The interesting curation fields: camera make/model, orientation,
capture time, and — the geospatial crossover — the GPS IFD, whose
degree/minute/second rationals convert to the decimal lon/lat that
``operators.metadata.geotag_cells`` feeds straight into the tile
engine's cell keys. The reference reads pixels via PIL and never looks
at metadata (`/root/reference/src/tilegrab/images/image.py`); this is
an engine extension for multimodal curation (strip-PII-EXIF, geo-join
photo corpora against coverage).

Parsers are defensive: any malformed structure raises ValueError, which
the operator layer surfaces as ``ok=false`` rows (multimodal.py
convention). No external libraries — ``struct`` only.
"""

from __future__ import annotations

import struct
import zlib

__all__ = [
    "parse_jpeg_exif",
    "parse_png_text",
    "build_exif_app1",
    "inject_jpeg_app1",
    "build_png_text_chunk",
    "gps_to_decimal",
    "strip_jpeg_metadata",
    "strip_png_metadata",
]

# TIFF field types -> (struct code, size); type 2 = ASCII, 5/10 = rationals
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

_IFD0_TAGS = {271: "make", 272: "model", 274: "orientation", 306: "datetime"}
_EXIF_PTR, _GPS_PTR = 34665, 34853
_EXIF_TAGS = {36867: "datetime_original", 33434: "exposure_s", 37386: "focal_mm"}
_GPS_TAGS = {
    1: "gps_lat_ref", 2: "gps_lat", 3: "gps_lon_ref", 4: "gps_lon",
    5: "gps_alt_ref", 6: "gps_alt",
}


def _read_value(data: bytes, endian: str, ftype: int, count: int, raw: bytes):
    size = _TYPE_SIZE.get(ftype)
    if size is None or count == 0:
        # unknown type or a zero-count entry (malformed but harmless):
        # skip the value rather than indexing into an empty list
        return None
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(endian + "I", raw)
        if off + total > len(data):
            raise ValueError("EXIF value offset out of bounds")
        buf = data[off : off + total]
    if ftype == 2:
        return buf.split(b"\x00")[0].decode("ascii", "replace")
    if ftype in (1, 7):
        return list(buf) if count > 1 else buf[0]
    code = {3: "H", 4: "I", 9: "i"}.get(ftype)
    if code:
        vals = list(struct.unpack(endian + code * count, buf))
        return vals if count > 1 else vals[0]
    # rationals
    code = "II" if ftype == 5 else "ii"
    vals = []
    for i in range(count):
        n, d = struct.unpack(endian + code, buf[8 * i : 8 * i + 8])
        vals.append((n, d))
    return vals if count > 1 else vals[0]


def _parse_ifd(data: bytes, endian: str, offset: int, tag_names: dict) -> dict:
    if offset + 2 > len(data):
        raise ValueError("IFD offset out of bounds")
    (n,) = struct.unpack_from(endian + "H", data, offset)
    out = {}
    for i in range(n):
        base = offset + 2 + 12 * i
        if base + 12 > len(data):
            raise ValueError("truncated IFD entry")
        tag, ftype, count = struct.unpack_from(endian + "HHI", data, base)
        raw = data[base + 8 : base + 12]
        try:
            val = _read_value(data, endian, ftype, count, raw)
        except struct.error as e:  # malformed count/offset
            raise ValueError(f"malformed EXIF entry tag={tag}") from e
        if tag in (_EXIF_PTR, _GPS_PTR):
            out[tag] = val
        elif tag in tag_names:
            out[tag_names[tag]] = val
    return out


def _rational_list(val):
    """Validate a parsed GPS value as rational pair(s); ValueError on
    any other shape (fuzz contract: malformed EXIF never escapes as a
    non-ValueError exception)."""
    if isinstance(val, tuple):
        val = [val]
    if not isinstance(val, list) or not val or not all(
        isinstance(p, tuple) and len(p) == 2 for p in val
    ):
        raise ValueError("malformed GPS rational")
    return val


def gps_to_decimal(dms, ref: str | None) -> float:
    """[(deg_n, deg_d), (min_n, min_d), (sec_n, sec_d)] + 'N'/'S'/'E'/'W'
    -> signed decimal degrees."""
    parts = []
    for n, d in _rational_list(dms):
        if d == 0:
            raise ValueError("zero denominator in GPS rational")
        parts.append(n / d)
    while len(parts) < 3:
        parts.append(0.0)
    dec = parts[0] + parts[1] / 60.0 + parts[2] / 3600.0
    if ref in ("S", "W"):
        dec = -dec
    return dec


def parse_jpeg_exif(data: bytes) -> dict:
    """Metadata dict from a JPEG's APP1 EXIF segment: make/model/
    orientation/datetime(+original), exposure_s/focal_mm, and decimal
    ``lon``/``lat``/``alt_m`` when a GPS IFD is present. Empty dict when
    the JPEG simply has no APP1; ValueError on malformed structures."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    tiff = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # start of scan — no APP1 before image data
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            tiff = data[pos + 10 : pos + 2 + seglen]
            break
        pos += 2 + seglen
    if tiff is None:
        return {}
    if len(tiff) < 8:
        raise ValueError("truncated TIFF header")
    if tiff[:2] == b"II":
        endian = "<"
    elif tiff[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("bad TIFF byte order")
    magic, ifd0_off = struct.unpack_from(endian + "HI", tiff, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    out = _parse_ifd(tiff, endian, ifd0_off, _IFD0_TAGS)
    exif_off = out.pop(_EXIF_PTR, None)
    gps_off = out.pop(_GPS_PTR, None)
    for ptr in (exif_off, gps_off):
        if ptr is not None and not isinstance(ptr, int):
            raise ValueError("non-integer EXIF sub-IFD pointer")
    if exif_off is not None:
        out.update(_parse_ifd(tiff, endian, int(exif_off), _EXIF_TAGS))
    if gps_off is not None:
        g = _parse_ifd(tiff, endian, int(gps_off), _GPS_TAGS)
        if "gps_lat" in g and "gps_lon" in g:
            out["lat"] = gps_to_decimal(g["gps_lat"], g.get("gps_lat_ref"))
            out["lon"] = gps_to_decimal(g["gps_lon"], g.get("gps_lon_ref"))
        if "gps_alt" in g:
            n, d = _rational_list(g["gps_alt"])[0]
            if d == 0:
                raise ValueError("zero denominator in GPS altitude")
            alt = n / d
            if g.get("gps_alt_ref") == 1:
                alt = -alt
            out["alt_m"] = alt
    return out


_MAX_TEXT_INFLATE = 1 << 22  # 4 MiB cap on a decompressed text chunk


def _inflate_text(blob: bytes) -> bytes:
    """zlib-inflate a PNG text payload with the fuzz contract: corrupt
    streams raise ValueError (never zlib.error) and expansion is capped
    so a tiny hostile chunk can't allocate unbounded memory."""
    d = zlib.decompressobj()
    try:
        out = d.decompress(blob, _MAX_TEXT_INFLATE)
    except zlib.error as e:
        raise ValueError(f"corrupt compressed text chunk: {e}") from e
    if d.unconsumed_tail:
        raise ValueError("compressed text chunk exceeds inflate cap")
    return out


def parse_png_text(data: bytes) -> dict:
    """{key: value} from a PNG's tEXt / zTXt / iTXt chunks (latin-1,
    zlib-deflated latin-1, utf-8 respectively). ValueError on a
    non-PNG signature, truncated chunk stream, or corrupt/oversized
    compressed text (zlib errors are converted, expansion capped)."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, out = 8, {}
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        if tag == b"tEXt":
            k, _, v = body.partition(b"\x00")
            out[k.decode("latin-1")] = v.decode("latin-1")
        elif tag == b"zTXt":
            k, _, rest = body.partition(b"\x00")
            if rest[:1] != b"\x00":
                raise ValueError("unknown zTXt compression method")
            out[k.decode("latin-1")] = _inflate_text(rest[1:]).decode("latin-1")
        elif tag == b"iTXt":
            k, _, rest = body.partition(b"\x00")
            if len(rest) < 2:
                raise ValueError("truncated iTXt header")
            comp_flag, comp_method = rest[0], rest[1]
            rest = rest[2:]
            _lang, _, rest = rest.partition(b"\x00")
            _trans, _, text = rest.partition(b"\x00")
            if comp_flag:
                if comp_method != 0:
                    raise ValueError("unknown iTXt compression method")
                text = _inflate_text(text)
            out[k.decode("latin-1")] = text.decode("utf-8")
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + payload + crc
    return out


# ---------------------------------------------------------------------------
# Builders (tests + fixture synthesis) — minimal, single-IFD-chain writer.
# ---------------------------------------------------------------------------


def _deg_to_dms(dec: float):
    dec = abs(dec)
    d = int(dec)
    m = int((dec - d) * 60)
    s = round(((dec - d) * 60 - m) * 60 * 1_000_000)
    return [(d, 1), (m, 1), (s, 1_000_000)]


def build_exif_app1(
    *,
    make: str | None = None,
    model: str | None = None,
    orientation: int | None = None,
    datetime: str | None = None,
    lon: float | None = None,
    lat: float | None = None,
    alt_m: float | None = None,
    endian: str = "<",
) -> bytes:
    """A complete APP1 segment (marker + length + Exif header + TIFF)
    carrying the given fields; ``endian`` '<' (II) or '>' (MM)."""
    if endian not in ("<", ">"):
        raise ValueError("endian must be '<' or '>'")

    def entries_bytes(entries, data_base, trailer=b""):
        # entries: list of (tag, ftype, count, payload_bytes)
        n = len(entries)
        table = struct.pack(endian + "H", n)
        heap = b""
        heap_off = data_base + 2 + 12 * n + 4 + len(trailer)
        for tag, ftype, count, payload in sorted(entries):
            table += struct.pack(endian + "HHI", tag, ftype, count)
            if len(payload) <= 4:
                table += payload.ljust(4, b"\x00")
            else:
                table += struct.pack(endian + "I", heap_off + len(heap))
                heap += payload
        return table + struct.pack(endian + "I", 0) + trailer + heap

    def ascii_e(tag, s):
        b = s.encode("ascii") + b"\x00"
        return (tag, 2, len(b), b)

    def short_e(tag, v):
        return (tag, 3, 1, struct.pack(endian + "H", v))

    def long_e(tag, v):
        return (tag, 4, 1, struct.pack(endian + "I", v))

    def rat_e(tag, pairs):
        b = b"".join(struct.pack(endian + "II", n, d) for n, d in pairs)
        return (tag, 5, len(pairs), b)

    def byte_e(tag, v):
        return (tag, 1, 1, bytes([v]))

    gps_entries = []
    if lat is not None and lon is not None:
        gps_entries += [
            ascii_e(1, "N" if lat >= 0 else "S"),
            rat_e(2, _deg_to_dms(lat)),
            ascii_e(3, "E" if lon >= 0 else "W"),
            rat_e(4, _deg_to_dms(lon)),
        ]
    if alt_m is not None:
        gps_entries += [byte_e(5, 0 if alt_m >= 0 else 1),
                        rat_e(6, [(round(abs(alt_m) * 100), 100)])]

    ifd0 = []
    if make is not None:
        ifd0.append(ascii_e(271, make))
    if model is not None:
        ifd0.append(ascii_e(272, model))
    if orientation is not None:
        ifd0.append(short_e(274, orientation))
    if datetime is not None:
        ifd0.append(ascii_e(306, datetime))

    # layout: header(8) | IFD0 | GPS IFD — compute GPS offset after IFD0 size
    if gps_entries:
        ifd0_probe = ifd0 + [long_e(_GPS_PTR, 0)]
        probe = entries_bytes(ifd0_probe, 8)
        gps_off = 8 + len(probe)
        ifd0 = ifd0 + [long_e(_GPS_PTR, gps_off)]
        tiff_body = entries_bytes(ifd0, 8) + entries_bytes(gps_entries, gps_off)
    else:
        tiff_body = entries_bytes(ifd0, 8)
    tiff = (b"II" if endian == "<" else b"MM") + struct.pack(endian + "HI", 42, 8) + tiff_body
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def inject_jpeg_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI in an existing JPEG."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]


def build_png_text_chunk(key: str, value: str, *, kind: str = "tEXt") -> bytes:
    """A tEXt / zTXt / iTXt chunk (with CRC) for appending before IEND."""
    k = key.encode("latin-1")
    if kind == "tEXt":
        body = k + b"\x00" + value.encode("latin-1")
    elif kind == "zTXt":
        body = k + b"\x00\x00" + zlib.compress(value.encode("latin-1"))
    elif kind == "iTXt":
        body = k + b"\x00\x00\x00" + b"\x00" + b"\x00" + value.encode("utf-8")
    else:
        raise ValueError(f"unknown chunk kind {kind!r}")
    tag = kind.encode("ascii")
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def strip_jpeg_metadata(data: bytes) -> bytes:
    """The JPEG with all APP1..APP15 and COM segments removed (EXIF,
    XMP, ICC, comments — everything PII-bearing); APP0/JFIF and all
    coding segments pass through, so decoded pixels are unchanged."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    out = bytearray(b"\xff\xd8")
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[pos + 1]
        if marker == 0xDA:  # start of scan: copy the rest verbatim
            out += data[pos:]
            return bytes(out)
        if 0xD0 <= marker <= 0xD9 or marker == 0x01:  # standalone
            out += data[pos : pos + 2]
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG segment")
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos : pos + 2 + seglen]
        if len(seg) < 2 + seglen:
            raise ValueError("truncated JPEG segment")
        keep = not (0xE1 <= marker <= 0xEF or marker == 0xFE)
        if keep:
            out += seg
        pos += 2 + seglen
    return bytes(out)


_PNG_META_CHUNKS = {b"tEXt", b"zTXt", b"iTXt", b"eXIf", b"tIME"}


def strip_png_metadata(data: bytes) -> bytes:
    """The PNG with text / EXIF / timestamp chunks removed; pixel
    chunks (IHDR/PLTE/IDAT/IEND and ancillary display chunks) pass
    through byte-identically."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    out = bytearray(data[:8])
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        end = pos + 12 + length
        if end > len(data):
            raise ValueError("truncated PNG chunk")
        if tag not in _PNG_META_CHUNKS:
            out += data[pos:end]
        if tag == b"IEND":
            break
        pos = end
    return bytes(out)
