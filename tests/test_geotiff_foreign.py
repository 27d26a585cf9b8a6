"""Foreign-TIFF breadth for kernels/geotiff.read_geotiff (VERDICT r2
#7): fixtures here are built by an INDEPENDENT mini-writer (its own LZW
and PackBits compressors, big-endian layout, multi-strip, predictor) so
the decoder is exercised against bytes our own encoder never produces."""

import struct

import numpy as np
import pytest

from tilegrab_spark.kernels import geotiff

BOUNDS = (8971261.135774568, 809009.5073703043, 8973707.120679691, 811455.4922754318)


# --------------------------- independent writer ---------------------------


def _lzw_encode(data: bytes) -> bytes:
    """Plain TIFF LZW compressor (early change), written independently
    of the kernel's decoder."""
    out = []
    bitbuf, bitcnt = 0, 0

    def emit(code, width):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            bitcnt -= 8
            out.append((bitbuf >> bitcnt) & 0xFF)

    CLEAR, EOI = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    s = b""
    for ch in data:
        c = bytes([ch])
        if s + c in table:
            s += c
            continue
        emit(table[s], width)
        table[s + c] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:  # early change
            width += 1
        elif next_code >= (1 << 12) - 1:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        s = c
    if s:
        emit(table[s], width)
    emit(EOI, width)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes((257 - run, data[i]))
            i += run
        else:
            j = i + 1
            while (
                j < len(data) and j - i < 128
                and not (j + 1 < len(data) and data[j] == data[j + 1])
            ):
                j += 1
            out += bytes((j - i - 1,)) + data[i:j]
            i = j
    return bytes(out)


def _foreign_tiff(arr, *, endian, compression, rows_per_strip, predictor=1,
                  geo=True, photometric=2):
    """Big- or little-endian baseline TIFF, multi-strip, optionally
    LZW/PackBits + horizontal predictor.  Layout: header | strips |
    out-of-line arrays | IFD (IFD-last, unlike the kernel writer)."""
    en = ">" if endian == "MM" else "<"
    h, w = arr.shape[:2]
    spp = 1 if arr.ndim == 2 else arr.shape[2]
    flat = arr if arr.ndim == 3 else arr[:, :, None]
    strips = []
    for r0 in range(0, h, rows_per_strip):
        rows = flat[r0:r0 + rows_per_strip]
        if predictor == 2:
            d = rows.astype(np.int16)
            d[:, 1:] -= rows[:, :-1].astype(np.int16)
            rows = (d % 256).astype(np.uint8)
        raw = rows.tobytes()
        if compression == 5:
            strips.append(_lzw_encode(raw))
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        else:
            strips.append(raw)

    pos = 8
    strip_offs = []
    body = bytearray()
    for s in strips:
        strip_offs.append(pos)
        body += s
        pos += len(s)

    deferred = bytearray()

    def defer(payload):
        nonlocal pos
        off = pos
        deferred.extend(payload)
        pos += len(payload)
        return off

    nstrips = len(strips)
    entries = []

    def entry(tag, typ, values):
        fmt = {3: "H", 4: "I", 12: "d"}[typ]
        size = {3: 2, 4: 4, 12: 8}[typ]
        payload = struct.pack(en + f"{len(values)}{fmt}", *values)
        if len(payload) <= 4:
            raw = payload.ljust(4, b"\0")
        else:
            raw = struct.pack(en + "I", defer(payload))
        entries.append((tag, typ, len(values), raw))

    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [8] * spp)
    entry(259, 3, [compression])
    entry(262, 3, [photometric])
    entry(273, 4, strip_offs)
    entry(277, 3, [spp])
    entry(278, 4, [rows_per_strip])
    entry(279, 4, [len(s) for s in strips])
    entry(284, 3, [1])
    if predictor != 1:
        entry(317, 3, [predictor])
    if geo:
        xmin, ymin, xmax, ymax = BOUNDS
        entry(33550, 12, [(xmax - xmin) / w, (ymax - ymin) / h, 0.0])
        entry(33922, 12, [0.0, 0.0, 0.0, xmin, ymax, 0.0])
        entry(34735, 3, [1, 1, 0, 3, 1024, 0, 1, 1, 1025, 0, 1, 1,
                         3072, 0, 1, 3857])

    # deferred payloads may have grown while being appended; recompute
    # nothing — offsets were assigned sequentially as we deferred
    ifd_off = pos
    ifd = struct.pack(en + "H", len(entries))
    for tag, typ, count, raw in sorted(entries):
        ifd += struct.pack(en + "HHI", tag, typ, count) + raw
    ifd += struct.pack(en + "I", 0)
    header = (endian.encode() if isinstance(endian, str) else endian)
    header += struct.pack(en + "HI", 42, ifd_off)
    return bytes(header) + bytes(body) + bytes(deferred) + ifd


def _fixture(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, (xx + yy) % 256], -1
    ).astype(np.uint8)


# ------------------------------- tests -------------------------------


@pytest.mark.parametrize("endian", ["II", "MM"])
@pytest.mark.parametrize("compression,predictor", [
    (1, 1), (5, 1), (5, 2), (32773, 1),
])
def test_foreign_tiff_decodes_with_golden_bounds(endian, compression, predictor):
    arr = _fixture()
    data = _foreign_tiff(arr, endian=endian, compression=compression,
                         rows_per_strip=7, predictor=predictor)
    got, bounds, epsg = geotiff.read_geotiff(data)
    assert np.array_equal(got, arr)
    assert epsg == 3857
    assert np.allclose(bounds, BOUNDS, atol=1e-6)


def test_foreign_grayscale_expands_to_rgb():
    g = (np.arange(32 * 48, dtype=np.uint64).reshape(32, 48) % 251).astype(np.uint8)
    data = _foreign_tiff(g, endian="MM", compression=5, rows_per_strip=5,
                         photometric=1)
    got, _, _ = geotiff.read_geotiff(data)
    assert got.shape == (32, 48, 3)
    assert np.array_equal(got[:, :, 0], g)
    assert np.array_equal(got[:, :, 1], g)


def test_foreign_tiff_without_geotags_gets_pixel_bounds():
    arr = _fixture(16, 16)
    data = _foreign_tiff(arr, endian="II", compression=1, rows_per_strip=16,
                         geo=False)
    got, bounds, epsg = geotiff.read_geotiff(data)
    assert np.array_equal(got, arr)
    assert bounds == (0.0, 0.0, 16.0, 16.0) and epsg == 0


def test_own_writer_still_roundtrips():
    arr = _fixture(24, 24)
    got, bounds, epsg = geotiff.read_geotiff(geotiff.encode_geotiff(arr, BOUNDS))
    assert np.array_equal(got, arr) and epsg == 3857
    assert np.allclose(bounds, BOUNDS)


def test_malformed_tiffs_raise_valueerror():
    arr = _fixture(16, 16)
    good = _foreign_tiff(arr, endian="II", compression=5, rows_per_strip=4)
    for bad in (
        b"XX" + good[2:],                 # bad byte-order mark
        good[:40],                        # truncated IFD
        good[:2] + struct.pack("<H", 43) + good[4:],  # bad magic
    ):
        with pytest.raises(ValueError):
            geotiff.read_geotiff(bad)
    # dimension bomb
    big = bytearray(good)
    # rewrite ImageWidth entry value via a fresh fixture with huge dims
    with pytest.raises(ValueError, match="decode cap"):
        huge = _foreign_tiff(np.zeros((1, 1, 3), np.uint8), endian="II",
                             compression=1, rows_per_strip=1)
        hb = bytearray(huge)
        # ImageWidth/Length live in the IFD at the end; patch both LONG
        # values to 2^15 * 2^15
        i = hb.rfind(struct.pack("<HHI", 256, 4, 1))
        struct.pack_into("<I", hb, i + 8, 1 << 15)
        j = hb.rfind(struct.pack("<HHI", 257, 4, 1))
        struct.pack_into("<I", hb, j + 8, 1 << 15)
        geotiff.read_geotiff(bytes(hb))


def test_foreign_tiff_with_ascii_tags_still_parses():
    """Real TIFFs carry ASCII tags (DateTime, Software) — unsupported
    tag TYPES are skipped, never fatal."""
    arr = _fixture(16, 16)
    data = bytearray(_foreign_tiff(arr, endian="II", compression=1,
                                   rows_per_strip=16))
    # splice an ASCII tag (306 DateTime) into the IFD: bump the entry
    # count and append an inline-valued entry before the next-IFD ptr
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    entry = struct.pack("<HHI4s", 306, 2, 4, b"2026")
    insert_at = ifd_off + 2 + n * 12
    data2 = bytes(data[:ifd_off]) + struct.pack("<H", n + 1) \
        + bytes(data[ifd_off + 2:insert_at]) + entry + bytes(data[insert_at:])
    got, _, epsg = geotiff.read_geotiff(data2)
    assert np.array_equal(got, arr) and epsg == 3857
