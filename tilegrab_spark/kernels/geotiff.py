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


def read_geotiff(data: bytes) -> tuple[np.ndarray, tuple, int]:
    """Parse a TIFF written by encode_geotiff (or any single-strip,
    uncompressed, chunky RGB little-endian TIFF with the same geotags).
    Returns (pixels, (xmin, ymin, xmax, ymax), epsg)."""
    if data[:4] != _II + struct.pack("<H", 42)[:2] + b"":
        if data[:2] != _II or struct.unpack("<H", data[2:4])[0] != 42:
            raise ValueError("not a little-endian TIFF")
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n):
        tag, typ, count, val = struct.unpack_from("<HHII", data, ifd_off + 2 + i * 12)
        tags[tag] = (typ, count, val)
    w, h = tags[256][2], tags[257][2]
    strip_off, strip_len = tags[273][2], tags[279][2]
    if tags[259][2] != 1:
        raise ValueError("compressed TIFF not supported")
    arr = np.frombuffer(data, np.uint8, count=strip_len, offset=strip_off).reshape(
        h, w, 3
    )
    sx, sy, _ = struct.unpack_from("<3d", data, tags[33550][2])
    _, _, _, xmin, ymax, _ = struct.unpack_from("<6d", data, tags[33922][2])
    bounds = (xmin, ymax - sy * h, xmin + sx * w, ymax)
    epsg = 0
    gk = struct.unpack_from(f"<{tags[34735][1]}H", data, tags[34735][2])
    for j in range(4, len(gk), 4):
        if gk[j] == 3072:
            epsg = gk[j + 3]
    return arr.copy(), bounds, epsg
