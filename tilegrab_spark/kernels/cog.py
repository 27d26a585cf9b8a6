"""Cloud-Optimized GeoTIFF (COG) writer/reader — pure stdlib + numpy.

The plain GeoTIFF sink (kernels/geotiff.py, reference
images/exporter.py:47-74) writes one uncompressed strip: fine for a
desktop GIS, wrong for object-store serving at 100 TB where clients
range-read a handful of tiles out of a multi-GB raster.  The COG layout
(public spec, cogeo.org / OGC 21-026) fixes that with three structural
rules this module implements and `validate_cog_layout` enforces:

1. **Tiled organization** — TileWidth/TileLength/TileOffsets/
   TileByteCounts (tags 322/323/324/325) instead of strips, so a bbox
   read touches O(bbox) bytes, not O(rows).
2. **Internal overviews** — each 2:1 reduced-resolution level is a
   chained IFD with NewSubfileType=1 (tag 254), so zoomed-out renders
   read the small level, never the full raster.
3. **Header-first metadata, overview-first data** — every IFD (and all
   out-of-line tag payloads) precedes all tile data, and tile data is
   laid out coarsest level first, each level's tiles in row-major
   order with strictly ascending offsets.  A client bootstraps from one
   small header range-read and renders progressively.

Tiles are deflate-compressed (Compression=8, zlib — stdlib) with the
horizontal-difference predictor (tag 317 = 2), the same combination
GDAL's COG driver defaults to.  Georeferencing mirrors geotiff.py:
ModelPixelScale + ModelTiepoint + a 3-key GeoKeyDirectory on IFD0
(overview IFDs inherit georeferencing from the full-resolution IFD per
the spec, so they carry none).

Edge tiles are padded to the full tile size (TIFF requires it); the
reader crops by ImageWidth/ImageLength, and `encode_cog` pads with the
edge pixel replicated (not zeros) so overview averaging never bleeds
black into real data.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SHORT, _LONG, _DOUBLE = 3, 4, 12
_DEFAULT_TILE = 256


def _entry(tag: int, typ: int, count: int, value_or_offset: int) -> bytes:
    return struct.pack("<HHII", tag, typ, count, value_or_offset)


def downsample2x(arr: np.ndarray) -> np.ndarray:
    """2:1 block-mean reduction (odd trailing row/col edge-replicated
    first so the mean is over real pixels) — matches the pyramid
    operator's box filter (operators/pyramid.py)."""
    h, w = arr.shape[:2]
    if h & 1:
        arr = np.concatenate([arr, arr[-1:]], axis=0)
        h += 1
    if w & 1:
        arr = np.concatenate([arr, arr[:, -1:]], axis=1)
        w += 1
    return (
        arr.reshape(h // 2, 2, w // 2, 2, 3)
        .mean(axis=(1, 3))
        .astype(np.uint8)
    )


def _tile_grid(arr: np.ndarray, tile: int) -> list[bytes]:
    """Deflate-compressed row-major tiles, edge tiles padded by edge
    replication, horizontal-difference predictor applied."""
    h, w = arr.shape[:2]
    tiles = []
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            block = arr[ty:ty + tile, tx:tx + tile]
            bh, bw = block.shape[:2]
            if bh < tile or bw < tile:
                block = np.pad(
                    block, ((0, tile - bh), (0, tile - bw), (0, 0)), mode="edge"
                )
            # predictor=2: delta along the row axis, per sample
            pred = block.astype(np.int16)
            pred[:, 1:] -= block[:, :-1].astype(np.int16)
            tiles.append(zlib.compress(pred.astype(np.uint8).tobytes(), 6))
    return tiles


def build_overviews(
    arr: np.ndarray, *, tile: int = _DEFAULT_TILE, min_dim: int = 0
) -> list[np.ndarray]:
    """Halve until the raster fits one tile (or `min_dim`).  Returns the
    reduced levels only (full resolution excluded), finest first."""
    floor = max(min_dim, 1)
    levels = []
    cur = arr
    while max(cur.shape[0], cur.shape[1]) > max(tile, floor):
        cur = downsample2x(cur)
        levels.append(cur)
    return levels


def encode_cog(
    arr: np.ndarray,
    bounds: tuple[float, float, float, float],
    *,
    epsg: int = 3857,
    tile: int = _DEFAULT_TILE,
    overviews: list[np.ndarray] | None = None,
) -> bytes:
    """Encode (H, W, 3) uint8 pixels + model bounds (xmin, ymin, xmax,
    ymax) into a Cloud-Optimized GeoTIFF.  `overviews` defaults to
    repeated 2:1 block-mean reduction down to one tile; pass an explicit
    list (finest first, each ~half the previous) to reuse pyramid-
    operator output."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected (H,W,3) uint8, got {arr.shape} {arr.dtype}")
    if tile % 16 != 0 or tile <= 0:
        raise ValueError("TIFF tile size must be a positive multiple of 16")
    if overviews is None:
        overviews = build_overviews(arr, tile=tile)
    levels = [arr] + list(overviews)
    for i in range(1, len(levels)):
        ph, pw = levels[i - 1].shape[:2]
        lh, lw = levels[i].shape[:2]
        if not ((ph + 1) // 2 == lh and (pw + 1) // 2 == lw):
            raise ValueError(
                f"overview {i} is {lh}x{lw}, expected 2:1 of {ph}x{pw}"
            )

    xmin, ymin, xmax, ymax = (float(v) for v in bounds)
    sx = (xmax - xmin) / arr.shape[1]
    sy = (ymax - ymin) / arr.shape[0]

    level_tiles = [_tile_grid(lv, tile) for lv in levels]

    # ---- plan the metadata block (everything before any tile data) ----
    # per-IFD entry counts: 12 base tags, plus 3 geo tags on IFD0 or
    # NewSubfileType on overviews.
    def _n_entries(i: int) -> int:
        return 15 if i == 0 else 13

    pos = 8
    ifd_off = []
    for i in range(len(levels)):
        ifd_off.append(pos)
        pos += 2 + _n_entries(i) * 12 + 4
    # out-of-line payloads: BitsPerSample (shared), geo doubles/keys,
    # then per-IFD TileOffsets/TileByteCounts arrays.
    bits_off = pos
    pos += 6
    scale_off = pos
    pos += 24
    tiepoint_off = pos
    pos += 48
    geokeys_off = pos
    pos += 32
    arr_off = []  # (tile_offsets_pos, tile_counts_pos) per level
    for tiles in level_tiles:
        n = len(tiles)
        off_pos = pos
        pos += 4 * n
        cnt_pos = pos
        pos += 4 * n
        arr_off.append((off_pos, cnt_pos))

    # ---- lay out tile data: coarsest level first, row-major within ----
    data_start = pos
    tile_offsets: list[list[int]] = [None] * len(levels)  # type: ignore
    cursor = data_start
    for li in range(len(levels) - 1, -1, -1):
        offs = []
        for t in level_tiles[li]:
            offs.append(cursor)
            cursor += len(t)
        tile_offsets[li] = offs

    # ---- emit ----
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off[0])
    for i, lv in enumerate(levels):
        h, w = lv.shape[:2]
        n_tiles = len(level_tiles[i])
        entries = []
        if i > 0:
            entries.append(_entry(254, _LONG, 1, 1))  # NewSubfileType=reduced
        entries += [
            _entry(256, _LONG, 1, w),
            _entry(257, _LONG, 1, h),
            _entry(258, _SHORT, 3, bits_off),
            _entry(259, _SHORT, 1, 8),            # deflate
            _entry(262, _SHORT, 1, 2),            # RGB
            _entry(277, _SHORT, 1, 3),
            _entry(284, _SHORT, 1, 1),
            _entry(317, _SHORT, 1, 2),            # horizontal predictor
            _entry(322, _LONG, 1, tile),
            _entry(323, _LONG, 1, tile),
        ]
        if n_tiles == 1:
            entries.append(_entry(324, _LONG, 1, tile_offsets[i][0]))
            entries.append(_entry(325, _LONG, 1, len(level_tiles[i][0])))
        else:
            entries.append(_entry(324, _LONG, n_tiles, arr_off[i][0]))
            entries.append(_entry(325, _LONG, n_tiles, arr_off[i][1]))
        if i == 0:
            entries += [
                _entry(33550, _DOUBLE, 3, scale_off),
                _entry(33922, _DOUBLE, 6, tiepoint_off),
                _entry(34735, _SHORT, 16, geokeys_off),
            ]
        entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
        assert len(entries) == _n_entries(i)
        nxt = ifd_off[i + 1] if i + 1 < len(levels) else 0
        assert len(out) == ifd_off[i]
        out += struct.pack("<H", len(entries)) + b"".join(entries)
        out += struct.pack("<I", nxt)

    assert len(out) == bits_off
    out += struct.pack("<HHH", 8, 8, 8)
    out += struct.pack("<3d", sx, sy, 0.0)
    out += struct.pack("<6d", 0.0, 0.0, 0.0, xmin, ymax, 0.0)
    out += struct.pack(
        "<16H",
        1, 1, 0, 3,
        1024, 0, 1, 1,
        1025, 0, 1, 1,
        3072, 0, 1, epsg,
    )
    for i, tiles in enumerate(level_tiles):
        out += struct.pack(f"<{len(tiles)}I", *tile_offsets[i])
        out += struct.pack(f"<{len(tiles)}I", *(len(t) for t in tiles))
    assert len(out) == data_start
    for li in range(len(levels) - 1, -1, -1):
        for t in level_tiles[li]:
            out += t
    return bytes(out)


# ---------------------------------------------------------------- reader


def _read_ifd(data: bytes, en: str, ifd_off: int):
    from tilegrab_spark.kernels.geotiff import _TYPE_FMT, _tag_values

    (n,) = struct.unpack_from(en + "H", data, ifd_off)
    tags: dict[int, list] = {}
    for i in range(n):
        base = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack_from(en + "HHI", data, base)
        if typ not in _TYPE_FMT and typ != 5:
            continue
        tags[tag] = _tag_values(data, en, typ, count, data[base + 8:base + 12])
    (nxt,) = struct.unpack_from(en + "I", data, ifd_off + 2 + n * 12)
    return tags, nxt


def decode_tile(
    raw: bytes, tw: int, tl: int, compression: int, predictor: int
) -> np.ndarray:
    """Decode one compressed tile payload into its full (tl, tw, 3)
    uint8 block (edge tiles are padded at encode time — crop by the
    caller's knowledge of the raster dims).  Deflate expansion is capped
    at one tile's size so a zlib bomb can never allocate beyond it."""
    expected = tw * tl * 3
    if compression == 8:
        # decompressobj + max_length caps a zlib bomb at one tile
        buf = zlib.decompressobj().decompress(raw, expected)
    elif compression == 1:
        buf = raw
    else:
        raise ValueError(f"unsupported tile compression {compression}")
    if len(buf) < expected:
        raise ValueError("tile shorter than expected")
    block = np.frombuffer(buf[:expected], np.uint8).reshape(tl, tw, 3)
    if predictor == 2:
        block = np.add.accumulate(block, axis=1, dtype=np.uint8)
    elif predictor != 1:
        raise ValueError(f"unsupported predictor {predictor}")
    return block


def _decode_tiled_ifd(data: bytes, en: str, tags: dict) -> np.ndarray:
    w, h = int(tags[256][0]), int(tags[257][0])
    if w * h > 1 << 28:
        raise ValueError("TIFF canvas exceeds the 2^28-pixel decode cap")
    tw, tl = int(tags[322][0]), int(tags[323][0])
    spp = int(tags.get(277, [1])[0])
    if spp != 3 or any(int(b) != 8 for b in tags.get(258, [8])):
        raise ValueError("COG reader supports 8-bit RGB only")
    compression = int(tags.get(259, [1])[0])
    predictor = int(tags.get(317, [1])[0])
    offsets = [int(v) for v in tags[324]]
    counts = [int(v) for v in tags[325]]
    tiles_x = (w + tw - 1) // tw
    tiles_y = (h + tl - 1) // tl
    if len(offsets) != tiles_x * tiles_y or len(counts) != len(offsets):
        raise ValueError("TileOffsets/TileByteCounts length mismatch")
    canvas = np.zeros((tiles_y * tl, tiles_x * tw, 3), np.uint8)
    for idx, (off, cnt) in enumerate(zip(offsets, counts)):
        raw = data[off:off + cnt]
        if len(raw) < cnt:
            raise ValueError("tile data truncated")
        block = decode_tile(raw, tw, tl, compression, predictor)
        ty, tx = divmod(idx, tiles_x)
        canvas[ty * tl:(ty + 1) * tl, tx * tw:(tx + 1) * tw] = block
    return np.ascontiguousarray(canvas[:h, :w])


def read_cog(data: bytes) -> tuple[list[np.ndarray], tuple, int]:
    """Decode every IFD of a tiled TIFF.  Returns (levels — full
    resolution first, (xmin, ymin, xmax, ymax) of the full level, epsg).
    Raises ValueError on strip-organized input (use read_geotiff)."""
    try:
        if data[:2] == b"II":
            en = "<"
        elif data[:2] == b"MM":
            en = ">"
        else:
            raise ValueError("not a TIFF (no II/MM byte-order mark)")
        if struct.unpack_from(en + "H", data, 2)[0] != 42:
            raise ValueError("bad TIFF magic")
        (ifd_off,) = struct.unpack_from(en + "I", data, 4)
        levels = []
        bounds = None
        epsg = 0
        seen = set()
        while ifd_off:
            if ifd_off in seen:
                raise ValueError("IFD chain cycle")
            seen.add(ifd_off)
            if len(levels) > 64:
                raise ValueError("too many IFDs")
            tags, ifd_off = _read_ifd(data, en, ifd_off)
            if 322 not in tags:
                raise ValueError("strip-organized TIFF: use read_geotiff")
            arr = _decode_tiled_ifd(data, en, tags)
            if not levels:
                if 33550 in tags and 33922 in tags:
                    sx, sy = float(tags[33550][0]), float(tags[33550][1])
                    xmin, ymax = float(tags[33922][3]), float(tags[33922][4])
                    h, w = arr.shape[:2]
                    bounds = (xmin, ymax - sy * h, xmin + sx * w, ymax)
                else:
                    bounds = (0.0, 0.0, float(arr.shape[1]), float(arr.shape[0]))
                gk = tags.get(34735, [])
                for j in range(4, len(gk) - 3, 4):
                    if int(gk[j]) == 3072:
                        epsg = int(gk[j + 3])
            levels.append(arr)
        if not levels:
            raise ValueError("TIFF has no IFDs")
        return levels, bounds, epsg
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed tiled TIFF: {e}") from e


def parse_index(data: bytes) -> dict:
    """Parse ONLY the metadata block of a COG — `data` may be a prefix of
    the file (the header-first layout guarantees all IFDs and tag
    payloads precede all tile data, so `validate_cog_layout`'s
    `header_bytes` is always enough).  No tile is decompressed.

    Returns {"epsg", "bounds": (xmin, ymin, xmax, ymax) of level 0,
    "levels": [{"w", "h", "tile_w", "tile_h", "compression", "predictor",
    "offsets", "counts"}, ...]} — full resolution first.  Raises
    ValueError on malformed or strip-organized input."""
    try:
        if data[:2] == b"II":
            en = "<"
        elif data[:2] == b"MM":
            en = ">"
        else:
            raise ValueError("not a TIFF (no II/MM byte-order mark)")
        if struct.unpack_from(en + "H", data, 2)[0] != 42:
            raise ValueError("bad TIFF magic")
        (ifd_off,) = struct.unpack_from(en + "I", data, 4)
        levels = []
        bounds = None
        epsg = 0
        seen = set()
        while ifd_off:
            if ifd_off in seen:
                raise ValueError("IFD chain cycle")
            seen.add(ifd_off)
            if len(levels) > 64:
                raise ValueError("too many IFDs")
            tags, ifd_off = _read_ifd(data, en, ifd_off)
            if 322 not in tags or 324 not in tags:
                raise ValueError("strip-organized TIFF: use read_geotiff")
            spp = int(tags.get(277, [1])[0])
            if spp != 3 or any(int(b) != 8 for b in tags.get(258, [8])):
                raise ValueError("COG reader supports 8-bit RGB only")
            w, h = int(tags[256][0]), int(tags[257][0])
            tw, tl = int(tags[322][0]), int(tags[323][0])
            offsets = [int(v) for v in tags[324]]
            counts = [int(v) for v in tags[325]]
            tiles_x = (w + tw - 1) // tw
            tiles_y = (h + tl - 1) // tl
            if len(offsets) != tiles_x * tiles_y or len(counts) != len(offsets):
                raise ValueError("TileOffsets/TileByteCounts length mismatch")
            if not levels:
                if 33550 in tags and 33922 in tags:
                    sx, sy = float(tags[33550][0]), float(tags[33550][1])
                    xmin, ymax = float(tags[33922][3]), float(tags[33922][4])
                    bounds = (xmin, ymax - sy * h, xmin + sx * w, ymax)
                else:
                    bounds = (0.0, 0.0, float(w), float(h))
                gk = tags.get(34735, [])
                for j in range(4, len(gk) - 3, 4):
                    if int(gk[j]) == 3072:
                        epsg = int(gk[j + 3])
            levels.append({
                "w": w, "h": h, "tile_w": tw, "tile_h": tl,
                "compression": int(tags.get(259, [1])[0]),
                "predictor": int(tags.get(317, [1])[0]),
                "offsets": offsets, "counts": counts,
            })
        if not levels:
            raise ValueError("TIFF has no IFDs")
        return {"epsg": epsg, "bounds": bounds, "levels": levels}
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed tiled TIFF: {e}") from e


def validate_cog_layout(data: bytes) -> dict:
    """Structural COG validation (the checks rio-cogeo's validator runs):
    every IFD is tiled; overview IFDs carry NewSubfileType=1 and halve;
    all IFDs precede all tile data; tile data is ascending within each
    level and coarsest-level data comes first.  Returns a summary dict;
    raises ValueError with the first violated rule."""
    if data[:2] != b"II":
        raise ValueError("COG must be little-endian (II)")
    en = "<"
    (ifd_off,) = struct.unpack_from(en + "I", data, 4)
    per_level = []
    max_ifd_end = 0
    dims = []
    seen = set()
    level = 0
    while ifd_off:
        if ifd_off in seen:
            raise ValueError("IFD chain cycle")
        seen.add(ifd_off)
        tags, nxt = _read_ifd(data, en, ifd_off)
        (n,) = struct.unpack_from(en + "H", data, ifd_off)
        max_ifd_end = max(max_ifd_end, ifd_off + 2 + n * 12 + 4)
        if 322 not in tags or 324 not in tags:
            raise ValueError(f"IFD {level} is not tiled")
        if level > 0 and int(tags.get(254, [0])[0]) != 1:
            raise ValueError(f"overview IFD {level} missing NewSubfileType=1")
        offs = [int(v) for v in tags[324]]
        if any(b <= a for a, b in zip(offs, offs[1:])):
            raise ValueError(f"IFD {level} tile offsets not ascending")
        dims.append((int(tags[256][0]), int(tags[257][0])))
        per_level.append(offs)
        ifd_off = nxt
        level += 1
    for i in range(1, len(dims)):
        pw, ph = dims[i - 1]
        w, h = dims[i]
        if not ((pw + 1) // 2 == w and (ph + 1) // 2 == h):
            raise ValueError(f"overview {i} is not a 2:1 reduction")
    first_data = min(o[0] for o in per_level)
    if first_data < max_ifd_end:
        raise ValueError("tile data begins before the last IFD ends")
    # coarsest-first data ordering: level i's first offset > level i+1's
    for i in range(len(per_level) - 1):
        if per_level[i][0] <= per_level[i + 1][0]:
            raise ValueError(
                f"level {i} data does not follow coarser level {i + 1}"
            )
    return {
        "levels": len(dims),
        "dims": dims,
        "header_bytes": first_data,
        "tiled": True,
    }
