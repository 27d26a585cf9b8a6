"""PMTiles v3 archive kernel — pure stdlib, from the public spec
(github.com/protomaps/PMTiles, spec/v3/spec.md), same policy as the
engine's GeoTIFF/COG/MVT kernels: byte-level implementation, no
third-party libs, hostile-input guards.

PMTiles is the single-file, range-read-servable tile archive (the
vector/raster sibling of COG): a 127-byte header, varint-encoded
directories ordered by Hilbert tile id (clustered layout → one range
read per tile after a bootstrap read), run-length + content
de-duplication so oceans of identical tiles cost one copy, and leaf
directories so the root stays small enough for the bootstrap fetch.

This kernel gives the engine both directions:

- ``write_pmtiles``: tiles → archive bytes (content-dedup, run-length
  coalescing, automatic leaf-directory split, gzip internal
  compression);
- ``read_pmtiles`` / ``get_tile``: header+directory parse (bounded
  decompression), exact tile lookup via binary search with run-length
  semantics and leaf recursion.

Hilbert ids follow the spec: within zoom z the id is the Hilbert-curve
index on the 2^z grid; across zooms ids accumulate ((4^z − 1)/3 base),
pinned by the spec's own examples in tests/test_pmtiles.py.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import json
import struct
import tempfile
from typing import Iterable, Optional

__all__ = [
    "zxy_to_tileid",
    "tileids_np",
    "tileid_to_zxy",
    "PMTilesWriter",
    "write_pmtiles",
    "read_pmtiles",
    "get_tile",
    "parse_header",
]

MAGIC = b"PMTiles"
VERSION = 3
HEADER_LEN = 127

COMPRESSION_NONE = 1
COMPRESSION_GZIP = 2

TILE_TYPES = {"unknown": 0, "mvt": 1, "png": 2, "jpeg": 3, "webp": 4, "avif": 5}

# safety caps for hostile archives
_MAX_DIR_BYTES = 64 << 20
_MAX_ENTRIES = 10_000_000
_MAX_LEAF_DEPTH = 4

_LEAF_TARGET = 4096  # entries per leaf when the root would get too big


def zxy_to_tileid(z: int, x: int, y: int) -> int:
    """Cumulative Hilbert tile id (spec §c: 0 → (0,0,0); 1..4 → z=1)."""
    if not 0 <= z <= 31:
        raise ValueError(f"zoom out of range: {z}")
    n = 1 << z
    if not (0 <= x < n and 0 <= y < n):
        raise ValueError(f"tile ({x},{y}) out of range at z={z}")
    base = ((1 << (2 * z)) - 1) // 3
    rx = ry = 0
    d = 0
    s = n >> 1
    xx, yy = x, y
    while s > 0:
        rx = 1 if (xx & s) else 0
        ry = 1 if (yy & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        if ry == 0:
            if rx == 1:
                xx = s - 1 - xx
                yy = s - 1 - yy
            xx, yy = yy, xx
        s >>= 1
    return base + d


def tileids_np(z, x, y):
    """Vectorized :func:`zxy_to_tileid` over numpy int arrays (mixed
    zooms allowed) — the sort key the distributed PMTiles sink computes
    inside an Arrow batch so the global ``orderBy`` that produces the
    clustered archive layout runs JVM-side on a plain int64 column."""
    import numpy as np

    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    if len(z) and (z.min() < 0 or z.max() > 31):
        raise ValueError("zoom out of range")
    n = np.int64(1) << z
    if len(z) and ((x < 0).any() or (y < 0).any() or (x >= n).any() or (y >= n).any()):
        raise ValueError("tile out of range at its zoom")
    base = ((np.int64(1) << (2 * z)) - 1) // 3
    d = np.zeros_like(x)
    xx, yy = x.copy(), y.copy()
    for i in range(int(z.max()) - 1 if len(z) else -1, -1, -1):
        s = np.int64(1) << i
        active = s < n
        rx = ((xx & s) > 0) & active
        ry = ((yy & s) > 0) & active
        d += np.where(
            active,
            s * s * ((3 * rx.astype(np.int64)) ^ ry.astype(np.int64)),
            np.int64(0),
        )
        rot = active & ~ry
        flip = rot & rx
        xx = np.where(flip, s - 1 - xx, xx)
        yy = np.where(flip, s - 1 - yy, yy)
        tmp = xx
        xx = np.where(rot, yy, xx)
        yy = np.where(rot, tmp, yy)
    return base + d


def tileid_to_zxy(i: int) -> tuple:
    """Inverse of :func:`zxy_to_tileid`."""
    if i < 0:
        raise ValueError(f"negative tile id: {i}")
    z = 0
    acc = 0
    while True:
        n_here = 1 << (2 * z)
        if i < acc + n_here:
            break
        acc += n_here
        z += 1
        if z > 31:
            raise ValueError(f"tile id out of range: {i}")
    d = i - acc
    n = 1 << z
    x = y = 0
    s = 1
    while s < n:
        rx = 1 & (d // 2)
        ry = 1 & (d ^ rx)
        # rotate back
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        d //= 4
        s *= 2
    return z, x, y


def _write_varint(out: bytearray, v: int) -> None:
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _read_varint(data: bytes, pos: int) -> tuple:
    shift = 0
    val = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _serialize_directory(entries: list) -> bytes:
    """entries: [(tile_id, offset, length, run_length)] sorted by id."""
    out = bytearray()
    _write_varint(out, len(entries))
    last = 0
    for tid, _, _, _ in entries:
        _write_varint(out, tid - last)
        last = tid
    for _, _, _, rl in entries:
        _write_varint(out, rl)
    for _, _, ln, _ in entries:
        _write_varint(out, ln)
    prev_off = prev_len = None
    for _, off, ln, _ in entries:
        if prev_off is not None and off == prev_off + prev_len:
            _write_varint(out, 0)
        else:
            _write_varint(out, off + 1)
        prev_off, prev_len = off, ln
    return bytes(out)


def _deserialize_directory(data: bytes) -> list:
    n, pos = _read_varint(data, 0)
    if n > _MAX_ENTRIES:
        raise ValueError(f"directory too large: {n} entries")
    tids = []
    last = 0
    for _ in range(n):
        d, pos = _read_varint(data, pos)
        last += d
        tids.append(last)
    rls = []
    for _ in range(n):
        v, pos = _read_varint(data, pos)
        rls.append(v)
    lens = []
    for _ in range(n):
        v, pos = _read_varint(data, pos)
        lens.append(v)
    entries = []
    prev_off = prev_len = None
    for i in range(n):
        v, pos = _read_varint(data, pos)
        if v == 0:
            if prev_off is None:
                raise ValueError("offset 0 on first directory entry")
            off = prev_off + prev_len
        else:
            off = v - 1
        entries.append((tids[i], off, lens[i], rls[i]))
        prev_off, prev_len = off, lens[i]
    return entries


def _compress(data: bytes, mode: int) -> bytes:
    return gzip.compress(data, mtime=0) if mode == COMPRESSION_GZIP else data


def _decompress(data: bytes, mode: int) -> bytes:
    if mode == COMPRESSION_NONE:
        return data
    if mode != COMPRESSION_GZIP:
        raise ValueError(f"unsupported compression: {mode}")
    out = gzip.decompress(data)
    if len(out) > _MAX_DIR_BYTES:
        raise ValueError("decompressed block exceeds cap")
    return out


class PMTilesWriter:
    """Incremental archive builder with bounded driver memory.

    Tiles MUST be added in ascending tile-id order (the clustered
    invariant — exactly what a distributed ``orderBy(tile_id)`` feeds a
    driver-side ``toLocalIterator`` in). Payload bytes stream to a
    disk-backed spool; the writer holds only the directory entries
    (O(entries), run-length coalesced) and a sha256→(offset, length)
    content-dedup map — never the tile payloads."""

    def __init__(
        self,
        *,
        tile_type: str = "png",
        metadata: Optional[dict] = None,
        tile_compression: int = COMPRESSION_NONE,
        internal_compression: int = COMPRESSION_GZIP,
        bounds_e7: Optional[tuple] = None,
        min_zoom: Optional[int] = None,
        max_zoom: Optional[int] = None,
        spool_max_bytes: int = 64 << 20,
    ) -> None:
        self._opts = dict(
            tile_type=tile_type,
            metadata=metadata,
            tile_compression=tile_compression,
            internal_compression=internal_compression,
            bounds_e7=bounds_e7,
            min_zoom=min_zoom,
            max_zoom=max_zoom,
        )
        self._spool = tempfile.SpooledTemporaryFile(max_size=spool_max_bytes)
        self._data_len = 0
        self._dedup: dict = {}
        self._entries: list = []
        self._last_tid = -1
        self._n_addressed = 0
        self._zmin: Optional[int] = None
        self._zmax: Optional[int] = None

    def add(self, z: int, x: int, y: int, data, *, tid: Optional[int] = None) -> None:
        tid = zxy_to_tileid(int(z), int(x), int(y)) if tid is None else int(tid)
        if tid <= self._last_tid:
            raise ValueError(
                f"duplicate or unsorted tile {z}/{x}/{y}: ids must ascend"
            )
        self._last_tid = tid
        data = bytes(data)
        key = hashlib.sha256(data).digest()
        hit = self._dedup.get(key)
        if hit is None:
            off = self._data_len
            self._spool.write(data)
            self._data_len += len(data)
            self._dedup[key] = (off, len(data))
        else:
            off = hit[0]
        self._n_addressed += 1
        z = int(z)
        self._zmin = z if self._zmin is None else min(self._zmin, z)
        self._zmax = z if self._zmax is None else max(self._zmax, z)
        if self._entries:
            ptid, poff, pln, prl = self._entries[-1]
            if off == poff and len(data) == pln and tid == ptid + prl:
                self._entries[-1] = (ptid, poff, pln, prl + 1)
                return
        self._entries.append((tid, off, len(data), 1))

    def finalize(self, path: Optional[str] = None):
        """Assemble the archive: to ``path`` (payloads stream-copied
        from the spool, never held in memory) or returned as bytes."""
        if not self._entries:
            raise ValueError("no tiles")
        o = self._opts
        icomp = o["internal_compression"]
        root_budget = 16384 - HEADER_LEN
        root_comp = _compress(_serialize_directory(self._entries), icomp)
        leaves_blob = b""
        if len(root_comp) > root_budget:
            leaf_ptrs = []
            blob = bytearray()
            for i in range(0, len(self._entries), _LEAF_TARGET):
                chunk = self._entries[i : i + _LEAF_TARGET]
                ser = _compress(_serialize_directory(chunk), icomp)
                leaf_ptrs.append((chunk[0][0], len(blob), len(ser), 0))
                blob.extend(ser)
            leaves_blob = bytes(blob)
            root_comp = _compress(_serialize_directory(leaf_ptrs), icomp)
            if len(root_comp) > root_budget:
                raise ValueError("root directory exceeds budget even with leaves")

        meta_comp = _compress(
            json.dumps(o["metadata"] or {}, sort_keys=True).encode(), icomp
        )
        minz = o["min_zoom"] if o["min_zoom"] is not None else self._zmin
        maxz = o["max_zoom"] if o["max_zoom"] is not None else self._zmax
        bounds_e7 = o["bounds_e7"]
        if bounds_e7 is None:
            bounds_e7 = (-1800000000, -850511290, 1800000000, 850511290)

        root_off = HEADER_LEN
        meta_off = root_off + len(root_comp)
        leaf_off = meta_off + len(meta_comp)
        data_off = leaf_off + len(leaves_blob)

        hdr = bytearray()
        hdr += MAGIC
        hdr.append(VERSION)
        hdr += struct.pack(
            "<QQQQQQQQ",
            root_off, len(root_comp), meta_off, len(meta_comp),
            leaf_off, len(leaves_blob), data_off, self._data_len,
        )
        # addressed tiles = total logical tiles; entries = directory
        # rows; contents = distinct payloads
        hdr += struct.pack(
            "<QQQ", self._n_addressed, len(self._entries), len(self._dedup)
        )
        hdr.append(1)  # clustered (data written in id order)
        hdr.append(icomp)
        hdr.append(o["tile_compression"])
        hdr.append(TILE_TYPES.get(o["tile_type"], 0))
        hdr.append(minz)
        hdr.append(maxz)
        hdr += struct.pack("<iiii", *bounds_e7)
        hdr.append(minz)  # center zoom
        hdr += struct.pack(
            "<ii",
            (bounds_e7[0] + bounds_e7[2]) // 2,
            (bounds_e7[1] + bounds_e7[3]) // 2,
        )
        assert len(hdr) == HEADER_LEN, len(hdr)

        prefix = bytes(hdr) + root_comp + meta_comp + leaves_blob
        self._spool.seek(0)
        if path is None:
            out = prefix + self._spool.read()
            self._spool.close()
            return out
        with open(path, "wb") as f:
            f.write(prefix)
            while True:
                chunk = self._spool.read(4 << 20)
                if not chunk:
                    break
                f.write(chunk)
        self._spool.close()
        return None


def write_pmtiles(
    tiles: Iterable[tuple],
    *,
    tile_type: str = "png",
    metadata: Optional[dict] = None,
    tile_compression: int = COMPRESSION_NONE,
    internal_compression: int = COMPRESSION_GZIP,
    bounds_e7: Optional[tuple] = None,
    min_zoom: Optional[int] = None,
    max_zoom: Optional[int] = None,
) -> bytes:
    """Build a PMTiles v3 archive from ``(z, x, y, data)`` tiles.

    Identical payloads are stored ONCE (content dedup); consecutive
    Hilbert ids sharing one payload coalesce into run-length entries;
    when the root directory would exceed the bootstrap budget the
    entries split into ``run_length=0`` leaf pointers. ``data`` is
    stored as given — pass pre-gzipped tiles with
    ``tile_compression=COMPRESSION_GZIP`` if wanted (the writer never
    recompresses tile payloads)."""
    items = []
    for z, x, y, data in tiles:
        items.append((zxy_to_tileid(int(z), int(x), int(y)), int(z), x, y, data))
    items.sort(key=lambda t: t[0])
    if not items:
        raise ValueError("no tiles")
    w = PMTilesWriter(
        tile_type=tile_type,
        metadata=metadata,
        tile_compression=tile_compression,
        internal_compression=internal_compression,
        bounds_e7=bounds_e7,
        min_zoom=min_zoom,
        max_zoom=max_zoom,
    )
    for tid, z, x, y, data in items:
        if tid == w._last_tid:
            raise ValueError(f"duplicate tile {z}/{x}/{y}")
        w.add(z, x, y, data, tid=tid)
    return w.finalize()


def parse_header(data: bytes) -> dict:
    if len(data) < HEADER_LEN or data[:7] != MAGIC:
        raise ValueError("not a PMTiles archive")
    if data[7] != VERSION:
        raise ValueError(f"unsupported PMTiles version {data[7]}")
    (
        root_off, root_len, meta_off, meta_len,
        leaf_off, leaf_len, data_off, data_len,
    ) = struct.unpack_from("<QQQQQQQQ", data, 8)
    n_addr, n_entries, n_contents = struct.unpack_from("<QQQ", data, 72)
    return {
        "root_offset": root_off, "root_length": root_len,
        "metadata_offset": meta_off, "metadata_length": meta_len,
        "leaf_offset": leaf_off, "leaf_length": leaf_len,
        "data_offset": data_off, "data_length": data_len,
        "n_addressed_tiles": n_addr, "n_tile_entries": n_entries,
        "n_tile_contents": n_contents,
        "clustered": bool(data[96]),
        "internal_compression": data[97],
        "tile_compression": data[98],
        "tile_type": data[99],
        "min_zoom": data[100],
        "max_zoom": data[101],
        "bounds_e7": struct.unpack_from("<iiii", data, 102),
    }


def _find_entry(entries: list, tid: int):
    """Binary search with run-length semantics; returns the matching
    entry or None."""
    lo, hi = 0, len(entries) - 1
    while lo <= hi:
        mid = (lo + hi) // 2
        etid, off, ln, rl = entries[mid]
        if tid < etid:
            hi = mid - 1
        elif rl == 0 and (mid == len(entries) - 1 or tid < entries[mid + 1][0]):
            return entries[mid]  # leaf pointer covering this id range
        elif rl > 0 and tid < etid + rl:
            return entries[mid]
        else:
            lo = mid + 1
    return None


def get_tile(archive: bytes, z: int, x: int, y: int) -> Optional[bytes]:
    """Exact tile payload from archive bytes (None when absent)."""
    h = parse_header(archive)
    tid = zxy_to_tileid(z, x, y)
    comp = h["internal_compression"]
    entries = _deserialize_directory(
        _decompress(
            archive[h["root_offset"] : h["root_offset"] + h["root_length"]], comp
        )
    )
    for _ in range(_MAX_LEAF_DEPTH):
        e = _find_entry(entries, tid)
        if e is None:
            return None
        etid, off, ln, rl = e
        if rl == 0:
            leaf = archive[
                h["leaf_offset"] + off : h["leaf_offset"] + off + ln
            ]
            entries = _deserialize_directory(_decompress(leaf, comp))
            continue
        start = h["data_offset"] + off
        return archive[start : start + ln]
    raise ValueError("leaf directory depth exceeds cap")


def read_pmtiles(archive: bytes) -> dict:
    """Parse an archive: header + metadata + the full (z, x, y) →
    payload mapping (run-length entries expanded)."""
    h = parse_header(archive)
    comp = h["internal_compression"]
    meta_raw = _decompress(
        archive[h["metadata_offset"] : h["metadata_offset"] + h["metadata_length"]],
        comp,
    )
    metadata = json.loads(meta_raw) if meta_raw else {}
    root = _deserialize_directory(
        _decompress(
            archive[h["root_offset"] : h["root_offset"] + h["root_length"]], comp
        )
    )
    tiles = {}

    def walk(entries, depth):
        if depth > _MAX_LEAF_DEPTH:
            raise ValueError("leaf directory depth exceeds cap")
        for tid, off, ln, rl in entries:
            if rl == 0:
                leaf = archive[h["leaf_offset"] + off : h["leaf_offset"] + off + ln]
                walk(_deserialize_directory(_decompress(leaf, comp)), depth + 1)
                continue
            start = h["data_offset"] + off
            payload = archive[start : start + ln]
            for k in range(rl):
                tiles[tileid_to_zxy(tid + k)] = payload

    walk(root, 0)
    return {"header": h, "metadata": metadata, "tiles": tiles}
