"""Mapbox Vector Tile (MVT 2.1) wire format — pure-stdlib encoder/decoder.

The engine's vector outputs (contours, footprints, points) become
consumable by every standard slippy-map client if they leave as MVT —
the de-facto vector counterpart of the PNG tiles the engine already
writes. The format is public (Mapbox vector-tile-spec 2.1): a protobuf
``Tile`` of ``Layer``s, each with string key/typed value tables and
``Feature``s whose geometry is a command stream (MoveTo/LineTo/
ClosePath) of zigzag-encoded integer deltas in tile-local coordinates
(0..extent). No protobuf library is needed — the message shapes are
fixed, so this encodes/decodes the wire bytes directly (same policy as
kernels/geotiff.py writing TIFF tags by hand).

Layer input shape:
    {"name": str, "extent": int (default 4096), "features": [
        {"id": int, "type": "point"|"line"|"polygon",
         "geom": [part, ...]   # part = [(x, y) int tile-local, ...]
         "tags": {key: str|float|int|bool}}, ...]}

Points: each part is one point (multipoint = several 1-point parts).
Lines: each part a polyline (>= 2 vertices). Polygons: each part a
ring, closed implicitly by ClosePath (do NOT repeat the first vertex).

The decoder (`decode_mvt`) exists for verification and tests — it
inverts the encoder exactly and is written from the spec text, not by
reading the encoder.
"""

from __future__ import annotations

import struct
from typing import Iterable

__all__ = ["encode_mvt", "decode_mvt"]

_GEOM_TYPE = {"point": 1, "line": 2, "polygon": 3}
_GEOM_NAME = {1: "point", 2: "line", 3: "polygon"}


# ---------------------------------------------------------------------------
# protobuf primitives
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64  # protobuf negative int64 -> 10-byte varint
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _field(7, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _field(6, 0) + _varint(_zigzag(v))  # sint64
    if isinstance(v, float):
        return _field(3, 1) + struct.pack("<d", v)  # double
    if isinstance(v, str):
        return _len_field(1, v.encode("utf-8"))
    raise TypeError(f"unsupported tag value type: {type(v)!r}")


def _encode_geometry(gtype: int, parts: Iterable) -> list:
    cmds = []
    cx = cy = 0

    def push_move(pts, count):
        nonlocal cx, cy
        cmds.append((1 & 0x7) | (count << 3))
        for x, y in pts:
            cmds.append(_zigzag(int(x) - cx))
            cmds.append(_zigzag(int(y) - cy))
            cx, cy = int(x), int(y)

    if gtype == 1:
        pts = [p[0] for p in parts]
        push_move(pts, len(pts))
        return cmds
    for part in parts:
        part = list(part)
        push_move(part[:1], 1)
        rest = part[1:]
        if rest:
            cmds.append((2 & 0x7) | (len(rest) << 3))
            for x, y in rest:
                cmds.append(_zigzag(int(x) - cx))
                cmds.append(_zigzag(int(y) - cy))
                cx, cy = int(x), int(y)
        if gtype == 3:
            cmds.append(7)  # ClosePath, count 1
    return cmds


def encode_mvt(layers: list) -> bytes:
    """Encode layers (shape in the module docstring) to MVT bytes."""
    out = bytearray()
    for layer in layers:
        extent = int(layer.get("extent", 4096))
        keys: list = []
        vals: list = []
        kidx: dict = {}
        vidx: dict = {}
        feats = bytearray()
        for feat in layer["features"]:
            gname = feat["type"]
            if gname not in _GEOM_TYPE:
                raise ValueError(f"unknown geometry type {gname!r}")
            gtype = _GEOM_TYPE[gname]
            tags = []
            for k, v in (feat.get("tags") or {}).items():
                if k not in kidx:
                    kidx[k] = len(keys)
                    keys.append(k)
                vk = (type(v).__name__, v)
                if vk not in vidx:
                    vidx[vk] = len(vals)
                    vals.append(v)
                tags += [kidx[k], vidx[vk]]
            body = bytearray()
            if feat.get("id") is not None:
                body += _field(1, 0) + _varint(int(feat["id"]))
            if tags:
                payload = b"".join(_varint(t) for t in tags)
                body += _len_field(2, payload)
            body += _field(3, 0) + _varint(gtype)
            cmds = _encode_geometry(gtype, feat["geom"])
            payload = b"".join(_varint(c) for c in cmds)
            body += _len_field(4, payload)
            feats += _len_field(2, bytes(body))
        lbody = bytearray()
        lbody += _field(15, 0) + _varint(2)  # version
        lbody += _len_field(1, layer["name"].encode("utf-8"))
        lbody += feats
        for k in keys:
            lbody += _len_field(3, k.encode("utf-8"))
        for v in vals:
            lbody += _len_field(4, _encode_value(v))
        if extent != 4096:
            lbody += _field(5, 0) + _varint(extent)
        out += _len_field(3, bytes(lbody))
    return bytes(out)


# ---------------------------------------------------------------------------
# decode (verification-grade)
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, i: int):
    n = shift = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _fields(buf: bytes):
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        num, wire = tag >> 3, tag & 0x7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 1:
            v = buf[i:i + 8]
            i += 8
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wire == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield num, wire, v


def _decode_value(buf: bytes):
    for num, wire, v in _fields(buf):
        if num == 1:
            return v.decode("utf-8")
        if num == 2:
            return struct.unpack("<f", v)[0]
        if num == 3:
            return struct.unpack("<d", v)[0]
        if num in (4, 5):
            return v if num == 5 else (v - (1 << 64) if v >= 1 << 63 else v)
        if num == 6:
            return _unzigzag(v)
        if num == 7:
            return bool(v)
    return None


def _decode_geometry(gtype: int, cmds: list) -> list:
    parts: list = []
    cur: list = []
    cx = cy = 0
    i = 0
    while i < len(cmds):
        cmd = cmds[i]
        i += 1
        cid, cnt = cmd & 0x7, cmd >> 3
        if cid == 1:  # MoveTo
            for _ in range(cnt):
                cx += _unzigzag(cmds[i]); cy += _unzigzag(cmds[i + 1]); i += 2
                if gtype == 1:
                    parts.append([(cx, cy)])
                else:
                    if cur:
                        parts.append(cur)
                    cur = [(cx, cy)]
        elif cid == 2:  # LineTo
            for _ in range(cnt):
                cx += _unzigzag(cmds[i]); cy += _unzigzag(cmds[i + 1]); i += 2
                cur.append((cx, cy))
        elif cid == 7:  # ClosePath
            parts.append(cur)
            cur = []
        else:
            raise ValueError(f"unknown command {cid}")
    if cur:
        parts.append(cur)
    return parts


def decode_mvt(data: bytes) -> list:
    """Decode MVT bytes back to the encoder's layer shape (tags become
    plain dicts; geometry in tile-local integer coords)."""
    layers = []
    for num, wire, lbuf in _fields(data):
        if num != 3:
            continue
        name, extent, version = "", 4096, None
        keys: list = []
        vals: list = []
        raw_feats = []
        for fn, fw, fv in _fields(lbuf):
            if fn == 15:
                version = fv
            elif fn == 1:
                name = fv.decode("utf-8")
            elif fn == 2:
                raw_feats.append(fv)
            elif fn == 3:
                keys.append(fv.decode("utf-8"))
            elif fn == 4:
                vals.append(_decode_value(fv))
            elif fn == 5:
                extent = fv
        feats = []
        for fbuf in raw_feats:
            fid, gtype, tags, cmds = None, None, [], []
            for gn, gw, gv in _fields(fbuf):
                if gn == 1:
                    fid = gv
                elif gn == 2:
                    j = 0
                    while j < len(gv):
                        t, j = _read_varint(gv, j)
                        tags.append(t)
                elif gn == 3:
                    gtype = gv
                elif gn == 4:
                    j = 0
                    while j < len(gv):
                        c, j = _read_varint(gv, j)
                        cmds.append(c)
            feats.append(
                {
                    "id": fid,
                    "type": _GEOM_NAME[gtype],
                    "geom": _decode_geometry(gtype, cmds),
                    "tags": {
                        keys[tags[k]]: vals[tags[k + 1]]
                        for k in range(0, len(tags), 2)
                    },
                }
            )
        layers.append(
            {"name": name, "extent": extent, "version": version, "features": feats}
        )
    return layers
