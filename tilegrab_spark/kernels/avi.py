"""Pure-stdlib AVI (RIFF) container parser for Motion-JPEG video.

Upgrades the multimodal frame-sampling path (operators/multimodal.py)
from "codec stubbed" to REAL for MJPEG-in-AVI — the one mainstream
video format whose frames this engine can already decode (each frame
is a baseline/progressive JPEG handled by kernels/jpeg.py).  Inter-
coded codecs (H.264/VP9/AV1...) still require ffmpeg-class libraries
the sandbox doesn't ship and keep raising.

``read_avi_mjpeg`` parses the RIFF structure (hdrl/avih + strl/strh
for timing, LIST movi for frame chunks '00dc'/'00db') and returns the
undecoded JPEG payloads plus frame timing; callers decode the frames
they actually sample.  ``encode_avi_mjpeg`` writes a minimal spec-shaped
AVI (avih + vids strl + movi + idx1) for fixtures and round-trips.
"""

from __future__ import annotations

import struct

import numpy as np


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, list_type_or_None, body_start, body_end)."""
    pos = start
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        body_end = min(body_start + size, end)
        if tag in (b"LIST", b"RIFF"):
            yield tag, data[body_start:body_start + 4], body_start + 4, body_end
        else:
            yield tag, None, body_start, body_end
        pos = body_start + size + (size & 1)


def read_avi_mjpeg(data: bytes) -> dict:
    """Parse an MJPEG AVI.  Returns {"fps": float, "w": int, "h": int,
    "frames": [jpeg_bytes, ...]}.  Raises ValueError for non-AVI input,
    non-MJPEG video streams, or malformed structure."""
    try:
        return _read_avi_mjpeg(data)
    except (struct.error, IndexError, KeyError, ZeroDivisionError) as e:
        raise ValueError(f"malformed AVI stream: {e}") from e


def _read_avi_mjpeg(data: bytes) -> dict:
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI stream")
    fps = None
    w = h = 0
    frames: list[bytes] = []
    us_per_frame = 0
    stream_no = 0       # strl lists appear in stream-number order
    video_stream = None  # the MJPEG vids stream whose chunks we accept
    pending_vids = None  # stream awaiting its strf compression check

    def scan(start, end):
        nonlocal fps, w, h, us_per_frame, stream_no, video_stream, pending_vids
        for tag, ltype, s, e in _walk(data, start, end):
            if tag == b"LIST" and ltype in (b"hdrl", b"strl", b"movi", b"rec "):
                if ltype == b"strl":
                    scan(s, e)
                    stream_no += 1
                else:
                    scan(s, e)
            elif tag == b"avih" and e - s >= 40:
                us_per_frame, _, _, _, _total, _, _streams, _, aw, ah = (
                    struct.unpack_from("<10I", data, s)
                )
                w, h = w or aw, h or ah
            elif tag == b"strh" and e - s >= 48:
                fcc_type = data[s:s + 4]
                handler = data[s + 4:s + 8]
                if fcc_type == b"vids":
                    if handler in (b"MJPG", b"mjpg"):
                        pending_vids = ("ok", stream_no)
                    elif handler == b"\x00\x00\x00\x00":
                        # blank handler: strf biCompression decides
                        pending_vids = ("strf", stream_no)
                    else:
                        raise ValueError(
                            f"AVI video handler {handler!r} unsupported — "
                            "MJPG only (inter codecs need ffmpeg)"
                        )
                    scale, rate = struct.unpack_from("<II", data, s + 20)
                    if scale and rate and video_stream is None:
                        fps = rate / scale
            elif tag == b"strf" and pending_vids is not None:
                mode, sn = pending_vids
                pending_vids = None
                if mode == "strf":
                    comp = data[s + 16:s + 20] if e - s >= 20 else b""
                    if comp not in (b"MJPG", b"mjpg"):
                        raise ValueError(
                            f"AVI biCompression {comp!r} unsupported — "
                            "MJPG only (inter codecs need ffmpeg)"
                        )
                if video_stream is None:
                    video_stream = sn
            elif (tag[2:4] in (b"dc", b"db") and e > s
                  and video_stream is not None
                  and tag[:2] == b"%02d" % video_stream):
                frames.append(data[s:e])

    scan(12, len(data))
    if fps is None:
        if not us_per_frame:
            raise ValueError("AVI has no video stream timing (strh/avih)")
        fps = 1_000_000.0 / us_per_frame
    if not frames:
        raise ValueError("AVI contains no video frame chunks")
    if sum(len(f) for f in frames) > 1 << 28:
        raise ValueError("AVI payload exceeds the decode cap")
    return {"fps": float(fps), "w": int(w), "h": int(h), "frames": frames}


def encode_avi_mjpeg(frames: list[bytes], fps: float, w: int, h: int) -> bytes:
    """Minimal MJPEG AVI writer (fixtures / round-trips): avih + one
    vids strl (strh+strf BITMAPINFOHEADER) + movi of 00dc chunks +
    idx1."""
    if not frames:
        raise ValueError("need at least one frame")
    scale, rate = 1000, int(round(fps * 1000))

    def chunk(tag: bytes, body: bytes) -> bytes:
        out = tag + struct.pack("<I", len(body)) + body
        return out + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<10I4I",
        int(1_000_000 / fps), 0, 0, 0x10, len(frames), 0, 1, 0, w, h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII4h", 0, 0, 0, 0, scale, rate, 0,
                      len(frames), 0, 0xFFFFFFFF, 0, 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b""
    idx = b""
    offset = 4  # per spec: offsets relative to the 'movi' fourcc
    for f in frames:
        c = chunk(b"00dc", f)
        idx += b"00dc" + struct.pack("<III", 0x10, offset, len(f))
        offset += len(c)
        movi_body += c
    movi = lst(b"movi", movi_body)
    idx1 = chunk(b"idx1", idx)

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
