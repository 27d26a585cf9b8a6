"""Pure-numpy RIFF/WAVE audio codec.

Upgrades the multimodal audio path (operators/multimodal.py) from
"codec stubbed, plumbing real" to REAL for the uncompressed formats a
training-data pipeline actually meets in the wild: PCM 8/16/24/32-bit,
IEEE float32/64, mu-law (format 7) and A-law (format 6), mono or
multi-channel.  Compressed codecs (mp3/aac/opus) still require
ffmpeg-class libraries the sandbox doesn't ship and keep raising.

decode_wav returns (samples, sample_rate): samples float64 at int16
scale ([-32768, 32767], channels averaged to mono) so the downstream
RMS/ZCR features keep their established scale.  encode_wav writes
PCM16/mu-law/A-law for fixtures and round-trip tests.
"""

from __future__ import annotations

import struct

import numpy as np


def _mulaw_decode(b: np.ndarray) -> np.ndarray:
    """ITU-T G.711 mu-law byte -> linear int16-scale."""
    u = (~b).astype(np.int64) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign != 0, -mag, mag).astype(np.float64)


def _mulaw_encode(x: np.ndarray) -> np.ndarray:
    x = np.clip(np.rint(x), -32635, 32635).astype(np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.abs(x) + 0x84
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int64)
    exp = np.clip(exp, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def _alaw_decode(b: np.ndarray) -> np.ndarray:
    """ITU-T G.711 A-law byte -> linear int16-scale.  Note the sign
    convention is OPPOSITE to mu-law: bit 7 set (after the 0x55 toggle)
    means POSITIVE."""
    a = b.astype(np.int64) ^ 0x55
    seg = (a >> 4) & 7
    mant = a & 0x0F
    mag = np.where(
        seg == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(seg - 1, 0),
    )
    return np.where(a & 0x80, mag, -mag).astype(np.float64)


def _alaw_encode(x: np.ndarray) -> np.ndarray:
    x = np.clip(np.rint(x), -32767, 32767).astype(np.int64)
    sign = np.where(x >= 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32767)
    seg = np.where(
        mag < 256, 0, np.floor(np.log2(np.maximum(mag, 1))).astype(np.int64) - 7
    )
    seg = np.clip(seg, 0, 7)
    mant = np.where(
        seg == 0,
        mag >> 4,
        np.clip(((mag >> np.maximum(seg - 1, 0)) - 0x108) >> 4, 0, 15),
    )
    return ((sign | (seg << 4) | mant) ^ 0x55).astype(np.uint8)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """(mono float64 samples at int16 scale, sample_rate)."""
    try:
        return _decode_wav(data)
    except (struct.error, IndexError, KeyError, ZeroDivisionError) as e:
        raise ValueError(f"malformed WAV stream: {e}") from e


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    payload = None
    fmt_body = b""
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"WAV chunk {tag!r} truncated "
                             f"({len(body)} of {size} declared bytes)")
        if tag == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif tag == b"data":
            payload = body
        pos += 8 + size + (size & 1)
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, sr, _brate, _align, bits = fmt
    if n_ch < 1 or sr < 1:
        raise ValueError("bad WAV channel count / sample rate")
    if len(payload) > 1 << 28:
        raise ValueError("WAV payload exceeds the decode cap")
    if audio_fmt == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        # subformat GUID's first two bytes (fmt body offset 24) carry
        # the real format code; read from the PARSED fmt chunk, never by
        # re-scanning the file (review finding: find() could hit 'fmt '
        # text inside an INFO/JUNK chunk)
        if len(fmt_body) < 26:
            raise ValueError("extensible WAV fmt chunk too short")
        (audio_fmt,) = struct.unpack_from("<H", fmt_body, 24)
    if audio_fmt == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(payload, np.uint8).astype(np.float64)
            x = (x - 128.0) * 256.0
        elif bits == 16:
            x = np.frombuffer(payload[: len(payload) // 2 * 2], "<i2").astype(np.float64)
        elif bits == 24:
            n = len(payload) // 3
            raw = np.frombuffer(payload[: n * 3], np.uint8).reshape(n, 3)
            v = (raw[:, 0].astype(np.int64)
                 | raw[:, 1].astype(np.int64) << 8
                 | raw[:, 2].astype(np.int64) << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / 256.0
        elif bits == 32:
            x = np.frombuffer(payload[: len(payload) // 4 * 4], "<i4").astype(np.float64)
            x /= 65536.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_fmt == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(payload[: len(payload) // 4 * 4], "<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(payload[: len(payload) // 8 * 8], "<f8").astype(np.float64)
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
        x = x * 32767.0
    elif audio_fmt == 7:  # mu-law
        if bits != 8:
            raise ValueError(f"mu-law WAV must be 8-bit, declared {bits}")
        x = _mulaw_decode(np.frombuffer(payload, np.uint8))
    elif audio_fmt == 6:  # A-law
        if bits != 8:
            raise ValueError(f"A-law WAV must be 8-bit, declared {bits}")
        x = _alaw_decode(np.frombuffer(payload, np.uint8))
    else:
        raise ValueError(f"unsupported WAV format code {audio_fmt} "
                         "(compressed audio needs ffmpeg-class codecs)")
    n = (len(x) // n_ch) * n_ch
    mono = x[:n].reshape(-1, n_ch).mean(axis=1)
    return mono, int(sr)


def encode_wav(pcm: np.ndarray, sr: int, *, fmt: str = "pcm16") -> bytes:
    """Fixture writer: int16-scale samples -> RIFF/WAVE bytes."""
    pcm = np.asarray(pcm, np.float64)
    if fmt == "pcm16":
        body = np.clip(np.rint(pcm), -32768, 32767).astype("<i2").tobytes()
        code, bits = 1, 16
    elif fmt == "mulaw":
        body = _mulaw_encode(pcm).tobytes()
        code, bits = 7, 8
    elif fmt == "alaw":
        body = _alaw_encode(pcm).tobytes()
        code, bits = 6, 8
    elif fmt == "float32":
        body = (pcm / 32767.0).astype("<f4").tobytes()
        code, bits = 3, 32
    else:
        raise ValueError(f"unsupported encode fmt {fmt!r}")
    block = bits // 8
    fmt_chunk = struct.pack("<HHIIHH", code, 1, sr, sr * block, block, bits)
    out = b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
    out += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return b"RIFF" + struct.pack("<I", len(out)) + out
