"""Pure-numpy RIFF/WAVE audio codec.

Upgrades the multimodal audio path (operators/multimodal.py) from
"codec stubbed, plumbing real" to REAL for the formats a training-data
pipeline actually meets in the wild: PCM 8/16/24/32-bit, IEEE
float32/64, mu-law (format 7), A-law (format 6), and the two
block-based COMPRESSED WAV codecs — Microsoft ADPCM (format 0x02) and
IMA/DVI ADPCM (format 0x11), both 4:1-ish 4-bit predictive coders from
the public multimedia registry.  Each ADPCM block carries its own
predictor state in its header, so decode vectorizes ACROSS blocks (the
numpy lanes are blocks x channels; the only sequential loop is the
samples-per-block axis) — the same across-independent-units trick the
image kernels use.  Perceptual codecs (mp3/aac/opus) still require
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


# ---------------------------------------------------------------------------
# ADPCM (block-based 4-bit predictive coders; public multimedia registry)
# ---------------------------------------------------------------------------

# IMA/DVI ADPCM (WAVE format 0x11): 89-entry step table + index deltas.
_IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], np.int64)
_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int64)

# Microsoft ADPCM (WAVE format 0x02): 7 predictor coefficient pairs +
# the 16-entry delta adaptation table.
_MS_COEFF1 = np.array([256, 512, 0, 192, 240, 460, 392], np.int64)
_MS_COEFF2 = np.array([0, -256, 0, 64, 0, -208, -232], np.int64)
_MS_ADAPT = np.array([
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
], np.int64)


def _ima_step(pred: np.ndarray, idx: np.ndarray, nib: np.ndarray):
    """One IMA nibble update across lanes. All int64 arrays; returns
    (new_pred, new_idx). Exact integer form (the step>>3 + conditional
    adds), matching the reference decoders."""
    step = _IMA_STEP_TABLE[idx]
    diff = step >> 3
    diff = diff + np.where(nib & 4, step, 0)
    diff = diff + np.where(nib & 2, step >> 1, 0)
    diff = diff + np.where(nib & 1, step >> 2, 0)
    pred = pred + np.where(nib & 8, -diff, diff)
    pred = np.clip(pred, -32768, 32767)
    idx = np.clip(idx + _IMA_INDEX_TABLE[nib & 7], 0, 88)
    return pred, idx


def _decode_ima_blocks(blocks: np.ndarray, n_ch: int) -> np.ndarray:
    """(B, block_align) uint8 -> (B, samples_per_block, n_ch) float64.

    Per-channel 4-byte header (int16 predictor, uint8 step index,
    reserved), then interleaved 4-byte channel groups; within a byte
    the LOW nibble is the earlier sample."""
    B, ba = blocks.shape
    data_bytes = ba - 4 * n_ch
    if data_bytes < 0 or data_bytes % (4 * n_ch):
        raise ValueError("IMA ADPCM block size not a 4-byte channel multiple")
    hdr = blocks[:, : 4 * n_ch].reshape(B, n_ch, 4)
    pred = (hdr[:, :, 0].astype(np.int64)
            | hdr[:, :, 1].astype(np.int64) << 8)
    pred = np.where(pred >= 1 << 15, pred - (1 << 16), pred)
    idx = hdr[:, :, 2].astype(np.int64)
    if np.any(idx > 88):
        raise ValueError("IMA ADPCM step index out of range")
    n_groups = data_bytes // (4 * n_ch)
    out = np.empty((B, 1 + n_groups * 8, n_ch), np.float64)
    out[:, 0, :] = pred
    if n_groups:
        d = blocks[:, 4 * n_ch:].reshape(B, n_groups, n_ch, 4)
        nibs = np.empty((B, n_groups, n_ch, 8), np.int64)
        nibs[..., 0::2] = d & 0x0F          # low nibble first
        nibs[..., 1::2] = (d >> 4) & 0x0F
        # (B, groups, ch, 8) -> (B, groups*8, ch): transpose BEFORE the
        # reshape or the channel axis scrambles into the sample axis
        nibs = nibs.transpose(0, 1, 3, 2).reshape(B, n_groups * 8, n_ch)
        for t in range(n_groups * 8):
            pred, idx = _ima_step(pred, idx, nibs[:, t, :])
            out[:, 1 + t, :] = pred
    return out


def _decode_ms_blocks(blocks: np.ndarray, n_ch: int) -> np.ndarray:
    """(B, block_align) uint8 -> (B, samples_per_block, n_ch) float64.

    Header per block: uint8 predictor index per channel, then int16
    idelta / sample1 / sample2 per channel; data nibbles HIGH first,
    alternating channels when stereo."""
    B, ba = blocks.shape
    if ba < 7 * n_ch + 1 and ba != 7 * n_ch:
        raise ValueError("MS ADPCM block shorter than its header")
    bpred = blocks[:, :n_ch].astype(np.int64)
    if np.any(bpred >= 7):
        raise ValueError("MS ADPCM predictor index out of range")

    def _i16_at(base):
        raw = blocks[:, base: base + 2 * n_ch].reshape(B, n_ch, 2)
        v = raw[:, :, 0].astype(np.int64) | raw[:, :, 1].astype(np.int64) << 8
        return np.where(v >= 1 << 15, v - (1 << 16), v)

    idelta = _i16_at(n_ch)
    s1 = _i16_at(3 * n_ch)
    s2 = _i16_at(5 * n_ch)
    data_bytes = ba - 7 * n_ch
    n_data = data_bytes * 2 // n_ch  # nibble samples per channel
    out = np.empty((B, 2 + n_data, n_ch), np.float64)
    out[:, 0, :] = s2  # sample2 is the OLDER sample
    out[:, 1, :] = s1
    if n_data:
        d = blocks[:, 7 * n_ch:]
        nibs = np.empty((B, data_bytes, 2), np.int64)
        nibs[:, :, 0] = (d >> 4) & 0x0F    # high nibble first
        nibs[:, :, 1] = d & 0x0F
        nibs = nibs.reshape(B, data_bytes * 2)[:, : n_data * n_ch]
        nibs = nibs.reshape(B, n_data, n_ch)
        c1 = _MS_COEFF1[bpred]
        c2 = _MS_COEFF2[bpred]
        for t in range(n_data):
            nib = nibs[:, t, :]
            signed = np.where(nib >= 8, nib - 16, nib)
            predicted = (s1 * c1 + s2 * c2) >> 8
            new = np.clip(predicted + signed * idelta, -32768, 32767)
            s2, s1 = s1, new
            idelta = np.maximum(16, (_MS_ADAPT[nib] * idelta) >> 8)
            out[:, 2 + t, :] = new
    return out


def _decode_adpcm(payload: bytes, n_ch: int, block_align: int,
                  kind: str) -> np.ndarray:
    """Full ADPCM data chunk -> mono float64. Complete blocks decode
    vectorized in one batch; a trailing partial block decodes as its
    own 1-block batch (its nibble count differs)."""
    if n_ch not in (1, 2):
        raise ValueError(f"ADPCM channel count {n_ch} unsupported")
    min_hdr = (4 if kind == "ima" else 7) * n_ch
    if block_align < min_hdr + (4 * n_ch if kind == "ima" else 0):
        raise ValueError("ADPCM block_align smaller than the block header")
    dec = _decode_ima_blocks if kind == "ima" else _decode_ms_blocks
    n_full = len(payload) // block_align
    parts = []
    if n_full:
        full = np.frombuffer(
            payload[: n_full * block_align], np.uint8
        ).reshape(n_full, block_align)
        parts.append(dec(full, n_ch).reshape(-1, n_ch))
    tail = payload[n_full * block_align:]
    if kind == "ima":
        keep = len(tail) - (len(tail) - 4 * n_ch) % (4 * n_ch) \
            if len(tail) >= 8 * n_ch else 0
    else:
        keep = len(tail) if len(tail) > 7 * n_ch else 0
    if keep:
        tb = np.frombuffer(tail[:keep], np.uint8).reshape(1, keep)
        parts.append(dec(tb, n_ch).reshape(-1, n_ch))
    if not parts:
        return np.zeros(0, np.float64)
    frames = np.concatenate(parts, axis=0)
    return frames.mean(axis=1)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """(mono float64 samples at int16 scale, sample_rate)."""
    try:
        return _decode_wav(data)
    except (struct.error, IndexError, KeyError, ZeroDivisionError) as e:
        raise ValueError(f"malformed WAV stream: {e}") from e


def wav_channels(data: bytes) -> int:
    """Channel count straight from the RIFF fmt chunk (no decode) —
    decode_wav mono-mixes, so metadata surfaces must read the real
    count here."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if tag == b"fmt " and size >= 16 and pos + 8 + 16 <= len(data):
            (n_ch,) = struct.unpack_from("<H", data, pos + 10)
            if n_ch < 1:
                raise ValueError("bad WAV channel count")
            return n_ch
        pos += 8 + size + (size & 1)
    raise ValueError("WAV missing fmt chunk")


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    payload = None
    fmt_body = b""
    fact_frames = None
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
        elif tag == b"fact" and len(body) >= 4:
            (fact_frames,) = struct.unpack_from("<I", body, 0)
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
    elif audio_fmt in (0x11, 0x02):  # IMA / Microsoft ADPCM (compressed)
        kind = "ima" if audio_fmt == 0x11 else "ms"
        mono = _decode_adpcm(payload, n_ch, int(_align), kind)
        if fact_frames is not None and fact_frames < len(mono):
            # fact chunk carries the true frame count; the final block
            # may be nibble-padded past it
            mono = mono[:fact_frames]
        return mono, int(sr)
    else:
        raise ValueError(f"unsupported WAV format code {audio_fmt} "
                         "(perceptual codecs need ffmpeg-class libraries)")
    n = (len(x) // n_ch) * n_ch
    mono = x[:n].reshape(-1, n_ch).mean(axis=1)
    return mono, int(sr)


def _encode_ima_mono(x: np.ndarray, block_align: int) -> bytes:
    """Mono IMA ADPCM blocks (scalar fixture encoder; the standard
    greedy nibble search). Final block zero-nibble-padded — the fact
    chunk carries the true frame count."""
    x = np.clip(np.rint(x), -32768, 32767).astype(np.int64)
    spb = (block_align - 4) * 2 + 1
    out = bytearray()
    idx = 0
    for i in range(0, len(x), spb):
        chunk = x[i: i + spb]
        pred = int(chunk[0])
        out += struct.pack("<hBB", pred, idx, 0)
        nibs = []
        for s in chunk[1:]:
            step = int(_IMA_STEP_TABLE[idx])
            diff = int(s) - pred
            nib = 0
            if diff < 0:
                nib, diff = 8, -diff
            vpdiff = step >> 3
            if diff >= step:
                nib |= 4
                diff -= step
                vpdiff += step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
                vpdiff += step >> 1
            if diff >= step >> 2:
                nib |= 1
                vpdiff += step >> 2
            pred += -vpdiff if nib & 8 else vpdiff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(_IMA_INDEX_TABLE[nib & 7])))
            nibs.append(nib)
        data_n = (block_align - 4) * 2
        nibs += [0] * (data_n - len(nibs))
        for j in range(0, data_n, 2):
            out.append(nibs[j] | (nibs[j + 1] << 4))
    return bytes(out)


def _encode_ms_mono(x: np.ndarray, block_align: int) -> bytes:
    """Mono Microsoft ADPCM blocks (scalar fixture encoder; fixed
    predictor 0, per-block idelta from the local difference scale)."""
    x = np.clip(np.rint(x), -32768, 32767).astype(np.int64)
    spb = (block_align - 7) * 2 + 2
    out = bytearray()
    for i in range(0, len(x), spb):
        chunk = x[i: i + spb]
        if len(chunk) < 2:
            chunk = np.concatenate([chunk, np.zeros(2 - len(chunk), np.int64)])
        s2, s1 = int(chunk[0]), int(chunk[1])
        scale = int(np.mean(np.abs(np.diff(chunk)))) if len(chunk) > 2 else 16
        idelta = max(16, scale // 4)
        out += struct.pack("<Bhhh", 0, idelta, s1, s2)
        c1, c2 = int(_MS_COEFF1[0]), int(_MS_COEFF2[0])
        nibs = []
        for s in chunk[2:]:
            predicted = (s1 * c1 + s2 * c2) >> 8
            nib = max(-8, min(7, int(round((int(s) - predicted) / idelta))))
            new = max(-32768, min(32767, predicted + nib * idelta))
            s2, s1 = s1, new
            unib = nib & 0xF
            idelta = max(16, (int(_MS_ADAPT[unib]) * idelta) >> 8)
            nibs.append(unib)
        data_n = (block_align - 7) * 2
        nibs += [0] * (data_n - len(nibs))
        for j in range(0, data_n, 2):
            out.append((nibs[j] << 4) | nibs[j + 1])
    return bytes(out)


def encode_wav(pcm: np.ndarray, sr: int, *, fmt: str = "pcm16",
               block_align: int = 256) -> bytes:
    """Fixture writer: int16-scale samples -> RIFF/WAVE bytes."""
    pcm = np.asarray(pcm, np.float64)
    if fmt in ("ima_adpcm", "ms_adpcm"):
        # block-based compressed formats: extended fmt chunk
        # (cbSize + samplesPerBlock) + fact chunk with the frame count
        if fmt == "ima_adpcm":
            body = _encode_ima_mono(pcm, block_align)
            code = 0x11
            spb = (block_align - 4) * 2 + 1
            ext = struct.pack("<H", spb)
        else:
            body = _encode_ms_mono(pcm, block_align)
            code = 0x02
            spb = (block_align - 7) * 2 + 2
            # MS ADPCM extension: samplesPerBlock, numCoef, coef pairs
            ext = struct.pack("<HH", spb, 7) + b"".join(
                struct.pack("<hh", int(a), int(b))
                for a, b in zip(_MS_COEFF1, _MS_COEFF2))
        brate = sr * block_align // spb
        fmt_chunk = (struct.pack("<HHIIHH", code, 1, sr, brate,
                                 block_align, 4)
                     + struct.pack("<H", len(ext)) + ext)
        out = b"WAVE"
        out += b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        out += b"fact" + struct.pack("<II", 4, len(pcm))
        out += b"data" + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            out += b"\x00"
        return b"RIFF" + struct.pack("<I", len(out)) + out
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
