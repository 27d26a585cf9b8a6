"""Fuzz pass over the metadata kernels (same contract as
test_fuzz_codecs): every mutated stream must either parse/strip or
raise ValueError promptly — never another exception class, never a
hang. Stripping a mutated-but-strippable stream must still yield a
stream whose own parse obeys the same contract."""

import time
import zlib

import numpy as np
import pytest

from tilegrab_spark.kernels import exif, jpeg, png

SEED = 20260819
TIME_BUDGET_S = 10.0


def _img(h=24, w=32):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    return np.clip(
        np.stack([xx * 3, yy * 5, xx + yy], -1), 0, 255
    ).astype(np.uint8)


_TAGGED_JPEG = exif.inject_jpeg_app1(
    jpeg.encode_jpeg(_img()),
    exif.build_exif_app1(
        make="FuzzCam", model="F-1", orientation=3,
        datetime="2026:08:19 10:00:00",
        lon=11.5755, lat=48.1374, alt_m=-7.25,
    ),
)
_base_png = png.encode_png(_img())
_iend = _base_png.rfind(b"IEND") - 4
_TAGGED_PNG = (
    _base_png[:_iend]
    + exif.build_png_text_chunk("Author", "fuzz")
    + exif.build_png_text_chunk("Z", "x" * 120, kind="zTXt")
    + exif.build_png_text_chunk("I", "unicodé", kind="iTXt")
    + _base_png[_iend:]
)

_TARGETS = {
    "jpeg_parse": (_TAGGED_JPEG, exif.parse_jpeg_exif),
    "jpeg_strip": (_TAGGED_JPEG, exif.strip_jpeg_metadata),
    "png_parse": (_TAGGED_PNG, exif.parse_png_text),
    "png_strip": (_TAGGED_PNG, exif.strip_png_metadata),
}


def _mutations(data: bytes, rng: np.random.Generator):
    n = len(data)
    muts = []
    for off in rng.integers(1, n, 8):
        muts.append(data[: int(off)])
    for off in rng.integers(0, n, 16):
        b = bytearray(data)
        b[int(off)] ^= int(rng.integers(1, 256))
        muts.append(bytes(b))
    for off in rng.integers(0, max(1, n - 4), 8):
        b = bytearray(data)
        b[int(off): int(off) + 4] = b"\xff\xff\xff\xff"
        muts.append(bytes(b))
    for off in rng.integers(0, n, 8):
        b = bytearray(data)
        b[int(off)] = 0
        muts.append(bytes(b))
    return muts


@pytest.mark.parametrize("target", sorted(_TARGETS))
def test_fuzz_metadata_no_crash(target):
    base, fn = _TARGETS[target]
    # zlib.crc32, not hash(): str hashing is PYTHONHASHSEED-randomized,
    # which would make the fuzz corpus differ between runs.
    rng = np.random.default_rng(SEED + zlib.crc32(target.encode()) % 1000)
    t0 = time.monotonic()
    n_ok = n_bad = 0
    for mut in _mutations(base, rng):
        try:
            out = fn(mut)
            n_ok += 1
            if target.endswith("_strip"):
                # a stripped stream must itself obey the parse contract
                parse = (
                    exif.parse_jpeg_exif
                    if target.startswith("jpeg")
                    else exif.parse_png_text
                )
                try:
                    parse(out)
                except ValueError:
                    pass
        except ValueError:
            n_bad += 1
    assert n_ok + n_bad == 40
    assert time.monotonic() - t0 < TIME_BUDGET_S
