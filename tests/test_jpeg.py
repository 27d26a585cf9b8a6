"""Baseline JPEG codec (kernels/jpeg.py) — the lossy payload path of the
input_hint ("decoded-pixel allclose, PSNR>=40dB for lossy"): round-trip
fidelity, odd sizes, and the Spark integration points (verify_images,
mosaic stitch) on fmt='jpg' rows."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tilegrab_spark.kernels import jpeg, png


def _natural(h=96, w=96):
    """Smooth photographic-like content (JPEG's design target)."""
    x = np.linspace(0, 4 * np.pi, w)
    y = np.linspace(0, 4 * np.pi, h)
    g = np.sin(x)[None, :] * np.cos(y)[:, None] * 100 + 128
    arr = np.stack([g, np.roll(g, 7, 0), np.roll(g, 13, 1)], axis=-1)
    return arr.clip(0, 255).astype(np.uint8)


def test_roundtrip_psnr_gate():
    arr = _natural()
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=90))
    assert dec.shape == arr.shape
    assert jpeg.psnr(arr, dec) >= 40.0
    # synthetic tiles (hard high-frequency content) still clear the gate
    tile = png.synth_tile_pixels(23000, 15000, 15, 0, 64, 64)
    dec2 = jpeg.decode_jpeg(jpeg.encode_jpeg(tile, quality=95))
    assert jpeg.psnr(tile, dec2) >= 40.0


def test_constant_and_odd_sizes():
    flat = np.full((50, 70, 3), 130, np.uint8)  # non-multiple-of-8 dims
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(flat, quality=85))
    assert dec.shape == (50, 70, 3)
    assert jpeg.psnr(flat, dec) >= 50.0
    one = np.full((8, 8, 3), 255, np.uint8)
    assert jpeg.psnr(one, jpeg.decode_jpeg(jpeg.encode_jpeg(one))) >= 50.0


def test_quality_tradeoff_monotone():
    arr = _natural()
    sizes = [len(jpeg.encode_jpeg(arr, quality=q)) for q in (50, 75, 95)]
    assert sizes[0] < sizes[1] < sizes[2]
    p50 = jpeg.psnr(arr, jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=50)))
    p95 = jpeg.psnr(arr, jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=95)))
    assert p95 > p50


def test_verify_images_lossy_rows(spark):
    """verify_images on fmt='jpg': decode works, PSNR vs the synthetic
    oracle clears 40dB, phash of DECODED pixels matches, caption ok."""
    from tilegrab_spark.operators.verify import verify_images
    from tilegrab_spark.sources.images import expected_pixels, synth_caption

    rows = []
    for x, y in ((47439, 31441), (47440, 31442)):
        iid = f"16_{x}_{y}_0"
        arr = expected_pixels(iid, 64, 64)
        data = jpeg.encode_jpeg(arr, quality=95)
        dec = jpeg.decode_jpeg(data)
        rows.append(
            {
                "image_id": iid,
                "bytes": data,
                "w": 64,
                "h": 64,
                "fmt": "jpg",
                "caption": synth_caption(16, x, y, 0, int(arr.sum())),
                "phash": png.phash64(dec),
            }
        )
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    got = {r.image_id: r for r in verify_images(df).collect()}
    for iid, r in got.items():
        assert r.decode_ok and r.caption_match, iid
        assert r.psnr >= 40.0, (iid, r.psnr)
        assert r.phash_match, iid


def test_mosaic_stitches_jpeg_tiles(spark):
    """A joined set of fmt='jpg' tiles stitches into a canvas within
    40dB of the lossless oracle canvas."""
    from tests.conftest import oracle_canvas
    from tilegrab_spark.operators.mosaic import mosaic

    z, x0, y0 = 16, 47439, 31441
    rows = []
    for i in range(2):
        for j in range(2):
            arr = png.synth_tile_pixels(x0 + i, y0 + j, z, 0)
            rows.append(
                {
                    "geom_id": "g",
                    "z": z,
                    "x": x0 + i,
                    "y": y0 + j,
                    "bytes": jpeg.encode_jpeg(arr, quality=95),
                    "fmt": "jpg",
                    "image_id": f"{z}_{x0+i}_{y0+j}_0",
                }
            )
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        "geom_id string, z int, x long, y long, bytes binary, fmt string, image_id string",
    )
    r = mosaic(df).collect()[0]
    assert r.n_tiles == 4 and r.n_bad == 0
    got = png.decode_png(bytes(r.bytes))
    want = oracle_canvas([(x0 + i, y0 + j) for i in range(2) for j in range(2)], x0, y0, 2, 2)
    assert jpeg.psnr(got, want) >= 40.0


def test_420_subsampling_roundtrip():
    """4:2:0 (the wild-world default) round-trips through our own
    encoder+decoder above the 40dB gate, with a smaller file than 4:4:4;
    odd (non-multiple-of-16) dimensions pad and crop correctly."""
    arr = _natural(104, 120)  # not multiples of 16
    d444 = jpeg.encode_jpeg(arr, quality=90, subsampling="444")
    d420 = jpeg.encode_jpeg(arr, quality=90, subsampling="420")
    assert len(d420) < len(d444)
    dec = jpeg.decode_jpeg(d420)
    assert dec.shape == arr.shape
    assert jpeg.psnr(arr, dec) >= 40.0
    # tiny image smaller than one MCU (smooth ramp: _natural at this size
    # would be near-Nyquist content, which is a content problem, not a
    # codec one)
    ramp = np.linspace(60, 200, 12, dtype=np.uint8)
    small = np.repeat(ramp[None, :, None], 10, axis=0).repeat(3, axis=2)
    ds = jpeg.decode_jpeg(jpeg.encode_jpeg(small, quality=90, subsampling="420"))
    assert ds.shape == small.shape
    assert jpeg.psnr(small, ds) >= 35.0


def test_corrupt_jpeg_raises_valueerror_and_verify_survives(spark):
    """Malformed JPEG bytes raise ValueError (never IndexError /
    struct.error), so verify_images emits decode_ok=False instead of
    crashing the task."""
    import pytest

    from tilegrab_spark.operators.verify import verify_images

    for bad in (b"\xff\xd8", b"\xff\xd8\xff", b"\xff\xd8\xff\xc0\x00"):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(bad)
    df = spark.createDataFrame(
        pd.DataFrame(
            [{"image_id": "16_1_1_0", "bytes": b"\xff\xd8\xff\xc0\x00",
              "w": 8, "h": 8, "fmt": "jpg", "caption": "x", "phash": 0}]
        ),
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    r = verify_images(df).collect()[0]
    assert not r.decode_ok and not r.phash_match


def test_restart_interval_roundtrip():
    """DRI + RSTn markers (what most wild-world encoders emit by
    default): our encoder can emit them and our decoder consumes them —
    the decode is bit-identical to the same image without restarts."""
    arr = _natural(80, 96)
    plain = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=90))
    for sub in ("444", "420"):
        for ri in (1, 3, 7):
            data = jpeg.encode_jpeg(arr, quality=90, subsampling=sub, restart_interval=ri)
            assert b"\xff\xdd" in data  # DRI present
            dec = jpeg.decode_jpeg(data)
            assert dec.shape == arr.shape
            assert jpeg.psnr(arr, dec) >= 40.0
    # restart path must not change pixels at all vs the no-restart stream
    d_ri = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=90, restart_interval=2))
    assert np.array_equal(d_ri, plain)


def test_truncated_entropy_stream_raises():
    """A stream cut mid-scan raises ValueError (bit() underflow) instead
    of silently decoding the remaining MCUs from zero bits."""
    import pytest

    arr = _natural(96, 96)
    data = jpeg.encode_jpeg(arr, quality=90)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(data[: int(len(data) * 0.7)])
    # with restart markers too
    data_ri = jpeg.encode_jpeg(arr, quality=90, restart_interval=2)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(data_ri[: int(len(data_ri) * 0.7)])


def test_progressive_jpeg_routes_to_n_bad(spark):
    """Well-formed progressive (SOF2) streams now DECODE (see
    test_progressive_roundtrip); a MALFORMED one — here a baseline
    stream whose SOF marker was rewritten to SOF2, making its single
    full-spectral scan illegal for progressive — still raises ValueError
    and routes into the mosaic's n_bad count, never rendering silently
    black into exported artifacts."""
    import pytest

    from tests.conftest import oracle_canvas
    from tilegrab_spark.operators.mosaic import mosaic

    arr = _natural(64, 64)
    data = bytearray(jpeg.encode_jpeg(arr, quality=90))
    sof0 = data.find(b"\xff\xc0")
    data[sof0 + 1] = 0xC2  # rewrite SOF0 -> SOF2 (now an illegal scan)
    prog = bytes(data)
    with pytest.raises(ValueError, match="spectral"):
        jpeg.decode_jpeg(prog)

    z, x0, y0 = 16, 47439, 31441
    rows = []
    for i, (dx, dy) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
        good = png.synth_tile_pixels(x0 + dx, y0 + dy, z, 0)
        rows.append(
            {
                "geom_id": "g", "z": z, "x": x0 + dx, "y": y0 + dy,
                "bytes": prog if i == 3 else jpeg.encode_jpeg(good, quality=95),
                "fmt": "jpg", "image_id": f"{z}_{x0+dx}_{y0+dy}_0",
            }
        )
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        "geom_id string, z int, x long, y long, bytes binary, fmt string, image_id string",
    )
    r = mosaic(df).collect()[0]
    assert r.n_tiles == 3 and r.n_bad == 1  # progressive tile counted bad
    got = png.decode_png(bytes(r.bytes))
    want = oracle_canvas([(x0, y0), (x0 + 1, y0), (x0, y0 + 1)], x0, y0, 2, 2)
    # the three good tiles still land; the bad quadrant stays zeroed
    assert jpeg.psnr(got[:256, :256], want[:256, :256]) >= 40.0


def test_16bit_quant_tables_decode():
    """Pq=1 (16-bit) quantization tables — emitted by wild encoders at
    very high quality. Rewrite our encoder's 8-bit DQT segments as
    16-bit with identical values: pixels must decode identically."""
    import struct

    arr = _natural(48, 48)
    data = jpeg.encode_jpeg(arr, quality=90)
    out = bytearray()
    pos = 0
    while pos < len(data):
        if data[pos] == 0xFF and pos + 1 < len(data) and data[pos + 1] == 0xDB:
            (seglen,) = struct.unpack_from(">H", data, pos + 2)
            seg = data[pos + 4 : pos + 2 + seglen]
            tid = seg[0] & 0x0F
            vals = seg[1:65]
            new_seg = bytes([0x10 | tid]) + b"".join(
                struct.pack(">H", v) for v in vals
            )
            out += b"\xff\xdb" + struct.pack(">H", 2 + len(new_seg)) + new_seg
            pos += 2 + seglen
        else:
            out.append(data[pos])
            pos += 1
    got = jpeg.decode_jpeg(bytes(out))
    want = jpeg.decode_jpeg(data)
    assert np.array_equal(got, want)


def test_progressive_roundtrip():
    """Progressive (SOF2) decode: spectral selection + successive
    approximation + EOB runs + refinement correction bits. Oracle: the
    progressive encoding carries the SAME quantized coefficients as the
    baseline encoding, so decoded pixels must be bit-identical."""
    tile = png.synth_tile_pixels(23000, 15000, 15, 0, 64, 64)
    cases = [
        (_natural(96, 96), 90, 1),
        (_natural(50, 70), 85, 1),   # odd dims
        (_natural(64, 64), 75, 3),   # three refinement levels
        (tile, 95, 1),               # near-Nyquist content
        (tile, 50, 1),               # heavy quantization -> long EOB runs
        (np.full((24, 40, 3), 130, np.uint8), 90, 1),
    ]
    for arr, q, al in cases:
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=q))
        data = jpeg.encode_jpeg_progressive(arr, quality=q, al=al)
        assert np.array_equal(jpeg.decode_jpeg(data), base), (q, al, arr.shape)


def test_progressive_truncation_raises():
    import pytest

    data = jpeg.encode_jpeg_progressive(_natural(64, 64), quality=90)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(data[: int(len(data) * 0.6)])


def test_progressive_in_mosaic(spark):
    """A progressive tile stitches pixel-identically to its baseline
    encoding inside the Spark mosaic reducer."""
    import pandas as pd

    from tilegrab_spark.operators.mosaic import mosaic

    z, x0, y0 = 16, 47439, 31441
    rows = []
    for i, (dx, dy) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
        arr = png.synth_tile_pixels(x0 + dx, y0 + dy, z, 0, 64, 64)
        enc = jpeg.encode_jpeg_progressive if i == 2 else jpeg.encode_jpeg
        rows.append(
            {"geom_id": "g", "z": z, "x": x0 + dx, "y": y0 + dy,
             "bytes": enc(arr, quality=95), "fmt": "jpg",
             "image_id": f"{z}_{x0+dx}_{y0+dy}_0"}
        )
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        "geom_id string, z int, x long, y long, bytes binary, fmt string, image_id string",
    )
    out = mosaic(df, tile_w=64, tile_h=64).collect()[0]
    assert out.n_tiles == 4 and out.n_bad == 0


def test_progressive_420_roundtrip():
    """4:2:0 progressive (the most common wild-JPEG shape): interleaved
    DC scans follow the MCU traversal (four Y blocks + Cb + Cr) and the
    non-interleaved AC scans cover each component's ACTUAL block grid
    (excluding MCU padding). Oracle: bit-identical to the 4:2:0 baseline
    encoding — same coefficients, different scan order."""
    tile = png.synth_tile_pixels(23000, 15000, 15, 0, 64, 64)
    cases = [
        (_natural(96, 96), 90, 1),
        (_natural(104, 120), 75, 2),  # non-multiple-of-16 dims
        (_natural(50, 70), 85, 1),    # Y grid carries MCU-padding blocks
        (tile, 75, 1),
    ]
    for arr, q, al in cases:
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=q, subsampling="420"))
        data = jpeg.encode_jpeg_progressive(arr, quality=q, al=al, subsampling="420")
        assert np.array_equal(jpeg.decode_jpeg(data), base), (q, al, arr.shape)
