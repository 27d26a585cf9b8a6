"""Tile change detection vs an independent numpy oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.kernels import png
from tilegrab_spark.operators.change import change_summary, tile_diff

SCHEMA = "cell_id long, bytes binary, w int, h int, fmt string"


def _raw(arr):
    return (bytes(arr.tobytes()), arr.shape[1], arr.shape[0], "raw")


def _rows(items):
    return [(k, *_raw(a)) for k, a in items]


def _mk(rng, shade):
    return np.full((8, 8, 3), shade, dtype=np.uint8) + rng.integers(
        0, 40, (8, 8, 3), dtype=np.uint8
    )


def test_tile_diff_statuses_and_stats(spark):
    rng = np.random.default_rng(7)
    base = _mk(rng, 50)
    shifted = base.copy()
    shifted[:4] = np.clip(shifted[:4].astype(np.int16) + 30, 0, 255).astype(np.uint8)
    other = _mk(rng, 150)
    big = np.zeros((16, 16, 3), dtype=np.uint8)

    a = spark.createDataFrame(
        _rows([(1, base), (2, base), (3, base), (5, base)]), SCHEMA
    )
    b = spark.createDataFrame(
        _rows([(1, base), (2, shifted), (4, other), (5, big)]), SCHEMA
    )
    got = {r.key: r for r in tile_diff(a, b, threshold=16).collect()}

    assert got[1].status == "unchanged" and got[1].psnr_db is None
    assert got[1].changed_frac == 0.0 and got[1].n_px == 64
    assert got[3].status == "removed" and got[3].n_px is None
    assert got[4].status == "added"
    assert got[5].status == "resized" and got[5].changed_frac is None

    # changed: oracle every stat independently
    d = np.abs(base.astype(np.int16) - shifted.astype(np.int16))
    dmax = d.max(axis=2)
    mse = float((d.astype(np.int64) ** 2).mean())
    r = got[2]
    assert r.status == "changed"
    assert r.changed_frac == pytest.approx(float((dmax > 16).mean()))
    assert r.mean_abs_diff == pytest.approx(float(dmax.mean()))
    assert r.psnr_db == pytest.approx(10 * np.log10(255.0**2 / mse))

    summary = {s.status: s.n for s in change_summary(tile_diff(a, b)).collect()}
    assert summary == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1, "resized": 1}


def test_tile_diff_decode_error_surfaces(spark):
    rng = np.random.default_rng(1)
    base = _mk(rng, 90)
    a = spark.createDataFrame(_rows([(9, base)]), SCHEMA)
    b = spark.createDataFrame(
        [(9, b"\x89PNG-not-really", 8, 8, "png")], SCHEMA
    )
    got = tile_diff(a, b).collect()
    assert len(got) == 1 and got[0].status == "error"
    assert got[0].changed_frac is None


def test_tile_diff_mixed_formats(spark):
    """A raw epoch-A tile vs the same pixels re-encoded PNG in epoch B
    must compare as unchanged (codecs are lossless)."""
    rng = np.random.default_rng(3)
    arr = _mk(rng, 120)
    a = spark.createDataFrame(_rows([(1, arr)]), SCHEMA)
    b = spark.createDataFrame(
        [(1, bytes(png.encode_png(arr)), 8, 8, "png")], SCHEMA
    )
    got = tile_diff(a, b).collect()
    assert got[0].status == "unchanged"


def test_tile_diff_on_synthetic_image_table(spark, tmp_path):
    """End-to-end over the real image-table source: epoch B re-renders a
    subset of cells from a different src; exactly those flip to changed."""
    from tilegrab_spark.sources.images import (
        read_image_table,
        write_synthetic_image_table,
    )

    cells = [(16, 47439 + i, 31441, 0) for i in range(6)]
    cells_b = [(z, x, y, 1 if x % 2 else 0) for z, x, y, _ in cells]
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    write_synthetic_image_table(spark, pa, cells, n_buckets=2)
    write_synthetic_image_table(spark, pb, cells_b, n_buckets=2)
    ra = read_image_table(spark, pa)
    rb = read_image_table(spark, pb)
    got = tile_diff(ra, rb)
    assert got.count() == 6
    by_x = {
        r.x: r.status
        for r in ra.select("x", "cell_id").join(got, ra.cell_id == got.key).collect()
    }
    for x in range(47439, 47445):
        assert by_x[x] == ("changed" if x % 2 else "unchanged")


def test_byte_identical_fast_path(spark, monkeypatch):
    """Bit-identical payloads short-circuit JVM-side: status=unchanged
    with zero diff stats — even for payloads the decoder cannot read
    (proof no decode ran on the fast path)."""
    from tilegrab_spark.operators.change import tile_diff

    garbage = bytes(range(64)) * 8  # not a decodable image
    rows_a = [(1, garbage, 16, 16, "png"), (2, garbage, 16, 16, "png")]
    rows_b = [(1, garbage, 16, 16, "png"), (2, b"\x00" + garbage, 16, 16, "png")]
    schema = "cell_id long, bytes binary, w int, h int, fmt string"
    a = spark.createDataFrame(rows_a, schema)
    b = spark.createDataFrame(rows_b, schema)
    out = {r.key: r for r in tile_diff(a, b).collect()}
    assert out[1].status == "unchanged"
    assert out[1].n_px == 256 and out[1].changed_frac == 0.0
    assert out[1].mean_abs_diff == 0.0 and out[1].psnr_db is None
    # differing undecodable payloads still surface as error via the kernel
    assert out[2].status == "error"


def test_equal_bytes_mismatched_dims_go_slow_path(spark, image_table):
    """Equal bytes but disagreeing declared dims must NOT trust
    metadata — they route to the decoding kernel."""
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.change import tile_diff
    from tilegrab_spark.kernels.png import encode_png, synth_tile_pixels

    px = synth_tile_pixels(5, 6, 10, 0)
    payload = encode_png(px)
    schema = "cell_id long, bytes binary, w int, h int, fmt string"
    a = spark.createDataFrame([(9, payload, 256, 256, "png")], schema)
    b = spark.createDataFrame([(9, payload, 128, 256, "png")], schema)
    r = tile_diff(a, b).collect()[0]
    # decoded: both streams identical -> unchanged, n_px from the DECODE
    assert r.status == "unchanged"
    assert r.n_px == px.shape[0] * px.shape[1]


def _ssim_loop_oracle(pa, pb, win=8):
    """Independent per-window loop re-derivation of mean SSIM (uniform
    8x8 non-overlapping, Rec.601 luma, Wang constants)."""
    wgt = np.array([0.299, 0.587, 0.114])
    a = (pa[:, :, :3].astype(np.float64) * wgt).sum(axis=2)
    b = (pb[:, :, :3].astype(np.float64) * wgt).sum(axis=2)
    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    vals = []
    for r in range(0, a.shape[0] - win + 1, win):
        for c in range(0, a.shape[1] - win + 1, win):
            wa = a[r : r + win, c : c + win].ravel()
            wb = b[r : r + win, c : c + win].ravel()
            ma, mb = wa.mean(), wb.mean()
            va, vb = wa.var(), wb.var()
            cov = ((wa - ma) * (wb - mb)).mean()
            vals.append(
                ((2 * ma * mb + C1) * (2 * cov + C2))
                / ((ma**2 + mb**2 + C1) * (va + vb + C2))
            )
    return float(np.mean(vals))


def test_ssim_vs_loop_oracle_and_properties(spark):
    from tilegrab_spark.operators.change import mean_ssim, tile_diff

    rng = np.random.default_rng(41)
    base = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    noisy = np.clip(
        base.astype(np.int16) + rng.integers(-25, 26, base.shape), 0, 255
    ).astype(np.uint8)
    inverted = (255 - base).astype(np.uint8)

    # kernel vs the independent loop oracle
    assert mean_ssim(base, noisy) == pytest.approx(_ssim_loop_oracle(base, noisy), abs=1e-12)
    # identity and ordering properties
    assert mean_ssim(base, base) == pytest.approx(1.0)
    assert mean_ssim(base, noisy) > mean_ssim(base, inverted)
    # flat pair: constants keep it defined and exactly 1 when equal
    flat = np.full((16, 16, 3), 100, np.uint8)
    assert mean_ssim(flat, flat) == pytest.approx(1.0)
    # smaller than a window -> None
    assert mean_ssim(base[:4, :4], noisy[:4, :4]) is None

    # through tile_diff: changed rows carry the kernel value; identical
    # rows pin ssim = 1.0 on both fast and decoded paths
    schema = "cell_id long, bytes binary, w int, h int, fmt string"
    a = spark.createDataFrame(_rows([(1, base), (2, base)]), schema)
    b = spark.createDataFrame(_rows([(1, base), (2, noisy)]), schema)
    out = {r.key: r for r in tile_diff(a, b).collect()}
    assert out[1].status == "unchanged" and out[1].ssim == 1.0
    assert out[2].status == "changed"
    assert out[2].ssim == pytest.approx(_ssim_loop_oracle(base, noisy), abs=1e-12)
