"""Histogram statistics + histogram matching: numpy-oracle equality,
self-match identity, brightened-epoch recovery, bad-tile surfacing."""

import numpy as np
import pytest

from tilegrab_spark.kernels.png import decode_png, encode_png
from tilegrab_spark.operators.histmatch import (
    build_matching_lut,
    channel_histograms,
    match_histograms,
)

TP = 16


def _tile_df(spark, arrays, fmts=None):
    rows = []
    for i, a in enumerate(arrays):
        fmt = (fmts or {}).get(i, "png")
        data = encode_png(a, filter_type=0) if fmt == "png" else a
        rows.append((f"t{i}", bytearray(data), a.shape[1] if fmt == "png" else TP,
                     a.shape[0] if fmt == "png" else TP, fmt))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def _rand_tiles(seed, n, lo=0, hi=256):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(lo, hi, size=(TP, TP, 3)).astype(np.uint8) for _ in range(n)
    ]


def test_channel_histograms_match_numpy(spark):
    tiles = _rand_tiles(1, 5)
    got = {
        (r.channel, r.value): r["count"]
        for r in channel_histograms(_tile_df(spark, tiles)).collect()
    }
    want = {}
    stack = np.stack(tiles)
    for c in range(3):
        h = np.bincount(stack[:, :, :, c].ravel(), minlength=256)
        for v in np.nonzero(h)[0]:
            want[(c, int(v))] = int(h[v])
    assert got == want


def test_build_lut_matches_numpy_rule(spark):
    src = _rand_tiles(2, 3)
    ref = _rand_tiles(3, 3, lo=50, hi=200)
    hs = channel_histograms(_tile_df(spark, src)).collect()
    hr = channel_histograms(_tile_df(spark, ref)).collect()
    lut = build_matching_lut(hs, hr)
    # independent scalar-loop rule
    for c in range(3):
        hsrc = np.zeros(256)
        href = np.zeros(256)
        for r in hs:
            if r.channel == c:
                hsrc[r.value] = r["count"]
        for r in hr:
            if r.channel == c:
                href[r.value] = r["count"]
        cs = np.cumsum(hsrc) / hsrc.sum()
        cr = np.cumsum(href) / href.sum()
        for v in range(256):
            u = 0
            while u < 255 and cr[u] < cs[v] - 1e-12:
                u += 1
            assert lut[c, v] == u, (c, v)


def test_self_match_is_identity(spark):
    tiles = _rand_tiles(4, 4)
    df = _tile_df(spark, tiles)
    h = channel_histograms(df)
    out = match_histograms(df, h, src_hist=h).collect()
    assert all(r.matched for r in out)
    by_id = {r.image_id: decode_png(bytes(r.bytes)) for r in out}
    for i, a in enumerate(tiles):
        assert np.array_equal(by_id[f"t{i}"], a)


def test_brightness_shift_recovered(spark):
    """ref = original; src = original + 40 (saturating at 200 max so the
    shift is a bijection on occupied values): matching recovers the
    original pixels exactly."""
    base = _rand_tiles(5, 4, lo=0, hi=200)
    shifted = [(a + 40).astype(np.uint8) for a in base]
    ref_df = _tile_df(spark, base)
    src_df = _tile_df(spark, shifted)
    out = match_histograms(src_df, channel_histograms(ref_df)).collect()
    by_id = {r.image_id: decode_png(bytes(r.bytes)) for r in out}
    for i, a in enumerate(base):
        assert np.array_equal(by_id[f"t{i}"], a), i


def test_matched_histogram_equals_reference_cdf(spark):
    """After matching, the source's histogram CDF tracks the reference
    CDF within the source's own quantization granularity."""
    src = _rand_tiles(6, 4, lo=0, hi=120)
    ref = _rand_tiles(7, 4, lo=100, hi=256)
    matched = match_histograms(
        _tile_df(spark, src), channel_histograms(_tile_df(spark, ref))
    )
    hm = channel_histograms(matched.drop("matched")).collect()
    hr = channel_histograms(_tile_df(spark, ref)).collect()

    def cdf(rows, c):
        h = np.zeros(256)
        for r in rows:
            if r.channel == c:
                h[r.value] = r["count"]
        return np.cumsum(h) / h.sum()

    n_px = 4 * TP * TP
    for c in range(3):
        gap = np.abs(cdf(hm, c) - cdf(hr, c)).max()
        # worst-case step of either CDF bounds the achievable gap
        assert gap <= 3.0 / np.sqrt(n_px), (c, gap)


def test_bad_tiles_surface_not_drop(spark):
    good = _rand_tiles(8, 2)
    df = _tile_df(spark, good + [np.frombuffer(b"nonsense!" * 10, dtype=np.uint8)[:48].reshape(4, 4, 3)],
                  fmts={2: "png"})
    # replace tile 2's bytes with garbage that cannot decode
    rows = df.collect()
    rows[2] = (rows[2][0], bytearray(b"not a png"), TP, TP, "png")
    df2 = spark.createDataFrame(rows, df.schema)
    h = channel_histograms(df2)
    out = {r.image_id: r for r in match_histograms(df2, h).collect()}
    assert out["t2"].matched is False
    assert bytes(out["t2"].bytes) == b"not a png"
    assert out["t0"].matched and out["t1"].matched


def test_lut_identity_on_empty_channel():
    lut = build_matching_lut([], [])
    assert np.array_equal(lut, np.tile(np.arange(256, dtype=np.uint8), (3, 1)))
