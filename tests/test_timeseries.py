"""Epoch-stack composite / trend vs independent numpy oracles."""

import numpy as np
import pytest

from tilegrab_spark.kernels import png
from tilegrab_spark.operators.timeseries import epoch_composite, raster_trend

SCHEMA = "cell_id long, epoch double, bytes binary, w int, h int, fmt string"


def _raw(arr):
    return (bytes(arr.tobytes()), arr.shape[1], arr.shape[0], "raw")


def _rows(items):
    return [(k, float(e), *_raw(a)) for k, e, a in items]


def _stack(rng, n, shape=(8, 8, 3)):
    return [rng.integers(0, 256, shape, dtype=np.uint8) for _ in range(n)]


def test_median_composite_odd_exact(spark):
    rng = np.random.default_rng(3)
    tiles = _stack(rng, 5)
    df = spark.createDataFrame(_rows([(1, e, a) for e, a in enumerate(tiles)]), SCHEMA)
    [r] = epoch_composite(df).collect()
    assert (r.status, r.n_epochs, r.n_used, r.n_bad) == ("ok", 5, 5, 0)
    got = png.decode_png(bytes(r.bytes))
    want = np.median(np.stack(tiles), axis=0).astype(np.uint8)  # odd n: exact
    assert np.array_equal(got, want)
    assert (r.w, r.h, r.fmt) == (8, 8, "png")


def test_median_even_rounds_half_up(spark):
    a = np.full((2, 2, 3), 10, dtype=np.uint8)
    b = np.full((2, 2, 3), 11, dtype=np.uint8)
    df = spark.createDataFrame(_rows([(1, 0, a), (1, 1, b)]), SCHEMA)
    [r] = epoch_composite(df, stat="median").collect()
    assert np.array_equal(
        png.decode_png(bytes(r.bytes)), np.full((2, 2, 3), 11, dtype=np.uint8)
    )


def test_mean_composite_round_half_up(spark):
    rng = np.random.default_rng(4)
    tiles = _stack(rng, 4)
    df = spark.createDataFrame(_rows([(1, e, a) for e, a in enumerate(tiles)]), SCHEMA)
    [r] = epoch_composite(df, stat="mean").collect()
    got = png.decode_png(bytes(r.bytes))
    s = np.stack(tiles).astype(np.int64).sum(axis=0)
    want = ((s * 2 + 4) // 8).astype(np.uint8)  # round-half-up of s/4
    assert np.array_equal(got, want)


def test_trend_matches_numpy_ols(spark):
    rng = np.random.default_rng(5)
    epochs = [0.0, 3.0, 7.0, 10.0]
    tiles = _stack(rng, len(epochs))
    rows = _rows([(1, e, a) for e, a in zip(epochs, tiles)])
    df = spark.createDataFrame(rows, SCHEMA)
    [r] = raster_trend(df, threshold=1.0).collect()
    assert (r.status, r.n_used) == ("ok", 4)

    e = np.asarray(epochs)
    z = np.stack([t.max(axis=2).astype(np.float64) for t in tiles])
    w = e - e.mean()
    slopes = np.tensordot(w, z, axes=(0, 0)) / (w * w).sum()
    assert r.slope_mean == pytest.approx(slopes.mean(), rel=1e-12)
    assert r.slope_min == pytest.approx(slopes.min(), rel=1e-12)
    assert r.slope_max == pytest.approx(slopes.max(), rel=1e-12)
    assert r.frac_inc == pytest.approx((slopes > 1.0).mean())
    assert r.frac_dec == pytest.approx((slopes < -1.0).mean())


def test_trend_linear_ramp_exact_slope(spark):
    # z = 10 + 5*e everywhere -> every pixel's slope is exactly 5
    tiles = [(np.full((4, 4, 3), 10 + 5 * e, dtype=np.uint8)) for e in range(4)]
    df = spark.createDataFrame(_rows([(9, e, a) for e, a in enumerate(tiles)]), SCHEMA)
    [r] = raster_trend(df).collect()
    assert r.slope_mean == pytest.approx(5.0)
    assert r.slope_min == pytest.approx(5.0) and r.slope_max == pytest.approx(5.0)
    assert r.frac_inc == 1.0 and r.frac_dec == 0.0


def test_bad_payload_and_dims_mismatch_counted(spark):
    rng = np.random.default_rng(6)
    good = _stack(rng, 3)
    small = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    rows = _rows([(1, e, a) for e, a in enumerate(good)])
    rows.append((1, 3.0, b"corrupt", 8, 8, "png"))
    rows.append((1, 4.0, *_raw(small)))  # dims mismatch vs first usable
    df = spark.createDataFrame(rows, SCHEMA)
    [r] = epoch_composite(df).collect()
    assert (r.n_epochs, r.n_used, r.n_bad) == (5, 3, 2)
    want = np.median(np.stack(good), axis=0).astype(np.uint8)
    assert np.array_equal(png.decode_png(bytes(r.bytes)), want)
    # first-usable rule: the 8x8 epoch-0 tile sets the dims
    assert (r.w, r.h) == (8, 8)


def test_all_bad_group_is_empty(spark):
    df = spark.createDataFrame([(1, 0.0, b"x", 8, 8, "png")], SCHEMA)
    [r] = epoch_composite(df).collect()
    assert (r.status, r.n_used, r.n_bad) == ("empty", 0, 1)
    assert r.bytes is None and r.w is None


def test_trend_short_groups(spark):
    rng = np.random.default_rng(7)
    a, b = _stack(rng, 2)
    rows = _rows([(1, 0, a)])  # single epoch
    rows += _rows([(2, 5, a), (2, 5, b)])  # duplicate epoch value
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.key: r for r in raster_trend(df).collect()}
    assert got[1].status == "short" and got[1].slope_mean is None
    assert got[2].status == "short"


def test_partitioning_invariance(spark):
    rng = np.random.default_rng(8)
    rows = []
    for k in range(6):
        for e, a in enumerate(_stack(rng, 3)):
            rows.append((k, float(e), *_raw(a)))
    df = spark.createDataFrame(rows, SCHEMA)
    one = {r.key: bytes(r.bytes) for r in epoch_composite(df).collect()}
    two = {
        r.key: bytes(r.bytes) for r in epoch_composite(df.repartition(7)).collect()
    }
    assert one == two
    t1 = {r.key: r.slope_mean for r in raster_trend(df).collect()}
    t2 = {r.key: r.slope_mean for r in raster_trend(df.repartition(13)).collect()}
    assert t1 == t2


def test_validation(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError, match="stat"):
        epoch_composite(df, stat="mode")
    with pytest.raises(ValueError, match="threshold"):
        raster_trend(df, threshold=-1)


def test_max_min_composite_whole_pixel_select(spark):
    rng = np.random.default_rng(9)
    tiles = _stack(rng, 4)
    df = spark.createDataFrame(_rows([(1, e, a) for e, a in enumerate(tiles)]), SCHEMA)
    st = np.stack(tiles).astype(np.int64)
    inten = st.max(axis=3)
    for stat, pick in (("max", inten.argmax(axis=0)), ("min", inten.argmin(axis=0))):
        [r] = epoch_composite(df, stat=stat).collect()
        got = png.decode_png(bytes(r.bytes))
        want = np.take_along_axis(st, pick[None, :, :, None], axis=0)[0].astype(np.uint8)
        assert np.array_equal(got, want), stat
        # whole-pixel invariant: every output pixel equals SOME epoch's
        # pixel verbatim (no cross-epoch channel mixing)
        match = (st == got[None].astype(np.int64)).all(axis=3).any(axis=0)
        assert match.all(), stat


def test_max_composite_tie_breaks_to_earliest(spark):
    a = np.full((2, 2, 3), 50, dtype=np.uint8)
    b = np.full((2, 2, 3), 50, dtype=np.uint8)
    b[:, :, 0] = 40  # same max channel (50), different pixel
    df = spark.createDataFrame(_rows([(1, 0, a), (1, 1, b)]), SCHEMA)
    [r] = epoch_composite(df, stat="max").collect()
    assert np.array_equal(png.decode_png(bytes(r.bytes)), a)


def test_latest_valid_gap_fill(spark):
    # epoch 0: full scene; epoch 1: right half clouded out (nodata);
    # epoch 2: only top-left quadrant valid
    e0 = np.full((4, 4, 3), 100, dtype=np.uint8)
    e1 = np.full((4, 4, 3), 150, dtype=np.uint8); e1[:, 2:] = 0
    e2 = np.zeros((4, 4, 3), dtype=np.uint8); e2[:2, :2] = 200
    df = spark.createDataFrame(_rows([(1, 0, e0), (1, 1, e1), (1, 2, e2)]), SCHEMA)
    [r] = epoch_composite(df, stat="latest_valid").collect()
    got = png.decode_png(bytes(r.bytes))
    want = np.full((4, 4, 3), 0, dtype=np.uint8)
    want[:, :] = 100          # epoch 0 everywhere...
    want[:, :2] = 150         # ...epoch 1's valid left half wins...
    want[:2, :2] = 200        # ...epoch 2's quadrant wins on top
    assert np.array_equal(got, want)


def test_latest_valid_all_nodata_pixel_stays_nodata(spark):
    e0 = np.zeros((2, 2, 3), dtype=np.uint8); e0[0, 0] = 9
    e1 = np.zeros((2, 2, 3), dtype=np.uint8)
    df = spark.createDataFrame(_rows([(1, 0, e0), (1, 1, e1)]), SCHEMA)
    [r] = epoch_composite(df, stat="latest_valid").collect()
    got = png.decode_png(bytes(r.bytes))
    assert got[0, 0, 0] == 9 and (got[0, 1] == 0).all() and (got[1, 1] == 0).all()


def test_composite_stat_validation(spark):
    df = spark.createDataFrame(_rows([(1, 0, np.zeros((2, 2, 3), dtype=np.uint8))]), SCHEMA)
    with pytest.raises(ValueError):
        epoch_composite(df, stat="mode")
    with pytest.raises(ValueError):
        epoch_composite(df, stat="latest_valid", nodata=(0, 0))
