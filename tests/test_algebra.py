"""Band math: expression compiler safety + stats vs numpy oracle."""

import numpy as np
import pytest

from tilegrab_spark.operators.algebra import (
    NAMED_INDEXES,
    band_math,
    compile_band_expr,
)

SCHEMA = "cell_id long, bytes binary, w int, h int, fmt string"


def test_compiler_matches_numpy():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    r, g, b = (px.astype(np.float64)[..., i] for i in range(3))
    cases = {
        "(g - r) / (g + r - b)": None,
        "2*g - r - b": 2 * g - r - b,
        "(r + g + b) / 3": (r + g + b) / 3,
        "-r + 2**3": -r + 8.0,
        "r / 255": r / 255,
    }
    with np.errstate(divide="ignore", invalid="ignore"):
        cases["(g - r) / (g + r - b)"] = (g - r) / (g + r - b)
    for expr, want in cases.items():
        got = compile_band_expr(expr)(px)
        np.testing.assert_allclose(got, want, equal_nan=True)
    # named index resolves to its formula
    np.testing.assert_allclose(
        compile_band_expr("exg")(px), compile_band_expr("2*g - r - b")(px)
    )


@pytest.mark.parametrize(
    "bad",
    [
        "__import__('os')",
        "r.mean()",
        "r[0]",
        "x + 1",
        "r if g else b",
        "lambda: 1",
        "r @ g",
        "f(r)",
        "r; g",
        "r >",
    ],
)
def test_compiler_rejects_everything_else(bad):
    with pytest.raises(ValueError):
        compile_band_expr(bad)


def _raw_rows(items):
    return [(k, bytes(a.tobytes()), a.shape[1], a.shape[0], "raw") for k, a in items]


def test_band_math_stats_oracle(spark):
    rng = np.random.default_rng(9)
    tiles = {k: rng.integers(0, 256, (8, 8, 3)).astype(np.uint8) for k in (1, 2, 3)}
    df = spark.createDataFrame(_raw_rows(tiles.items()), SCHEMA)
    got = {
        r.key: r
        for r in band_math(df, "gli", key_col="cell_id", threshold=0.0).collect()
    }
    run = compile_band_expr(NAMED_INDEXES["gli"])
    for k, px in tiles.items():
        idx = run(px)
        fin = idx[np.isfinite(idx)]
        r = got[k]
        assert r.decode_ok and r.n_px == 64 and r.n_finite == fin.size
        assert r.mean == pytest.approx(fin.mean())
        assert r.min == pytest.approx(fin.min()) and r.max == pytest.approx(fin.max())
        assert r.frac_above == pytest.approx((fin > 0.0).mean())


def test_band_math_nonfinite_and_errors_surface(spark):
    black = np.zeros((4, 4, 3), dtype=np.uint8)  # vari denominator 0 everywhere
    rows = _raw_rows([(1, black)]) + [(2, b"broken", 4, 4, "png")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.key: r for r in band_math(df, "vari").collect()}
    assert got[1].decode_ok and got[1].n_finite == 0 and got[1].mean is None
    assert got[2].decode_ok is False and got[2].n_px is None
    # no threshold -> frac_above stays null even with finite pixels
    gray = np.full((4, 4, 3), 9, dtype=np.uint8)
    got2 = band_math(
        spark.createDataFrame(_raw_rows([(3, gray)]), SCHEMA), "brightness"
    ).collect()[0]
    assert got2.frac_above is None and got2.mean == pytest.approx(9.0)


def test_band_math_group_rollup_is_algebraic(spark):
    """Recombining per-tile (sum, n_finite) gives the exact global mean."""
    from pyspark.sql import functions as F

    rng = np.random.default_rng(4)
    tiles = {k: rng.integers(0, 256, (8, 8, 3)).astype(np.uint8) for k in range(6)}
    df = spark.createDataFrame(_raw_rows(tiles.items()), SCHEMA)
    per_tile = band_math(df, "brightness")
    rolled = per_tile.agg(
        (F.sum("sum") / F.sum("n_finite")).alias("gmean")
    ).collect()[0]
    allpx = np.concatenate(
        [compile_band_expr("brightness")(a).ravel() for a in tiles.values()]
    )
    assert rolled.gmean == pytest.approx(allpx.mean())
