"""Cross-zoom warp suite: scalar bilinear/nearest oracle, the
upsample→rollup inverse-pair byte identity, coverage and key layout."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.kernels import png
from tilegrab_spark.operators.warp import resample_window, upsample_tiles, warp_tiles


def scalar_resample(arr, x0, y0, scale, out_px, method):
    h, w = arr.shape[:2]
    out = np.zeros((out_px, out_px, arr.shape[2]), dtype=np.uint8)
    for ty in range(out_px):
        for tx in range(out_px):
            sx = x0 + (tx + 0.5) / scale - 0.5
            sy = y0 + (ty + 0.5) / scale - 0.5
            if method == "nearest":
                out[ty, tx] = arr[
                    min(max(int(np.floor(sy + 0.5)), 0), h - 1),
                    min(max(int(np.floor(sx + 0.5)), 0), w - 1),
                ]
                continue
            fx = min(max(sx, 0.0), w - 1.0)
            fy = min(max(sy, 0.0), h - 1.0)
            x1, y1 = int(np.floor(fx)), int(np.floor(fy))
            x2, y2 = min(x1 + 1, w - 1), min(y1 + 1, h - 1)
            wx, wy = fx - x1, fy - y1
            v = (
                arr[y1, x1].astype(float) * (1 - wx) * (1 - wy)
                + arr[y1, x2].astype(float) * wx * (1 - wy)
                + arr[y2, x1].astype(float) * (1 - wx) * wy
                + arr[y2, x2].astype(float) * wx * wy
            )
            out[ty, tx] = np.clip(np.rint(v), 0, 255).astype(np.uint8)
    return out


class TestKernel:
    @pytest.mark.parametrize("method", ["nearest", "bilinear"])
    def test_matches_scalar_oracle(self, method):
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        for (x0, y0, scale, out_px) in ((0, 0, 2, 16), (8.0, 4.0, 4, 16), (0, 16, 2, 32)):
            got = resample_window(arr, x0, y0, scale, out_px, method)
            want = scalar_resample(arr, x0, y0, scale, out_px, method)
            assert np.array_equal(got, want), (method, x0, y0, scale)

    def test_constant_invariance(self):
        arr = np.full((16, 16, 3), 87, dtype=np.uint8)
        for method in ("nearest", "bilinear"):
            out = resample_window(arr, 0, 0, 4, 32, method)
            assert (out == 87).all()


def _mk_tiles(spark, coords, zoom, px=32, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    for (x, y) in coords:
        arr = rng.integers(0, 256, (px, px, 3), dtype=np.uint8)
        rows.append(
            (f"{zoom}_{x}_{y}_0", png.encode_png(arr), px, px, "png",
             f"tile {zoom}/{x}/{y}", png.phash64(arr), zoom, x, y)
        )
    return spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long, zoom int, x long, y long",
    ).withColumn("z", F.col("zoom"))


class TestSpark:
    def test_upsample_coverage_and_keys(self, spark):
        df = _mk_tiles(spark, [(10, 20), (11, 20)], zoom=5)
        out = upsample_tiles(df, from_zoom=5, to_zoom=7, tile_px=32).collect()
        assert len(out) == 2 * 16
        ids = {r["image_id"] for r in out}
        assert "7_40_80_0" in ids and "7_47_83_0" in ids
        for r in out:
            assert r["zoom"] == 7 and r["w"] == 32
            arr = png.decode_png(bytes(r["bytes"]))
            assert arr.shape == (32, 32, 3)
            assert r["phash"] == png.phash64(arr)

    def test_upsample_pixels_match_oracle(self, spark):
        df = _mk_tiles(spark, [(3, 4)], zoom=9, seed=11)
        src = png.decode_png(bytes(df.first()["bytes"]))
        for method in ("nearest", "bilinear"):
            out = {
                r["image_id"]: png.decode_png(bytes(r["bytes"]))
                for r in upsample_tiles(
                    df, from_zoom=9, to_zoom=10, resample=method, tile_px=32
                ).collect()
            }
            for dyy in range(2):
                for dxx in range(2):
                    want = scalar_resample(src, dxx * 16, dyy * 16, 2, 32, method)
                    got = out[f"10_{(3 << 1) | dxx}_{(4 << 1) | dyy}_0"]
                    assert np.array_equal(got, want), (method, dxx, dyy)

    def test_nearest_up_then_rollup_is_identity(self, spark):
        df = _mk_tiles(spark, [(6, 6), (7, 6)], zoom=8, seed=7)
        up = upsample_tiles(df, from_zoom=8, to_zoom=9, resample="nearest", tile_px=32)
        back = warp_tiles(
            up.withColumn("x", F.split("image_id", "_")[1].cast("long"))
            .withColumn("y", F.split("image_id", "_")[2].cast("long"))
            .withColumn("z", F.col("zoom")),
            from_zoom=9, to_zoom=8, tile_w=32, tile_h=32,
        ).collect()
        orig = {(r["x"], r["y"]): png.decode_png(bytes(r["bytes"])) for r in df.collect()}
        assert len(back) == 2
        for r in back:
            x = int(r["image_id"].split("_")[1])
            y = int(r["image_id"].split("_")[2])
            got = png.decode_png(bytes(r["bytes"]))
            assert np.array_equal(got, orig[(x, y)]), (x, y)

    def test_validation(self, spark):
        df = _mk_tiles(spark, [(0, 0)], zoom=3)
        with pytest.raises(ValueError, match="to_zoom"):
            upsample_tiles(df, from_zoom=3, to_zoom=3)
        with pytest.raises(ValueError, match="explosion"):
            upsample_tiles(df, from_zoom=3, to_zoom=9)
        with pytest.raises(ValueError, match="nothing to warp"):
            warp_tiles(df, from_zoom=3, to_zoom=3)
        with pytest.raises(ValueError, match="resample"):
            upsample_tiles(df, from_zoom=3, to_zoom=4, resample="cubic")
