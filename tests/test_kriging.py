"""Ordinary kriging: empirical variogram vs brute-force pair oracle,
model fit recovery, and the tile painter vs a direct numpy OK oracle
(exact-interpolation and constant-field properties included)."""

import hashlib
import math

import numpy as np
import pytest

from tilegrab_spark.kernels.png import decode_png
from tilegrab_spark.operators.kriging import (
    VARIOGRAM_MODELS,
    empirical_variogram,
    fit_variogram,
    krige_tiles,
    variogram_gamma,
)


def _lonlat_of_world_px(fx, fy, zoom, tile_px=256):
    n_px = (1 << zoom) * tile_px
    lon = (fx / n_px - 0.5) * 360.0
    lat = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * fy / n_px))))
    return lon, lat


def _project(lon, lat, zoom, tile_px=256):
    n_px = (1 << zoom) * tile_px
    fx = (lon / 360.0 + 0.5) * n_px
    s = math.sin(math.radians(lat))
    fy = (0.5 - 0.25 * math.log((1 + s) / (1 - s)) / math.pi) * n_px
    return fx, fy


def _pts_df(spark, rows):
    return spark.createDataFrame(rows, "lon double, lat double, val double")


class TestEmpiricalVariogram:
    def test_matches_bruteforce_oracle(self, spark):
        zoom, tp, max_lag, n_lags = 3, 256, 64.0, 8
        rng = np.random.default_rng(11)
        # a compact cluster so every pair is within one cell neighborhood
        pts = []
        for _ in range(40):
            fx = 500.0 + float(rng.uniform(0, 90))
            fy = 400.0 + float(rng.uniform(0, 90))
            v = float(rng.uniform(0, 10))
            lon, lat = _lonlat_of_world_px(fx, fy, zoom)
            pts.append((lon, lat, v))
        df = _pts_df(spark, pts)
        got = {
            round(r.lag_px, 6): (r.gamma, r.n_pairs)
            for r in empirical_variogram(
                df, zoom=zoom, value_col="val", n_lags=n_lags,
                max_lag_px=max_lag, max_points_per_cell=1000,
            ).collect()
        }
        # oracle: exact projected coordinates, all pairs
        proj = [(_project(lon, lat, zoom)) + (v,) for lon, lat, v in pts]
        lag_w = max_lag / n_lags
        acc = {}
        for i in range(len(proj)):
            for j in range(i + 1, len(proj)):
                d = math.hypot(proj[i][0] - proj[j][0], proj[i][1] - proj[j][1])
                if 0 < d <= max_lag:
                    b = min(n_lags - 1, int(d // lag_w))
                    s, c = acc.get(b, (0.0, 0))
                    acc[b] = (s + (proj[i][2] - proj[j][2]) ** 2, c + 1)
        want = {
            round((b + 0.5) * lag_w, 6): (s / (2 * c), c) for b, (s, c) in acc.items()
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k][1] == want[k][1], k
            assert got[k][0] == pytest.approx(want[k][0], rel=1e-9), k

    def test_pairs_across_cell_borders_counted_once(self, spark):
        zoom = 3
        # two points straddling a cell boundary (cell side = max_lag)
        pa = _lonlat_of_world_px(63.0, 10.0, zoom)
        pb = _lonlat_of_world_px(65.0, 10.0, zoom)
        df = _pts_df(spark, [pa + (0.0,), pb + (4.0,)])
        rows = empirical_variogram(
            df, zoom=zoom, value_col="val", n_lags=4, max_lag_px=64.0
        ).collect()
        assert len(rows) == 1
        assert rows[0].n_pairs == 1
        assert rows[0].gamma == pytest.approx(8.0)  # (4-0)^2 / 2

    def test_validation(self, spark):
        df = _pts_df(spark, [(0.0, 0.0, 1.0)])
        with pytest.raises(ValueError):
            empirical_variogram(df, zoom=3, value_col="val", n_lags=0)
        with pytest.raises(ValueError):
            empirical_variogram(df, zoom=3, value_col="val", max_lag_px=0.0)


class TestFitVariogram:
    @pytest.mark.parametrize("model", VARIOGRAM_MODELS)
    def test_recovers_exact_model(self, model):
        true = {"model": model, "nugget": 1.5, "psill": 6.0, "range_px": 40.0}
        h = np.linspace(2.0, 80.0, 20)
        rows = [(float(x), float(g), 100) for x, g in zip(h, variogram_gamma(h, true))]
        fit = fit_variogram(rows, model=model, n_range_candidates=256)
        # the range grid is discrete; nugget/sill solve is exact per range
        assert fit["nugget"] == pytest.approx(1.5, abs=0.2)
        assert fit["psill"] == pytest.approx(6.0, abs=0.4)
        assert fit["range_px"] == pytest.approx(40.0, rel=0.1)

    def test_clamps_nonnegative(self):
        # gamma decreasing with lag would push nugget negative unclamped
        rows = [(1.0, 5.0, 10), (10.0, 1.0, 10), (20.0, 0.5, 10)]
        fit = fit_variogram(rows, model="exponential")
        assert fit["nugget"] >= 0.0 and fit["psill"] >= 0.0

    def test_rejects_bad_input(self):
        with pytest.raises(ValueError):
            fit_variogram([(1.0, 1.0, 5)], model="spherical")
        with pytest.raises(ValueError):
            fit_variogram([(1.0, 1.0, 5), (2.0, 2.0, 5)], model="cubic")


def _ok_oracle(samples, vg, tiles, zoom, vmin, vmax, radius, tp):
    """Direct ordinary-kriging oracle, replicating the engine's
    per-tile neighborhood rule: a tile's system uses exactly the
    samples whose ``radius`` disc touches the tile (the explode set),
    and pixels farther than ``radius`` from all of them are nodata."""
    out = {}
    for tx, ty in tiles:
        local = [
            s
            for s in samples
            if math.floor((s[0] - radius) / tp) <= tx <= math.floor((s[0] + radius) / tp)
            and math.floor((s[1] - radius) / tp) <= ty <= math.floor((s[1] + radius) / tp)
        ]
        idx = np.zeros((tp, tp), dtype=np.uint8)
        n = len(local)
        if n:
            sx = np.array([s[0] for s in local])
            sy = np.array([s[1] for s in local])
            vals = np.array([s[2] for s in local])
            A = np.empty((n + 1, n + 1))
            dss = np.sqrt(
                (sx[:, None] - sx[None, :]) ** 2 + (sy[:, None] - sy[None, :]) ** 2
            )
            A[:n, :n] = variogram_gamma(dss, vg)
            A[:n, n] = 1.0
            A[n, :n] = 1.0
            A[n, n] = 0.0
            for r in range(tp):
                for c in range(tp):
                    pxx, pyy = tx * tp + c + 0.5, ty * tp + r + 0.5
                    d = np.sqrt((sx - pxx) ** 2 + (sy - pyy) ** 2)
                    if (d > radius).all():
                        continue
                    b = np.empty(n + 1)
                    b[:n] = variogram_gamma(d, vg)
                    b[n] = 1.0
                    w = np.linalg.solve(A, b)
                    val = float(vals @ w[:n])
                    idx[r, c] = np.uint8(
                        np.clip(round((val - vmin) / (vmax - vmin) * 255.0), 0, 255)
                    )
        out[(tx, ty)] = idx
    return out


class TestKrigeTiles:
    VG = {"model": "spherical", "nugget": 0.0, "psill": 4.0, "range_px": 30.0}

    def test_matches_numpy_oracle(self, spark):
        zoom, tp, radius = 3, 32, 12.0
        rng = np.random.default_rng(5)
        world = []
        pts = []
        for _ in range(7):
            fx = 96.0 + float(rng.uniform(0, 48))
            fy = 64.0 + float(rng.uniform(0, 48))
            v = float(rng.uniform(10, 90))
            world.append((fx, fy, v))
            lon, lat = _lonlat_of_world_px(fx, fy, zoom, tp)
            pts.append((lon, lat, v))
        rows = krige_tiles(
            _pts_df(spark, pts), zoom=zoom, value_col="val", variogram=self.VG,
            vmin=0.0, vmax=100.0, radius_px=radius, tile_px=tp,
        ).collect()
        got = {}
        for r in rows:
            tx, ty = (int(v) for v in r.image_id.split("_")[1:3])
            got[(tx, ty)] = decode_png(bytes(r.bytes))[:, :, 0]
        # re-project through the engine's own formula (float-identical
        # coordinates), then oracle every produced tile
        proj = [(_project(lon, lat, zoom, tp)) + (v,) for lon, lat, v in pts]
        want = _ok_oracle(proj, self.VG, got.keys(), zoom, 0.0, 100.0, radius, tp)
        covered = {t for t, a in want.items() if a.any()}
        assert covered <= set(got)
        for t in got:
            # quantized uint8 comparison absorbs solver round-off; allow
            # one LSB where the float value sits on a rounding boundary
            diff = np.abs(got[t].astype(int) - want[t].astype(int))
            assert diff.max() <= 1, (t, diff.max())

    def test_exact_at_sample_pixel_center_nugget_zero(self, spark):
        zoom, tp = 3, 256
        # samples exactly on pixel centers
        spec = [(100.5, 80.5, 30.0), (120.5, 90.5, 70.0)]
        pts = [
            _lonlat_of_world_px(fx, fy, zoom, tp) + (v,) for fx, fy, v in spec
        ]
        rows = krige_tiles(
            _pts_df(spark, pts), zoom=zoom, value_col="val", variogram=self.VG,
            vmin=0.0, vmax=100.0, radius_px=40.0, tile_px=tp,
        ).collect()
        img = {
            tuple(int(v) for v in r.image_id.split("_")[1:3]): decode_png(bytes(r.bytes))
            for r in rows
        }[(0, 0)]
        # lon/lat round-trips cost ~1e-10 px, so the predictor is exact
        # to solver precision; 30/100 and 70/100 quantize onto .5
        # boundaries, so allow the single LSB either way
        assert abs(int(img[80, 100, 0]) - 76.5) <= 1.0
        assert abs(int(img[90, 120, 0]) - 178.5) <= 1.0
        assert img[0, 0, 0] == 0  # beyond radius -> nodata

    def test_constant_field_reproduced(self, spark):
        # sum-to-one weights: a constant input surface stays constant
        zoom, tp = 3, 32
        rng = np.random.default_rng(9)
        pts = []
        for _ in range(10):
            fx, fy = float(rng.uniform(80, 160)), float(rng.uniform(80, 160))
            pts.append(_lonlat_of_world_px(fx, fy, zoom, tp) + (42.0,))
        rows = krige_tiles(
            _pts_df(spark, pts), zoom=zoom, value_col="val", variogram=self.VG,
            vmin=0.0, vmax=84.0, radius_px=30.0, tile_px=tp,
        ).collect()
        want = round(42.0 / 84.0 * 255)
        seen = 0
        for r in rows:
            band = decode_png(bytes(r.bytes))[:, :, 0]
            inside = band[band > 0]  # corner-clip tiles can be all-nodata
            seen += inside.size
            assert set(np.unique(inside)) <= {want - 1, want, want + 1}
        assert seen > 0

    def test_deterministic_across_partitionings(self, spark):
        zoom = 4
        rng = np.random.default_rng(3)
        pts = [
            (float(rng.uniform(0, 40)), float(rng.uniform(10, 50)), float(rng.uniform(0, 9)))
            for _ in range(50)
        ]
        df = _pts_df(spark, pts)

        def digest(d):
            return {
                r.image_id: hashlib.md5(bytes(r.bytes)).hexdigest()
                for r in krige_tiles(
                    d, zoom=zoom, value_col="val", variogram=self.VG,
                    vmin=0.0, vmax=9.0, radius_px=80.0, max_samples=16,
                ).collect()
            }

        assert digest(df) == digest(df.repartition(13))

    def test_validation(self, spark):
        df = _pts_df(spark, [(0.0, 0.0, 1.0)])
        with pytest.raises(ValueError):
            krige_tiles(df, zoom=3, value_col="val", variogram=self.VG, vmin=1.0, vmax=1.0)
        with pytest.raises(ValueError):
            krige_tiles(
                df, zoom=3, value_col="val",
                variogram={"model": "spherical", "nugget": -1, "psill": 1, "range_px": 10},
                vmin=0.0, vmax=1.0,
            )
        with pytest.raises(ValueError):
            krige_tiles(
                df, zoom=3, value_col="val",
                variogram={"model": "nope", "nugget": 0, "psill": 1, "range_px": 10},
                vmin=0.0, vmax=1.0,
            )


def test_end_to_end_variogram_to_tiles(spark):
    """The three stages compose: empirical -> fit -> krige on a smooth
    synthetic field; kriged values stay within the field's range."""
    zoom, tp = 3, 32
    rng = np.random.default_rng(21)
    pts = []
    for _ in range(60):
        fx, fy = float(rng.uniform(100, 300)), float(rng.uniform(100, 300))
        v = 50.0 + 30.0 * math.sin(fx / 40.0) * math.cos(fy / 40.0)
        pts.append(_lonlat_of_world_px(fx, fy, zoom, tp) + (v,))
    df = _pts_df(spark, pts)
    emp = empirical_variogram(
        df, zoom=zoom, value_col="val", n_lags=10, max_lag_px=100.0, tile_px=tp
    )
    fit = fit_variogram(emp, model="exponential")
    assert fit["psill"] > 0
    rows = krige_tiles(
        df, zoom=zoom, value_col="val", variogram=fit,
        vmin=0.0, vmax=100.0, radius_px=40.0, tile_px=tp, max_samples=24,
    ).collect()
    assert rows
    for r in rows:
        band = decode_png(bytes(r.bytes))[:, :, 0]
        inside = band[band > 0]
        if inside.size:
            # field range [20, 80] -> bytes in [51, 204]; give slack for
            # kriging over/undershoot near the hull boundary
            assert inside.min() >= 25 and inside.max() <= 230
