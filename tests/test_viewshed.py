"""viewshed (XDraw) vs a sequential scalar oracle over the stitched
mosaic — per-pixel visibility equality, including cross-tile horizons,
radius bounds, transparent holes, and observer overrides."""

import math

import numpy as np
import pytest

from tilegrab_spark.kernels import png as pngk
from tilegrab_spark.operators.viewshed import viewshed

Z = 4
X0, Y0 = 5, 6


def _table(spark, tiles, px):
    rows = []
    for (dx, dy), g in tiles.items():
        x, y = X0 + dx, Y0 + dy
        arr = np.stack([g, g, g], axis=2).astype(np.uint8)
        rows.append((f"{Z}_{x}_{y}", pngk.encode_png(arr), px, px, "png", Z, x, y))
    return spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, z int, x long, y long",
    )


def _oracle(tiles, px, obs_m, h_obs, max_d2=None):
    """Scalar XDraw over the mosaic; obs_m mosaic-local. Uncovered
    pixels are transparent (horizon stays -inf) and never output."""
    dxs = [d for d, _ in tiles]
    dys = [d for _, d in tiles]
    ox0, oy0 = min(dxs), min(dys)
    W = (max(dxs) - ox0 + 1) * px
    H_ = (max(dys) - oy0 + 1) * px
    elev = np.zeros((H_, W))
    cov = np.zeros((H_, W), dtype=bool)
    for (dx, dy), g in tiles.items():
        ys, xs = (dy - oy0) * px, (dx - ox0) * px
        elev[ys:ys + px, xs:xs + px] = g
        cov[ys:ys + px, xs:xs + px] = True
    mx, my = obs_m
    hor = np.full((H_, W), -np.inf)
    vis = np.zeros((H_, W), dtype=np.uint8)
    order = sorted(
        ((max(abs(x - mx), abs(y - my)), x, y) for y in range(H_) for x in range(W))
    )
    for k, x, y in order:
        if not cov[y, x]:
            continue
        dx, dy = x - mx, y - my
        d2 = dx * dx + dy * dy
        if max_d2 is not None and d2 > max_d2:
            continue
        if k == 0:
            vis[y, x] = 1
            hor[y, x] = -np.inf
            continue
        ang = (elev[y, x] - h_obs) / math.sqrt(d2)
        sx = (dx > 0) - (dx < 0)
        sy = (dy > 0) - (dy < 0)
        adx, ady = abs(dx), abs(dy)

        def h_at(px_, py_):
            if 0 <= px_ < W and 0 <= py_ < H_:
                return hor[py_, px_]
            return -np.inf

        if adx >= ady:
            f = ady / adx
            h1 = h_at(x - sx, y)
            h2 = h_at(x - sx, y - sy)
        else:
            f = adx / ady
            h1 = h_at(x, y - sy)
            h2 = h_at(x - sx, y - sy)
        if f >= 1.0:
            hp = h2
        elif f <= 0.0:
            hp = h1
        else:
            hp = (1.0 - f) * h1 + f * h2
        vis[y, x] = 1 if ang >= hp else 0
        hor[y, x] = max(ang, hp)
    return vis


def _check(spark, tiles, px, obs_m, height=2.0, max_dist_px=None, **kw):
    dxs = [d for d, _ in tiles]
    dys = [d for _, d in tiles]
    ox0, oy0 = min(dxs), min(dys)
    gx = (X0 + ox0) * px + obs_m[0]
    gy = (Y0 + oy0) * px + obs_m[1]
    # h_obs like the operator: terrain under observer + height
    tdx, tdy = obs_m[0] // px + ox0, obs_m[1] // px + oy0
    h_obs = float(tiles[(tdx, tdy)][obs_m[1] % px, obs_m[0] % px]) + height
    df = _table(spark, tiles, px)
    out = {
        (r["x"], r["y"]): r
        for r in viewshed(
            df, zoom=Z, observer=(gx, gy), height=height,
            tile_px=px, max_dist_px=max_dist_px, **kw
        ).collect()
    }
    want = _oracle(tiles, px, obs_m, h_obs,
                   None if max_dist_px is None else max_dist_px ** 2)
    for (dx, dy) in tiles:
        r = out.get((X0 + dx, Y0 + dy))
        if max_dist_px is not None and r is None:
            continue  # tile beyond the radius: never computed
        assert r is not None and r["status"] == "ok"
        got = np.frombuffer(r["vis"], dtype=np.uint8).reshape(px, px)
        ys, xs = (dy - oy0) * px, (dx - ox0) * px
        np.testing.assert_array_equal(got, want[ys:ys + px, xs:xs + px])
        assert r["n_visible"] == int(got.sum())
    return out


def test_flat_terrain_all_visible(spark):
    px, n = 16, 3
    tiles = {(dx, dy): np.full((px, px), 50, dtype=np.uint8)
             for dx in range(n) for dy in range(n)}
    out = _check(spark, tiles, px, (24, 25))
    # raised observer over flat ground sees everything
    assert all(r["n_visible"] == px * px for r in out.values())


def test_ridge_shadows_cross_tiles(spark):
    px, n = 16, 3
    elev = np.full((px, n * px), 10, dtype=np.uint8)
    elev[:, 20:22] = 200  # a tall north-south wall in the middle tile
    tiles = {(dx, 0): elev[:, dx * px:(dx + 1) * px] for dx in range(n)}
    out = _check(spark, tiles, px, (4, 8), height=2.0)
    east = np.frombuffer(out[(X0 + 2, Y0)]["vis"], dtype=np.uint8).reshape(px, px)
    # terrain behind the wall is shadowed
    assert east.sum() < px * px / 4


def test_random_terrain_matches_oracle(spark):
    px, n = 16, 3
    rng = np.random.default_rng(77)
    full = rng.integers(0, 200, size=(n * px, n * px), dtype=np.uint8)
    tiles = {
        (dx, dy): full[dy * px:(dy + 1) * px, dx * px:(dx + 1) * px]
        for dx in range(n) for dy in range(n)
    }
    _check(spark, tiles, px, (22, 27), height=5.0)


def test_radius_bound_and_hole_transparent(spark):
    px, n = 16, 3
    rng = np.random.default_rng(13)
    full = rng.integers(0, 120, size=(n * px, n * px), dtype=np.uint8)
    tiles = {
        (dx, dy): full[dy * px:(dy + 1) * px, dx * px:(dx + 1) * px]
        for dx in range(n) for dy in range(n) if (dx, dy) != (1, 0)
    }
    _check(spark, tiles, px, (8, 40), max_dist_px=20.0)
    _check(spark, tiles, px, (8, 40))  # unbounded, hole transparent


def test_observer_override_and_validation(spark):
    px = 16
    g = np.full((px, px), 30, dtype=np.uint8)
    df = _table(spark, {(0, 0): g}, px)
    gx, gy = X0 * px + 3, Y0 * px + 3
    out = viewshed(df, zoom=Z, observer=(gx, gy), observer_elev=250.0, tile_px=px).collect()
    assert out[0]["n_visible"] == px * px  # godlike observer sees all
    with pytest.raises(ValueError, match="max_dist_px"):
        viewshed(df, zoom=Z, observer=(gx, gy), max_dist_px=0, tile_px=px)
    with pytest.raises(ValueError, match="outside"):
        viewshed(df, zoom=Z, observer=(-1, 0), tile_px=px)
    with pytest.raises(ValueError, match="observer tile"):
        viewshed(df, zoom=Z, observer=(0, 0), tile_px=px)  # off-coverage, no elev
