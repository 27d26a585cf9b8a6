"""terrain_stats: interior-tile parity against a full-mosaic numpy
oracle (proves the halo exchange), boundary replication, error
surfacing, bucket-count exactness."""

import math

import numpy as np
import pytest

from tilegrab_spark.kernels.geo import pack_cell_id
from tilegrab_spark.kernels.png import synth_tile_pixels
from tilegrab_spark.operators.terrain import terrain_stats
from tilegrab_spark.sources.images import read_image_table, write_synthetic_image_table

Z = 16
X0, Y0 = 47440, 31442


def _grid_cells(r=1):
    return [
        (Z, X0 + dx, Y0 + dy, 0)
        for dy in range(-r, r + 1)
        for dx in range(-r, r + 1)
    ]


def _mosaic(cells):
    xs = sorted({c[1] for c in cells})
    ys = sorted({c[2] for c in cells})
    m = np.zeros((len(ys) * 256, len(xs) * 256, 3), dtype=np.uint8)
    for (z, x, y, src) in cells:
        m[
            (y - ys[0]) * 256:(y - ys[0] + 1) * 256,
            (x - xs[0]) * 256:(x - xs[0] + 1) * 256,
        ] = synth_tile_pixels(x, y, z, src)
    return m, xs[0], ys[0]


def _oracle(chan, i0, j0, h, w, z_factor=1.0, azimuth=315.0, altitude=45.0):
    """Independent whole-array Horn implementation over an int64 channel
    that already contains every halo pixel; aggregates the h x w window
    at (i0, j0)."""
    c = chan.astype(np.int64)
    gx = np.zeros_like(c)
    gy = np.zeros_like(c)
    # direct per-pixel 3x3 indexing — deliberately written differently
    # from the operator's sliced form
    for di, dj, wx, wy in (
        (-1, -1, -1, -1), (-1, 0, 0, -2), (-1, 1, 1, -1),
        (0, -1, -2, 0), (0, 1, 2, 0),
        (1, -1, -1, 1), (1, 0, 0, 2), (1, 1, 1, 1),
    ):
        gx += wx * np.roll(np.roll(c, -di, axis=0), -dj, axis=1)
        gy += wy * np.roll(np.roll(c, -di, axis=0), -dj, axis=1)
    gx, gy = gx[i0:i0 + h, j0:j0 + w], gy[i0:i0 + h, j0:j0 + w]
    slope = np.arctan(z_factor / 8.0 * np.hypot(gx, gy))
    aspect = np.arctan2(gy, -gx)
    zen = math.radians(90.0 - altitude)
    az = math.radians(azimuth)
    hs = np.clip(
        math.cos(zen) * np.cos(slope)
        + math.sin(zen) * np.sin(slope) * np.cos(az - aspect),
        0.0, 1.0,
    )
    ax, ay = np.abs(gx), np.abs(gy)
    flat = (gx == 0) & (gy == 0)
    xdom = (ax >= ay) & ~flat
    ydom = ~xdom & ~flat
    return {
        "gx_sum": int(gx.sum()), "gy_sum": int(gy.sum()),
        "slope_mean": float(slope.mean()), "hillshade_mean": float(hs.mean()),
        "n_flat": int(flat.sum()),
        "n_north": int((ydom & (gy < 0)).sum()),
        "n_east": int((xdom & (gx > 0)).sum()),
        "n_south": int((ydom & (gy > 0)).sum()),
        "n_west": int((xdom & (gx < 0)).sum()),
    }


@pytest.fixture(scope="module")
def grid_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("terrain") / "imgs")
    write_synthetic_image_table(spark, path, _grid_cells(2), n_buckets=2)
    return read_image_table(spark, path)


def _collect(df):
    return {r["key"]: r for r in df.collect()}


def test_interior_tiles_match_full_mosaic_oracle(spark, grid_table):
    out = _collect(terrain_stats(grid_table))
    cells = _grid_cells(2)
    m, xmin, ymin = _mosaic(cells)
    chan = m.max(axis=2)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            x, y = X0 + dx, Y0 + dy
            want = _oracle(chan, (y - ymin) * 256, (x - xmin) * 256, 256, 256)
            got = out[int(pack_cell_id(x, y, Z))]
            assert got["status"] == "ok" and got["n_px"] == 256 * 256
            # exact integers pin the halo exchange bit-for-bit
            for k in ("gx_sum", "gy_sum", "n_flat", "n_north", "n_east",
                      "n_south", "n_west"):
                assert got[k] == want[k], (x, y, k)
            assert got["slope_mean"] == pytest.approx(want["slope_mean"], abs=1e-9)
            assert got["hillshade_mean"] == pytest.approx(
                want["hillshade_mean"], abs=1e-9
            )
            assert got["replicated_sides"] == 0


def test_lone_tile_uses_edge_replication(spark, tmp_path):
    path = str(tmp_path / "imgs")
    write_synthetic_image_table(spark, path, [(Z, X0, Y0, 0)], n_buckets=1)
    out = _collect(terrain_stats(read_image_table(spark, path)))
    got = out[int(pack_cell_id(X0, Y0, Z))]
    chan = np.pad(synth_tile_pixels(X0, Y0, Z, 0).max(axis=2), 1, mode="edge")
    want = _oracle(chan, 1, 1, 256, 256)
    assert got["status"] == "ok"
    for k in ("gx_sum", "gy_sum", "n_flat", "n_north", "n_east", "n_south",
              "n_west"):
        assert got[k] == want[k], k
    assert got["slope_mean"] == pytest.approx(want["slope_mean"], abs=1e-9)


def test_parameters_change_hillshade_not_gradients(spark, grid_table):
    base = _collect(terrain_stats(grid_table))
    turned = _collect(terrain_stats(grid_table, azimuth=90.0, altitude=60.0))
    k = int(pack_cell_id(X0, Y0, Z))
    assert base[k]["gx_sum"] == turned[k]["gx_sum"]
    assert base[k]["n_north"] == turned[k]["n_north"]
    assert base[k]["hillshade_mean"] != turned[k]["hillshade_mean"]


def test_bucket_counts_partition_pixels(spark, grid_table):
    out = _collect(terrain_stats(grid_table))
    for got in out.values():
        if got["status"] != "ok":
            continue
        total = (got["n_flat"] + got["n_north"] + got["n_east"]
                 + got["n_south"] + got["n_west"])
        assert total == got["n_px"]


def test_corrupt_payload_surfaces_as_error(spark, tmp_path, grid_table):
    from pyspark.sql import functions as F

    bad = grid_table.withColumn(
        "bytes",
        F.when(
            (F.col("x") == X0) & (F.col("y") == Y0),
            F.lit(b"not a png"),
        ).otherwise(F.col("bytes")),
    )
    out = _collect(terrain_stats(bad))
    assert out[int(pack_cell_id(X0, Y0, Z))]["status"] == "error"
    assert out[int(pack_cell_id(X0 + 1, Y0, Z))]["status"] == "ok"
