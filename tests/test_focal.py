"""focal_box_stats: interior-tile parity against a full-mosaic numpy
oracle (proves the halo exchange), boundary replication rule, radius=2,
world-edge clipping, error surfacing."""

import numpy as np
import pytest

from tilegrab_spark.kernels.geo import pack_cell_id
from tilegrab_spark.kernels.png import synth_tile_pixels
from tilegrab_spark.operators.focal import focal_box_stats
from tilegrab_spark.sources.images import read_image_table, write_synthetic_image_table

Z = 16
X0, Y0 = 47440, 31442  # 3x3 block center


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


def _box_stats(chan, i0, j0, h, w, r):
    """Exact box stats for the h x w window at (i0, j0) of an int64
    channel that already contains every needed halo pixel."""
    k = 2 * r + 1
    S = np.zeros((chan.shape[0] + 1, chan.shape[1] + 1), dtype=np.int64)
    S[1:, 1:] = chan.cumsum(0).cumsum(1)
    box = S[k:, k:] - S[:-k, k:] - S[k:, :-k] + S[:-k, :-k]
    win = box[i0 - r:i0 - r + h, j0 - r:j0 - r + w]
    return int(win.sum()), int(win.min()), int(win.max())


@pytest.fixture(scope="module")
def grid_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("focal") / "imgs")
    write_synthetic_image_table(spark, path, _grid_cells(2), n_buckets=2)
    return read_image_table(spark, path)


def _collect(df):
    return {r["key"]: r for r in df.collect()}


def test_interior_tile_matches_full_mosaic_oracle(spark, grid_table):
    out = _collect(focal_box_stats(grid_table, radius=1))
    cells = _grid_cells(2)
    m, xmin, ymin = _mosaic(cells)
    chan = m.max(axis=2).astype(np.int64)
    # every tile except the outer ring has all 8 neighbors in the table
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            x, y = X0 + dx, Y0 + dy
            want = _box_stats(
                chan, (y - ymin) * 256, (x - xmin) * 256, 256, 256, 1
            )
            got = out[int(pack_cell_id(x, y, Z))]
            assert got["status"] == "ok"
            assert (got["box_sum"], got["box_min"], got["box_max"]) == want, (x, y)
            assert got["n_px"] == 256 * 256


def test_boundary_tile_uses_edge_replication_for_missing_sides(spark, tmp_path):
    # single tile, no neighbors at all: canvas = edge-replicated pad
    path = str(tmp_path / "imgs")
    write_synthetic_image_table(spark, path, [(Z, X0, Y0, 0)], n_buckets=1)
    out = _collect(focal_box_stats(read_image_table(spark, path), radius=1))
    ok = [r for r in out.values() if r["status"] == "ok"]
    assert len(ok) == 1
    chan = (
        np.pad(
            synth_tile_pixels(X0, Y0, Z, 0), ((1, 1), (1, 1), (0, 0)), mode="edge"
        )
        .max(axis=2)
        .astype(np.int64)
    )
    want = _box_stats(chan, 1, 1, 256, 256, 1)
    got = ok[0]
    assert (got["box_sum"], got["box_min"], got["box_max"]) == want
    # the 8 surrounding cells got strips but hold no tile
    assert sum(1 for r in out.values() if r["status"] == "no_tile") == 8


def test_partial_neighbors_mix_strips_and_replication(spark, tmp_path):
    # center + right neighbor only: left margin replicates, right margin
    # comes from the real neighbor
    path = str(tmp_path / "imgs")
    cells = [(Z, X0, Y0, 0), (Z, X0 + 1, Y0, 0)]
    write_synthetic_image_table(spark, path, cells, n_buckets=1)
    out = _collect(focal_box_stats(read_image_table(spark, path), radius=1))
    center = synth_tile_pixels(X0, Y0, Z, 0)
    right = synth_tile_pixels(X0 + 1, Y0, Z, 0)
    canvas = np.pad(center, ((1, 1), (1, 1), (0, 0)), mode="edge")
    canvas[1:257, 257:258] = right[:, 0:1]  # the only real strip
    chan = canvas.max(axis=2).astype(np.int64)
    want = _box_stats(chan, 1, 1, 256, 256, 1)
    got = out[int(pack_cell_id(X0, Y0, Z))]
    assert (got["box_sum"], got["box_min"], got["box_max"]) == want


def test_radius_two(spark, grid_table):
    out = _collect(focal_box_stats(grid_table, radius=2))
    cells = _grid_cells(2)
    m, xmin, ymin = _mosaic(cells)
    chan = m.max(axis=2).astype(np.int64)
    x, y = X0, Y0  # dead center: full 5x5 tile block present
    want = _box_stats(chan, (y - ymin) * 256, (x - xmin) * 256, 256, 256, 2)
    got = out[int(pack_cell_id(x, y, Z))]
    assert (got["box_sum"], got["box_min"], got["box_max"]) == want
    assert got["focal_mean"] == pytest.approx(want[0] / (256 * 256 * 25))


def test_world_edge_tiles_do_not_emit_out_of_range_strips(spark, tmp_path):
    path = str(tmp_path / "imgs")
    write_synthetic_image_table(spark, path, [(2, 0, 0, 0)], n_buckets=1)
    out = _collect(focal_box_stats(read_image_table(spark, path), radius=1))
    # x=-1 / y=-1 neighbors are outside the z=2 grid: only the 3
    # in-range neighbor cells receive strips
    assert sum(1 for r in out.values() if r["status"] == "no_tile") == 3
    assert sum(1 for r in out.values() if r["status"] == "ok") == 1


def test_corrupt_payload_surfaces_as_error(spark, tmp_path):
    path = str(tmp_path / "imgs")
    write_synthetic_image_table(spark, path, [(Z, X0, Y0, 0)], n_buckets=1)
    imgs = read_image_table(spark, path)
    from pyspark.sql import functions as F

    broken = imgs.withColumn("bytes", F.lit(b"\x89PNGnope"))
    out = _collect(focal_box_stats(broken, radius=1))
    assert [r["status"] for r in out.values()] == ["error"]


def test_radius_validation(spark, grid_table):
    with pytest.raises(ValueError, match="radius"):
        focal_box_stats(grid_table, radius=0)


def test_heterogeneous_neighbor_sizes_do_not_fail_tasks(spark):
    """A neighbor of a different tile size can't align its strip with
    this grid — the policy is edge replication, not a task crash."""
    import io

    from pyspark.sql import functions as F

    from tilegrab_spark.kernels import png as pngk

    rows = []
    for (x, y, size) in [(X0, Y0, 256), (X0 + 1, Y0, 64)]:
        arr = synth_tile_pixels(x, y, Z, 0)[:size, :size]
        rows.append((f"{Z}_{x}_{y}", pngk.encode_png(arr), size, size, "png", Z, x, y))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, z int, x long, y long"
    )
    out = {r["key"]: r for r in focal_box_stats(df, radius=1).collect()}
    big = out[int(pack_cell_id(X0, Y0, Z))]
    assert big["status"] == "ok"
    # the 64px neighbor's strip was skipped -> pure edge replication
    chan = (
        np.pad(synth_tile_pixels(X0, Y0, Z, 0), ((1, 1), (1, 1), (0, 0)), mode="edge")
        .max(axis=2)
        .astype(np.int64)
    )
    want = _box_stats(chan, 1, 1, 256, 256, 1)
    assert (big["box_sum"], big["box_min"], big["box_max"]) == want
    # the approximation is AUDITABLE: the dropped strip is counted
    assert big["replicated_sides"] == 1
    small = out[int(pack_cell_id(X0 + 1, Y0, Z))]
    assert small["status"] == "ok"  # 64px tile computed too (its own grid)
    assert small["replicated_sides"] == 1  # the 256px strip misaligned too
