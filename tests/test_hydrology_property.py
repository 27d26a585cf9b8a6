"""Hypothesis property tests for the hydrology suite: for ANY small
terrain (values, shape, coverage pattern drawn by hypothesis), the
distributed operators must match the sequential full-mosaic oracle
per-pixel and satisfy the conservation invariant. Examples are capped
low — each draw runs real Spark jobs."""

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from tests.test_hydrology import _check, _oracle, _table
from tilegrab_spark.operators.hydrology import flow_accumulation

pytest_plugins = []


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 2**31 - 1),
    px=st.sampled_from([4, 8, 12]),
    nx=st.integers(1, 3),
    ny=st.integers(1, 2),
    hole=st.booleans(),
)
def test_accumulation_matches_oracle_on_random_terrain(spark, seed, px, nx, ny, hole):
    rng = np.random.default_rng(seed)
    full = rng.integers(0, 256, size=(ny * px, nx * px), dtype=np.uint8)
    tiles = {
        (dx, dy): full[dy * px:(dy + 1) * px, dx * px:(dx + 1) * px]
        for dx in range(nx) for dy in range(ny)
    }
    if hole and len(tiles) > 1:
        tiles.pop(sorted(tiles)[len(tiles) // 2])
    _check(spark, tiles, px)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 2**31 - 1))
def test_global_conservation(spark, seed):
    """Total water = total pixels: everything either sinks in a pit or
    leaves coverage, summed over the whole corpus."""
    px, n = 8, 2
    rng = np.random.default_rng(seed)
    full = rng.integers(0, 256, size=(n * px, n * px), dtype=np.uint8)
    tiles = {
        (dx, dy): full[dy * px:(dy + 1) * px, dx * px:(dx + 1) * px]
        for dx in range(n) for dy in range(n)
    }
    df = _table(spark, tiles, px)
    rows = flow_accumulation(df, zoom=4).collect()
    n_px = sum(r["w"] * r["h"] for r in rows)
    # offmap flux = outflow not delivered to any covered entry
    delivered = sum(r["inflow_flux"] for r in rows)
    outflow = sum(r["outflow_flux"] for r in rows)
    sink = sum(r["sink_flux"] for r in rows)
    assert n_px + delivered == outflow + sink
    assert outflow >= delivered  # what leaves >= what arrives (rest offmap)
