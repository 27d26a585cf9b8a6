"""Incremental density layer == batch render over all landed points."""

import hashlib

import numpy as np

from tilegrab_spark.operators.render import render_density_tiles
from tilegrab_spark.streaming.density_stream import (
    compact_density,
    render_current,
    render_dirty,
    stream_density,
)

Z = 7


def _pts(rng, n, lon0=4.0, lat0=18.0, spread=8.0):
    return [
        (float(rng.uniform(lon0, lon0 + spread)), float(rng.uniform(lat0, lat0 + spread)))
        for _ in range(n)
    ]


def _digest(rows):
    return {r.image_id: hashlib.md5(bytes(r.bytes)).hexdigest() for r in rows}


def _land(spark, landing, batch, name):
    spark.createDataFrame(batch, "lon double, lat double").coalesce(1).write.mode(
        "append"
    ).parquet(str(landing))


def test_incremental_equals_batch_render(spark, tmp_path):
    rng = np.random.default_rng(21)
    landing = tmp_path / "landing"
    deltas = tmp_path / "deltas"
    ckpt = tmp_path / "ckpt"
    b1, b2 = _pts(rng, 300), _pts(rng, 250)

    _land(spark, landing, b1, "b1")
    q = stream_density(spark, str(landing), str(deltas), str(ckpt), zoom=Z)
    q.awaitTermination(120)
    _land(spark, landing, b2, "b2")
    q = stream_density(spark, str(landing), str(deltas), str(ckpt), zoom=Z)
    q.awaitTermination(120)

    got = _digest(render_current(spark, str(deltas), zoom=Z).collect())
    want = _digest(
        render_density_tiles(
            spark.createDataFrame(b1 + b2, "lon double, lat double"), zoom=Z
        ).collect()
    )
    assert got == want and len(got) >= 4


def test_replayed_batch_is_deduped(spark, tmp_path):
    rng = np.random.default_rng(22)
    landing = tmp_path / "landing"
    deltas = tmp_path / "deltas"
    ckpt = tmp_path / "ckpt"
    b1 = _pts(rng, 200)
    _land(spark, landing, b1, "b1")
    q = stream_density(spark, str(landing), str(deltas), str(ckpt), zoom=Z)
    q.awaitTermination(120)

    base = {
        (r.x, r.y, r.px, r.py): r.weight
        for r in compact_density(spark, str(deltas)).collect()
    }
    # simulate a crashed-before-commit re-run: the same batch's rows
    # land in the delta table twice with the same batch_id
    d = spark.read.parquet(str(deltas))
    d.write.mode("append").parquet(str(deltas))
    replayed = {
        (r.x, r.y, r.px, r.py): r.weight
        for r in compact_density(spark, str(deltas)).collect()
    }
    assert replayed == base
    assert sum(base.values()) == len(b1)


def test_render_dirty_only_touched_tiles(spark, tmp_path):
    rng = np.random.default_rng(23)
    landing = tmp_path / "landing"
    deltas = tmp_path / "deltas"
    ckpt = tmp_path / "ckpt"
    # batch 0 spreads wide; batch 1 lands in a small corner
    b1 = _pts(rng, 300)
    b2 = _pts(rng, 80, lon0=4.0, lat0=18.0, spread=1.0)
    _land(spark, landing, b1, "b1")
    q = stream_density(spark, str(landing), str(deltas), str(ckpt), zoom=Z)
    q.awaitTermination(120)
    _land(spark, landing, b2, "b2")
    q = stream_density(spark, str(landing), str(deltas), str(ckpt), zoom=Z)
    q.awaitTermination(120)

    full = _digest(render_current(spark, str(deltas), zoom=Z).collect())
    dirty_rows = render_dirty(spark, str(deltas), zoom=Z, since_batch_id=0).collect()
    dirty = _digest(dirty_rows)
    # dirty tiles = exactly those with a batch-1 pixel
    d = spark.read.parquet(str(deltas))
    want_dirty = {
        f"{Z}_{r.x}_{r.y}_9"
        for r in d.filter("batch_id > 0").select("x", "y").distinct().collect()
    }
    assert set(dirty) == want_dirty
    assert len(dirty) < len(full)
    # a repainted dirty tile carries FULL history, not just the delta
    for k, v in dirty.items():
        assert full[k] == v
