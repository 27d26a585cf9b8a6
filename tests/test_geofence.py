"""Streaming geofence suite: transition-rule oracle, incremental
restart with checkpoint recovery, late-fix surfacing."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from tilegrab_spark.sources.geometries import geometry_from_rings
from tilegrab_spark.streaming.geofence import FIX_SCHEMA, stream_geofence

T0 = datetime(2026, 1, 1, 12, 0, 0)


def sq(cx, cy, h):
    return [(cx - h, cy - h), (cx + h, cy - h), (cx + h, cy + h), (cx - h, cy + h),
            (cx - h, cy - h)]


@pytest.fixture(scope="module")
def zones():
    return [
        geometry_from_rings("A", [sq(10.0, 45.0, 0.01)]),
        geometry_from_rings("B", [sq(10.05, 45.0, 0.01)]),
    ]


def zone_of(lon, lat):
    if abs(lon - 10.0) <= 0.01 and abs(lat - 45.0) <= 0.01:
        return "A"
    if abs(lon - 10.05) <= 0.01 and abs(lat - 45.0) <= 0.01:
        return "B"
    return None


def ref_events(fixes):
    """Oracle: same transition + late rules over the full history in
    arrival (batch, ts) order. fixes: list of (entity, ts, lon, lat)
    already in processing order."""
    state = {}
    out = []
    for e, ts, lon, lat in fixes:
        z = zone_of(lon, lat)
        last_zone, last_ts = state.get(e, (None, None))
        if last_ts is not None and ts < last_ts:
            out.append((e, "late", z, ts))
            continue
        if z != last_zone:
            if last_zone is not None:
                out.append((e, "exit", last_zone, ts))
            if z is not None:
                out.append((e, "enter", z, ts))
            last_zone = z
        state[e] = (last_zone, ts)
    return sorted(out)


def path(entity, coords, start=T0, step=60):
    return [
        (entity, start + timedelta(seconds=i * step), lon, lat)
        for i, (lon, lat) in enumerate(coords)
    ]


BATCH1 = (
    path(1, [(9.9, 44.9), (10.0, 45.0), (10.001, 45.001), (10.05, 45.0)])
    + path(2, [(10.0, 45.0), (10.002, 44.998)])
    + path(3, [(9.0, 44.0), (9.1, 44.1)])
)
BATCH2 = (
    path(1, [(10.3, 45.3), (10.05, 45.002)], start=T0 + timedelta(hours=1))
    + path(2, [(10.05, 45.0)], start=T0 + timedelta(hours=1))
)


def _write(spark, rows, dest):
    spark.createDataFrame(rows, FIX_SCHEMA).coalesce(1).write.mode("append").parquet(dest)


def _events(spark, out_dir):
    rows = spark.read.parquet(out_dir).collect()
    return sorted(
        (r["entity_id"], r["event"], r["geom_id"], r["ts"].replace(tzinfo=None))
        for r in rows
    )


class TestGeofence:
    def test_batch_equals_oracle(self, spark, zones, tmp_path):
        land, ckpt, out = (str(tmp_path / d) for d in ("land", "ckpt", "out"))
        _write(spark, BATCH1, land)
        q = stream_geofence(spark, land, ckpt, out, zones)
        q.awaitTermination(120)
        assert _events(spark, out) == ref_events(BATCH1)

    def test_incremental_restart_no_duplicates(self, spark, zones, tmp_path):
        land, ckpt, out = (str(tmp_path / d) for d in ("land", "ckpt", "out"))
        _write(spark, BATCH1, land)
        q = stream_geofence(spark, land, ckpt, out, zones)
        q.awaitTermination(120)
        _write(spark, BATCH2, land)
        q2 = stream_geofence(spark, land, ckpt, out, zones)
        q2.awaitTermination(120)
        assert _events(spark, out) == ref_events(BATCH1 + BATCH2)
        # a third pass with nothing new emits nothing
        q3 = stream_geofence(spark, land, ckpt, out, zones)
        q3.awaitTermination(120)
        assert _events(spark, out) == ref_events(BATCH1 + BATCH2)

    def test_late_fix_surfaced_not_rewritten(self, spark, zones, tmp_path):
        land, ckpt, out = (str(tmp_path / d) for d in ("land", "ckpt", "out"))
        _write(spark, path(7, [(10.0, 45.0), (10.05, 45.0)]), land)
        q = stream_geofence(spark, land, ckpt, out, zones)
        q.awaitTermination(120)
        # a fix OLDER than the last processed one arrives in batch 2
        late = [(7, T0 - timedelta(minutes=5), 9.0, 44.0)]
        _write(spark, late, land)
        q2 = stream_geofence(spark, land, ckpt, out, zones)
        q2.awaitTermination(120)
        evs = _events(spark, out)
        kinds = [e[1] for e in evs if e[0] == 7]
        assert kinds.count("late") == 1
        # the enter A / exit A + enter B history is untouched
        assert sorted(k for k in kinds if k != "late") == ["enter", "enter", "exit"]
