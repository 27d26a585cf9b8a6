"""Streaming geofence monitor — enter/exit events from a fix stream.

The standard real-time geospatial workload: a stream of entity fixes
(vehicle GPS, asset pings) × a set of zones → transition EVENTS
("entity 17 entered zone A at t"). Two stages, both engine-native:

1. STATELESS zone tagging per fix — ``points_in_polygons``'s broadcast
   ray-cast kernel as a map-side Arrow projection (zero shuffle,
   works identically on a streaming frame);
2. STATEFUL transition detection — ``applyInPandasWithState`` keyed by
   entity: GroupState carries (last_zone, last_ts) across
   micro-batches, each batch's fixes replay in timestamp order, and
   every zone change emits exit/enter rows. Out-of-order fixes older
   than the state's watermark ts are DROPPED and surfaced as ``late``
   rows rather than silently rewriting history (the only honest
   choice once an event for a later fix has been emitted).

Restart semantics: state lives in the checkpoint, so a killed query
resumes with every entity's last zone intact and emits no duplicate
events (tests replay a second availableNow pass over the same landing
dir). Event rows: ``[entity_id, event ('enter'|'exit'|'late'), geom_id,
ts]`` — an A→B hop emits exit(A) and enter(B) with the same ts.
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tilegrab_spark.operators.points import points_in_polygons
from tilegrab_spark.sources.geometries import GeometrySet

__all__ = ["FIX_SCHEMA", "geofence_events", "stream_geofence"]

FIX_SCHEMA = "entity_id long, ts timestamp, lon double, lat double"

_STATE_SCHEMA = "last_zone string, last_ts long"
_OUT_SCHEMA = "entity_id long, event string, geom_id string, ts timestamp"


def _transitions(
    key: Tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (entity,) = key
    if state.exists:
        last_zone, last_us = state.get
    else:
        last_zone, last_us = None, None
    ev_ent, ev_kind, ev_zone, ev_ts = [], [], [], []
    for pdf in batches:
        p = pdf.sort_values(["ts", "lon", "lat"], kind="mergesort")
        for ts, zone in zip(p["ts"], p["_zone"]):
            us = int(pd.Timestamp(ts).value // 1000)
            zone = None if pd.isna(zone) else zone
            if last_us is not None and us < last_us:
                ev_ent.append(entity)
                ev_kind.append("late")
                ev_zone.append(zone)
                ev_ts.append(ts)
                continue
            if zone != last_zone:
                if last_zone is not None:
                    ev_ent.append(entity)
                    ev_kind.append("exit")
                    ev_zone.append(last_zone)
                    ev_ts.append(ts)
                if zone is not None:
                    ev_ent.append(entity)
                    ev_kind.append("enter")
                    ev_zone.append(zone)
                    ev_ts.append(ts)
                last_zone = zone
            last_us = us
    state.update((last_zone, last_us))
    if ev_ent:
        yield pd.DataFrame(
            {"entity_id": ev_ent, "event": ev_kind, "geom_id": ev_zone, "ts": ev_ts}
        )


def geofence_events(
    fixes: DataFrame, geoms: GeometrySet | Sequence[GeometrySet]
) -> DataFrame:
    """The streaming transform: tag fixes with zones (stateless Arrow
    projection), then stateful per-entity transition detection.
    ``fixes`` must be a STREAMING frame (applyInPandasWithState is
    streaming-only); use :func:`stream_geofence` for the full query."""
    tagged = points_in_polygons(fixes, geoms, out_col="_zone")
    return tagged.groupBy("entity_id").applyInPandasWithState(
        _transitions,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_geofence(
    spark,
    landing_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    geoms: GeometrySet | Sequence[GeometrySet],
):
    """Run the geofence monitor over a parquet landing dir
    (``FIX_SCHEMA`` rows), appending event rows (+ batch_id) to
    ``out_dir``. availableNow + checkpoint: incremental, restartable,
    exactly-once per input file."""
    src = spark.readStream.schema(FIX_SCHEMA).parquet(landing_dir)
    events = geofence_events(src, geoms)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    return (
        events.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
