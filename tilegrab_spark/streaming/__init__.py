from tilegrab_spark.streaming.incremental_cc import (
    add_edges as cc_add_edges,
    read_components as cc_read_components,
    stream_components,
)
from tilegrab_spark.streaming.incremental_index import TextIndexStore
from tilegrab_spark.streaming.incremental_dedup import (
    incremental_lsh_pairs,
    stream_document_dedup,
)
from tilegrab_spark.streaming.density_stream import (
    compact_density,
    render_current,
    render_dirty,
    stream_density,
)
from tilegrab_spark.streaming.geofence import geofence_events, stream_geofence
from tilegrab_spark.streaming.ingest import stream_image_ingest
from tilegrab_spark.streaming.mosaic_stream import compact_mosaics, stream_mosaic
from tilegrab_spark.streaming.stateful import stream_cell_stats
from tilegrab_spark.streaming.upsert_stream import UpsertSink, stream_upsert
from tilegrab_spark.streaming.span_stream import SpanStore, stream_span_dedup
from tilegrab_spark.streaming.fingerprint_stream import (
    incremental_audio_pairs,
    incremental_video_pairs,
)
from tilegrab_spark.streaming.tracksim_stream import (
    incremental_track_pairs,
    stream_track_similarity,
)
from tilegrab_spark.streaming.weighted_reservoir import (
    ReservoirStore,
    stream_weighted_reservoir,
)
from tilegrab_spark.streaming.windowed import stream_windowed_counts

__all__ = [
    "ReservoirStore",
    "SpanStore",
    "stream_span_dedup",
    "stream_weighted_reservoir",
    "UpsertSink",
    "stream_upsert",
    "incremental_lsh_pairs",
    "incremental_track_pairs",
    "incremental_audio_pairs",
    "incremental_video_pairs",
    "stream_track_similarity",
    "TextIndexStore",
    "stream_document_dedup",
    "stream_image_ingest",
    "stream_mosaic",
    "compact_mosaics",
    "stream_density",
    "compact_density",
    "render_current",
    "render_dirty",
    "stream_cell_stats",
    "stream_windowed_counts",
    "stream_geofence",
    "geofence_events",
]
