from tilegrab_spark.streaming.ingest import stream_image_ingest
from tilegrab_spark.streaming.mosaic_stream import compact_mosaics, stream_mosaic
from tilegrab_spark.streaming.stateful import stream_cell_stats
from tilegrab_spark.streaming.windowed import stream_windowed_counts

__all__ = [
    "stream_image_ingest",
    "stream_mosaic",
    "compact_mosaics",
    "stream_cell_stats",
    "stream_windowed_counts",
]
