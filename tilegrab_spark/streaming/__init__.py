from tilegrab_spark.streaming.ingest import stream_image_ingest
from tilegrab_spark.streaming.stateful import stream_cell_stats
from tilegrab_spark.streaming.windowed import stream_windowed_counts

__all__ = ["stream_image_ingest", "stream_cell_stats", "stream_windowed_counts"]
