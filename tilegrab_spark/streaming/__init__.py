from tilegrab_spark.streaming.ingest import stream_image_ingest
from tilegrab_spark.streaming.stateful import stream_cell_stats

__all__ = ["stream_image_ingest", "stream_cell_stats"]
