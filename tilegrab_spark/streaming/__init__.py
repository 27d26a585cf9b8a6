from tilegrab_spark.streaming.ingest import stream_image_ingest

__all__ = ["stream_image_ingest"]
