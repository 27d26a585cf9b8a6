from tilegrab_spark.kernels import geo, png

__all__ = ["geo", "png"]
