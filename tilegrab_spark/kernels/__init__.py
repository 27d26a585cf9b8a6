from tilegrab_spark.kernels import geo, geotiff, jpeg, png, webp

__all__ = ["geo", "geotiff", "jpeg", "png", "webp"]
