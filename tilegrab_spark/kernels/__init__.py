from tilegrab_spark.kernels import geo, geotiff, jpeg, png, vp8, webp

__all__ = ["geo", "geotiff", "jpeg", "png", "vp8", "webp"]
