from tilegrab_spark.kernels import avi, geo, geotiff, jpeg, png, vp8, wav, webp

__all__ = ["avi", "geo", "geotiff", "jpeg", "png", "vp8", "wav", "webp"]
