from tilegrab_spark.kernels import avi, cog, geo, geotiff, jpeg, png, vp8, wav, webp

__all__ = ["avi", "cog", "geo", "geotiff", "jpeg", "png", "vp8", "wav", "webp"]
