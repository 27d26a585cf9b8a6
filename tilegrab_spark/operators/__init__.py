from tilegrab_spark.operators.tiles import (
    enumerate_tiles,
    enumerate_tiles_for_geoms,
    refine_by_shape,
    tiles_for,
)
from tilegrab_spark.operators.image_join import join_images, anti_join_committed
from tilegrab_spark.operators.mosaic import mosaic, MOSAIC_SCHEMA
from tilegrab_spark.operators.knn import knn_join
from tilegrab_spark.operators.components import connected_components, dedup_by_components
from tilegrab_spark.operators.pyramid import build_parent_level, build_pyramid
from tilegrab_spark.operators.footprint import coverage_footprints
from tilegrab_spark.operators.sessions import session_summary, sessionize
from tilegrab_spark.operators.verify import verify_images

__all__ = [
    "enumerate_tiles",
    "enumerate_tiles_for_geoms",
    "refine_by_shape",
    "tiles_for",
    "join_images",
    "anti_join_committed",
    "mosaic",
    "MOSAIC_SCHEMA",
    "knn_join",
    "connected_components",
    "dedup_by_components",
    "build_parent_level",
    "build_pyramid",
    "verify_images",
    "coverage_footprints",
    "sessionize",
    "session_summary",
]
