from tilegrab_spark.sources.tile_sources import (
    SOURCES,
    TileSource,
    url_column,
)
from tilegrab_spark.sources.geometries import (
    geometry_from_geojson,
    geometries_df,
    GeometrySet,
)
from tilegrab_spark.sources.images import (
    IMAGE_SCHEMA,
    read_image_table,
    write_synthetic_image_table,
)

__all__ = [
    "SOURCES",
    "TileSource",
    "url_column",
    "geometry_from_geojson",
    "geometries_df",
    "GeometrySet",
    "IMAGE_SCHEMA",
    "read_image_table",
    "write_synthetic_image_table",
]
