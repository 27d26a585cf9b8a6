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
from tilegrab_spark.sources.cog_source import (
    cog_tile_index,
    fetch_cog_tiles,
    read_cog_tiles,
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
    "cog_tile_index",
    "fetch_cog_tiles",
    "read_cog_tiles",
]
