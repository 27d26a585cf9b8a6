from tilegrab_spark.functions.cells import (
    cell_encode_cols,
    tile_bounds_cols,
    tile_mercator_bounds_cols,
    cell_id_col,
)
from tilegrab_spark.functions.s2cells import (
    S2_MAX_LEVEL,
    s2_bbox_predicate,
    s2_cell_col,
    s2_level_col,
    s2_parent_col,
    s2_range_cols,
    s2_ranges_for_bbox,
)
from tilegrab_spark.functions.interop import (
    geohash_col,
    geohash_decode_cols,
    hilbert_key_col,
    morton_key_col,
    morton_parent_col,
    quadkey_col,
    quadkey_decode_cols,
    tms_y_col,
)

__all__ = [
    "cell_encode_cols",
    "tile_bounds_cols",
    "tile_mercator_bounds_cols",
    "cell_id_col",
    "geohash_col",
    "geohash_decode_cols",
    "hilbert_key_col",
    "morton_key_col",
    "morton_parent_col",
    "quadkey_col",
    "quadkey_decode_cols",
    "tms_y_col",
    "S2_MAX_LEVEL",
    "s2_bbox_predicate",
    "s2_cell_col",
    "s2_level_col",
    "s2_parent_col",
    "s2_range_cols",
    "s2_ranges_for_bbox",
]
