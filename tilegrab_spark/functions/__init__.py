from tilegrab_spark.functions.cells import (
    cell_encode_cols,
    tile_bounds_cols,
    tile_mercator_bounds_cols,
    cell_id_col,
)

__all__ = [
    "cell_encode_cols",
    "tile_bounds_cols",
    "tile_mercator_bounds_cols",
    "cell_id_col",
]
