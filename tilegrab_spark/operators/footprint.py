"""Raster→vector: coverage footprints (the inverse direction of the
north rule's "raster↔vector" — vector→raster is the mosaic pipeline).

``coverage_footprints`` turns joined (tile, image) rows back into vector
geometry: per mosaic group, a GeoJSON MultiPolygon of the PRESENT tiles'
EPSG:4326 bounds (P2/P4 math as Catalyst expressions), plus coverage
stats. Everything is native — ``collect_list`` of per-tile bound
structs into ``to_json`` — one shuffle on the group key, no Python.

The footprint answers the operational questions a 10^12-row run needs
answered per region: what fraction of the wanted area is actually
covered, and exactly where the holes are (feed the complement back into
the fetch planner). No polygon dissolve is attempted (adjacent boxes
stay separate ring entries) — consumers that want dissolved outlines
can union downstream; the box set is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tilegrab_spark.functions.cells import tile_bounds_cols


def coverage_footprints(
    joined: DataFrame,
    *,
    group_cols: tuple = ("geom_id", "z"),
) -> DataFrame:
    """Per group: n_tiles, tile-extent bbox, and a GeoJSON MultiPolygon
    (``footprint`` string column) of every present tile's 4326 bounds.

    ``joined``: rows with (geom_id, z, x, y) — e.g. the J1 join output
    or a tile plan. Rows with NULL bytes (left-join misses) should be
    filtered by the caller if only FETCHED coverage is wanted.
    """
    mnl, mnt, mxl, mxt = tile_bounds_cols(F.col("x"), F.col("y"), F.col("z"))
    # exterior ring is counterclockwise per RFC 7946 §3.1.6 (strict
    # GeoJSON consumers reject/flip clockwise exteriors)
    ring = F.array(
        F.array(mnl, mnt),
        F.array(mxl, mnt),
        F.array(mxl, mxt),
        F.array(mnl, mxt),
        F.array(mnl, mnt),
    )
    d = joined.withColumn("_poly", F.array(ring))  # [ [ring] ] per tile
    agg = d.groupBy(*group_cols).agg(
        F.count("*").alias("n_tiles"),
        F.min("x").alias("tminx"),
        F.min("y").alias("tminy"),
        F.max("x").alias("tmaxx"),
        F.max("y").alias("tmaxy"),
        F.sort_array(F.collect_list(F.struct("x", "y", "_poly"))).alias("_tiles"),
    )
    geojson = F.to_json(
        F.struct(
            F.lit("MultiPolygon").alias("type"),
            F.transform(F.col("_tiles"), lambda t: t["_poly"]).alias("coordinates"),
        )
    )
    return agg.withColumn("footprint", geojson).drop("_tiles")
