"""Geometry (vector) side: load, CRS-normalize, broadcast.

Reference behavior re-expressed (S1/P10/P11, dataset.py:75-115): read a
vector dataset, fail on missing CRS, reproject everything to EPSG:4326.
The sandbox has no geopandas/shapely, and the broadcast side is small by
design (the north rule broadcasts prepared geometry), so loading is
driver-side: GeoJSON via stdlib json + numpy, reprojection via the
closed-form inverse spherical Mercator (validated against the reference's
golden bbox, tests/test_dataset.py:15-21, to <=1e-13).

Two representations:
- ``GeometrySet`` — driver/broadcast object: list of polygons (list of
  (N,2) float64 rings) + bbox; what the PIP refine kernel consumes.
- ``geometries_df`` — relational form ``(geom_id, poly_idx, ring_idx,
  ring: array<array<double>>, minx, miny, maxx, maxy)`` for SQL access.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from tilegrab_spark.kernels import geo

TILE_EPSG = 4326  # reference: dataset.py:9


@dataclass
class GeometrySet:
    """Normalized (EPSG:4326) geometry collection for one logical dataset.

    polygons: list of polygons; each polygon = list of rings (outer first);
    each ring = (N,2) float64 [lon,lat], closed or open (kernel closes).
    """

    geom_id: str
    polygons: list = field(default_factory=list)
    original_epsg: int = TILE_EPSG
    current_epsg: int = TILE_EPSG

    @property
    def bbox(self):
        """(minx, miny, maxx, maxy) over all rings — parity with
        GeoDataset.bbox = gdf.total_bounds (dataset.py:35-47)."""
        pts = np.vstack([r for poly in self.polygons for r in poly])
        return (
            float(pts[:, 0].min()),
            float(pts[:, 1].min()),
            float(pts[:, 0].max()),
            float(pts[:, 1].max()),
        )

    @property
    def x_extent(self) -> float:  # dataset.py:54-68 (P11)
        b = self.bbox
        return b[2] - b[0] + 1

    @property
    def y_extent(self) -> float:
        b = self.bbox
        return b[3] - b[1] + 1

    def tile_range(self, zoom: int):
        return geo.bbox_tile_range(*self.bbox, zoom)


_EPSG_FROM_CRS = {
    "urn:ogc:def:crs:EPSG::3857": 3857,
    "urn:ogc:def:crs:EPSG::4326": 4326,
    "urn:ogc:def:crs:OGC:1.3:CRS84": 4326,
    "EPSG:3857": 3857,
    "EPSG:4326": 4326,
}


def _reproject_ring(ring: np.ndarray, epsg: int) -> np.ndarray:
    if epsg == 4326:
        return ring
    if epsg == 3857:
        lon, lat = geo.mercator_to_lonlat(ring[:, 0], ring[:, 1])
        return np.column_stack([lon, lat])
    raise ValueError(f"unsupported source EPSG:{epsg}")


def _geom_polygons(geom: dict) -> list:
    t = geom["type"]
    if t == "Polygon":
        return [[np.asarray(r, dtype=np.float64) for r in geom["coordinates"]]]
    if t == "MultiPolygon":
        return [
            [np.asarray(r, dtype=np.float64) for r in poly]
            for poly in geom["coordinates"]
        ]
    raise ValueError(f"unsupported geometry type {t}")


def geometry_from_geojson(path: str | Path, geom_id: str | None = None) -> GeometrySet:
    """Load a GeoJSON FeatureCollection/Feature/geometry, detect CRS, and
    normalize to 4326 (parity with GeoDataset.__init__, dataset.py:75-115:
    missing CRS defaults to 4326 per GeoJSON spec; !=4326 is reprojected).
    """
    path = Path(path)
    doc = json.loads(path.read_text())
    crs_name = (doc.get("crs") or {}).get("properties", {}).get("name", "")
    epsg = _EPSG_FROM_CRS.get(crs_name, 4326)

    if doc.get("type") == "FeatureCollection":
        geoms = [f["geometry"] for f in doc["features"]]
    elif doc.get("type") == "Feature":
        geoms = [doc["geometry"]]
    else:
        geoms = [doc]

    polys = []
    for g in geoms:
        polys.extend(_geom_polygons(g))
    polys = [[_reproject_ring(r, epsg) for r in poly] for poly in polys]
    return GeometrySet(
        geom_id=geom_id or path.stem,
        polygons=polys,
        original_epsg=epsg,
        current_epsg=TILE_EPSG,
    )


def geometry_from_rings(geom_id: str, rings, src_epsg: int = 4326) -> GeometrySet:
    """Build a GeometrySet from raw rings (tests / FIXTURES.md §3)."""
    polys = [[_reproject_ring(np.asarray(r, dtype=np.float64), src_epsg)] for r in rings]
    return GeometrySet(geom_id=geom_id, polygons=polys,
                       original_epsg=src_epsg, current_epsg=TILE_EPSG)


def geometries_df(spark, geom_sets: list[GeometrySet]):
    """Relational form of the geometry side (one row per ring)."""
    rows = []
    for gs in geom_sets:
        minx, miny, maxx, maxy = gs.bbox
        for pi, poly in enumerate(gs.polygons):
            for ri, ring in enumerate(poly):
                rows.append(
                    (
                        gs.geom_id,
                        pi,
                        ri,
                        [[float(a), float(b)] for a, b in ring],
                        minx,
                        miny,
                        maxx,
                        maxy,
                    )
                )
    return spark.createDataFrame(
        rows,
        "geom_id string, poly_idx int, ring_idx int, "
        "ring array<array<double>>, minx double, miny double, "
        "maxx double, maxy double",
    )
