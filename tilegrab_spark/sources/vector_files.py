"""Shapefile (.shp) and GeoPackage (.gpkg) vector readers — pure
stdlib + numpy (S1 parity: the reference reads shp/gpkg/geojson through
geopandas, dataset.py:75-115; this sandbox has no geopandas, and the
geometry side is driver-side/broadcast by design, so the engine carries
its own readers for the two binary formats).

Reference-parity behaviors kept:
- missing CRS ⇒ hard failure (GeoDataset raises on ``crs is None``,
  dataset.py:96-99): a .shp without a .prj sidecar and a .gpkg whose
  srs is undefined both raise.
- non-4326 input is normalized to EPSG:4326 (dataset.py:105-107); the
  supported source CRSs are 4326 and 3857 (same set as the GeoJSON
  path — the engine's closed-form inverse-Mercator P10).

Ring grouping: each shapefile record's parts (and each WKB polygon's
rings) are fed to the even-odd PIP kernel together, which handles
outer rings, holes, and multi-part records without orientation checks.
"""

from __future__ import annotations

import sqlite3
import struct
from pathlib import Path

import numpy as np

from tilegrab_spark.sources.geometries import GeometrySet, _reproject_ring

_SHP_POLYGON_TYPES = {5, 15, 25}  # Polygon, PolygonZ, PolygonM


def _epsg_from_wkt(wkt: str) -> int | None:
    """Best-effort EPSG detection from a .prj / srs WKT string: explicit
    AUTHORITY codes first, then well-known names."""
    import re

    codes = re.findall(r'AUTHORITY\["EPSG",\s*"?(\d+)"?\]', wkt, re.I)
    if codes:
        code = int(codes[-1])  # last AUTHORITY = the full CRS, not a datum
        if code in (4326, 3857, 900913, 102100, 102113):
            return 3857 if code != 4326 else 4326
        return code
    w = wkt.lower()
    if "pseudo-mercator" in w or "web_mercator" in w or "web mercator" in w:
        return 3857
    if "wgs_1984" in w or "wgs 84" in w or "gcs_wgs_1984" in w:
        return 4326
    return None


def geometry_from_shapefile(path: str | Path, geom_id: str | None = None) -> GeometrySet:
    """Read polygon records from an ESRI Shapefile. Requires the ``.prj``
    sidecar (missing CRS fails, reference parity)."""
    path = Path(path)
    prj = path.with_suffix(".prj")
    if not prj.exists():
        raise ValueError(f"{path}: no .prj sidecar — dataset has no CRS (refusing, "
                         "like the reference's GeoDataset)")
    epsg = _epsg_from_wkt(prj.read_text())
    if epsg is None:
        raise ValueError(f"{path}: unrecognized CRS in .prj")

    data = path.read_bytes()
    (file_code,) = struct.unpack_from(">i", data, 0)
    if file_code != 9994:
        raise ValueError(f"{path}: not a shapefile (file code {file_code})")
    (file_len_words,) = struct.unpack_from(">i", data, 24)
    end = file_len_words * 2
    (shape_type,) = struct.unpack_from("<i", data, 32)

    polygons = []
    pos = 100
    while pos < end:
        _recno, content_words = struct.unpack_from(">ii", data, pos)
        pos += 8
        rec_end = pos + content_words * 2
        (stype,) = struct.unpack_from("<i", data, pos)
        if stype in _SHP_POLYGON_TYPES:
            num_parts, num_points = struct.unpack_from("<ii", data, pos + 36)
            parts = np.frombuffer(data, "<i4", num_parts, pos + 44)
            pts_off = pos + 44 + 4 * num_parts
            pts = np.frombuffer(data, "<f8", num_points * 2, pts_off).reshape(-1, 2)
            bounds = np.append(parts, num_points)
            rings = [
                _reproject_ring(
                    np.ascontiguousarray(pts[bounds[i]: bounds[i + 1]], dtype=np.float64),
                    epsg,
                )
                for i in range(num_parts)
                if bounds[i + 1] - bounds[i] >= 3
            ]
            if rings:
                polygons.append(rings)
        elif stype != 0:  # 0 = null shape, skipped silently
            raise ValueError(f"{path}: unsupported shape type {stype} (polygons only)")
        pos = rec_end
    if not polygons:
        raise ValueError(f"{path}: no polygon records (declared type {shape_type})")
    return GeometrySet(
        geom_id=geom_id or path.stem,
        polygons=polygons,
        original_epsg=epsg,
        current_epsg=4326,
    )


def _wkb_dims(gtype: int) -> tuple[int, int]:
    """(base_type, n_dims) handling both ISO WKB (type + 1000*Z + 2000*M)
    and EWKB dimension flags (0x80000000 = Z, 0x40000000 = M). Z/M
    coordinates are parsed correctly and dropped (the engine is 2D)."""
    dims = 2
    if gtype & 0x80000000:
        dims += 1
    if gtype & 0x40000000:
        dims += 1
    gtype &= 0x0FFFFFFF
    iso = gtype // 1000  # 0=2D, 1=Z, 2=M, 3=ZM
    if iso == 1 or iso == 3:
        dims += 1
    if iso == 2 or iso == 3:
        dims += 1
    return gtype % 1000, dims


def _parse_wkb_polygons(blob: bytes, offset: int = 0) -> list:
    """Parse WKB Polygon / MultiPolygon (2D/Z/M/ZM, ISO or EWKB flags,
    either endianness) into a list of polygons (each = list of (N,2)
    rings; Z/M ordinates dropped)."""

    def _rd(fmt, off, little):
        return struct.unpack_from(("<" if little else ">") + fmt, blob, off)

    def _polygon(off):
        little = blob[off] == 1
        (gtype,) = _rd("I", off + 1, little)
        base, dims = _wkb_dims(gtype)
        if base != 3:
            raise ValueError(f"WKB: expected Polygon, got type {gtype}")
        (n_rings,) = _rd("I", off + 5, little)
        off += 9
        rings = []
        for _ in range(n_rings):
            (n_pts,) = _rd("I", off, little)
            off += 4
            coords = np.frombuffer(
                blob, ("<f8" if little else ">f8"), n_pts * dims, off
            ).reshape(-1, dims)[:, :2].astype(np.float64)
            rings.append(np.ascontiguousarray(coords))
            off += n_pts * 8 * dims
        return rings, off

    little = blob[offset] == 1
    (gtype,) = _rd("I", offset + 1, little)
    base, _dims = _wkb_dims(gtype)
    if base == 3:
        rings, _ = _polygon(offset)
        return [rings]
    if base == 6:  # MultiPolygon
        (n_polys,) = _rd("I", offset + 5, little)
        off = offset + 9
        out = []
        for _ in range(n_polys):
            rings, off = _polygon(off)
            out.append(rings)
        return out
    raise ValueError(f"WKB: unsupported geometry type {gtype} (polygons only)")


def geometry_from_geopackage(
    path: str | Path, geom_id: str | None = None, *, layer: str | None = None
) -> GeometrySet:
    """Read polygon features from a GeoPackage (sqlite) feature layer.
    Missing/undefined srs fails (reference parity)."""
    path = Path(path)
    con = sqlite3.connect(str(path))
    try:
        cur = con.execute(
            "SELECT c.table_name, g.column_name, g.srs_id "
            "FROM gpkg_contents c JOIN gpkg_geometry_columns g "
            "ON c.table_name = g.table_name WHERE c.data_type = 'features'"
        )
        layers = cur.fetchall()
        if not layers:
            raise ValueError(f"{path}: no feature layers")
        if layer is not None:
            layers = [l for l in layers if l[0] == layer]
            if not layers:
                raise ValueError(f"{path}: no layer {layer!r}")
        table, geom_col, srs_id = layers[0]
        if srs_id in (0, -1):
            raise ValueError(f"{path}: layer {table!r} has undefined srs "
                             "(refusing, like the reference's GeoDataset)")
        if srs_id not in (4326, 3857):
            # gpkg_spatial_ref_sys may map a custom srs_id to a known EPSG
            row = con.execute(
                "SELECT organization, organization_coordsys_id "
                "FROM gpkg_spatial_ref_sys WHERE srs_id = ?", (srs_id,)
            ).fetchone()
            if row and row[0] and row[0].upper() == "EPSG":
                srs_id = row[1]
        polygons = []
        for (blob,) in con.execute(f'SELECT "{geom_col}" FROM "{table}"'):
            if blob is None:
                continue
            if blob[:2] != b"GP":
                raise ValueError(f"{path}: not GPKG geometry encoding")
            flags = blob[3]
            if flags & 0x10:  # header empty-geometry flag: skip like NULL
                continue
            env_code = (flags >> 1) & 0b111
            env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env_code]
            for rings in _parse_wkb_polygons(bytes(blob), 8 + env_len):
                if not rings:  # ring-less polygon WKB (n_rings=0): skip too
                    continue
                polygons.append([_reproject_ring(r, srs_id) for r in rings])
        if not polygons:
            raise ValueError(f"{path}: layer {table!r} has no polygon features")
        return GeometrySet(
            geom_id=geom_id or table,
            polygons=polygons,
            original_epsg=srs_id,
            current_epsg=4326,
        )
    finally:
        con.close()


def geometry_from_file(path: str | Path, geom_id: str | None = None) -> GeometrySet:
    """Dispatch on extension: .geojson/.json, .shp, .gpkg — the
    reference's supported-format surface (dataset.py:80-88)."""
    from tilegrab_spark.sources.geometries import geometry_from_geojson

    p = Path(path)
    ext = p.suffix.lower()
    if ext in (".geojson", ".json"):
        return geometry_from_geojson(p, geom_id)
    if ext == ".shp":
        return geometry_from_shapefile(p, geom_id)
    if ext == ".gpkg":
        return geometry_from_geopackage(p, geom_id)
    raise ValueError(f"unsupported vector format {ext!r} (geojson/shp/gpkg)")
