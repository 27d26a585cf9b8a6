"""Vector-tile (MVT) sink for the engine's vector layers.

``contours_to_mvt`` turns a linked contour segment set
(operators/contour.py::link_contours output) into standard Mapbox
Vector Tiles — one MVT blob per (z, x, y), LineString features tagged
with level/contour_id/closed — the vector twin of the PNG tile sink.
Any slippy-map client that speaks MVT renders the layer directly.

No clipping stage is needed: extraction already attributes every
segment to its owning tile (the marching-squares cell's tile), so a
tile's features are exactly the polyline pieces its own segments form.
Per tile the segments re-link with the same deterministic endpoint
walk as ``assemble_contours`` — a contour crossing a tile several
times yields several open pieces, each a LineString feature; a loop
fully inside one tile yields one closed piece.

Plan shape: ONE groupBy((z, x, y)) over the segment table (segments
are output-sized scalars) into an Arrow grouped map that walks,
quantizes to the MVT integer grid (``local = round((g - origin) /
tile_px * extent)``, deterministic), and emits the wire bytes via the
pure-stdlib encoder (kernels/mvt.py). Degenerate pieces that quantize
to a single distinct vertex are dropped (below the tile's resolution).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from tilegrab_spark.kernels.mvt import encode_mvt

__all__ = ["contours_to_mvt", "polygons_to_mvt", "generalize_rings", "ring_pyramid"]

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType(), False),
        T.StructField("x", T.LongType(), False),
        T.StructField("y", T.LongType(), False),
        T.StructField("mvt", T.BinaryType(), False),
        T.StructField("n_features", T.IntegerType(), False),
    ]
)


def _walk_pieces(segs: list) -> list:
    """Split an undirected segment list into maximal paths/cycles:
    deterministic — start at degree-1 endpoints in sorted order, then
    remaining cycles at their smallest vertex."""
    adj: dict = {}
    for i, (a, b) in enumerate(segs):
        adj.setdefault(a, []).append((b, i))
        adj.setdefault(b, []).append((a, i))
    used = [False] * len(segs)
    pieces = []

    def walk(start):
        path = [start]
        cur = start
        while True:
            nxt = None
            for (p, i) in adj[cur]:
                if not used[i]:
                    used[i] = True
                    nxt = p
                    break
            if nxt is None:
                return path
            path.append(nxt)
            cur = nxt

    ends = sorted(p for p, es in adj.items() if len(es) % 2 == 1)
    for p in ends:
        if any(not used[i] for _, i in adj[p]):
            pieces.append(walk(p))
    for p in sorted(adj):
        if any(not used[i] for _, i in adj[p]):
            pieces.append(walk(p))
    return pieces


def contours_to_mvt(
    labeled: DataFrame,
    *,
    tile_px: int = 256,
    extent: int = 4096,
    layer_name: str = "contours",
) -> DataFrame:
    """One MVT blob per tile from ``link_contours`` output:
    ``[z, x, y, mvt, n_features]``. Features are LineStrings in
    tile-local ``extent`` units with tags ``level`` (double),
    ``contour_id`` (int), ``closed`` (bool)."""
    if extent < 16 or extent > 65536:
        raise ValueError(f"extent must be in [16, 65536], got {extent}")
    tp = float(tile_px)
    ext = int(extent)
    lname = str(layer_name)
    cols = ["z", "x", "y", "level", "x1", "y1", "x2", "y2", "contour_id", "closed"]
    src = labeled.select(*cols)

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        z, tx, ty = int(key[0]), int(key[1]), int(key[2])
        ox, oy = tx * tp, ty * tp
        feats = []
        for (cid, lv, closed), grp in pdf.groupby(
            ["contour_id", "level", "closed"], sort=True
        ):
            segs = sorted(
                ((float(r.x1), float(r.y1)), (float(r.x2), float(r.y2)))
                for r in grp.itertuples(index=False)
            )
            for piece in _walk_pieces(segs):
                q = [
                    (
                        int(round((px - ox) / tp * ext)),
                        int(round((py - oy) / tp * ext)),
                    )
                    for px, py in piece
                ]
                dedup = [q[0]]
                for pt in q[1:]:
                    if pt != dedup[-1]:
                        dedup.append(pt)
                if len(dedup) < 2:
                    continue  # below tile resolution
                feats.append(
                    {
                        "id": int(cid) & 0x7FFFFFFFFFFFFFFF,
                        "type": "line",
                        "geom": [dedup],
                        "tags": {
                            "level": float(lv),
                            "contour_id": int(cid),
                            "closed": bool(closed),
                        },
                    }
                )
        data = encode_mvt(
            [{"name": lname, "extent": ext, "features": feats}]
        )
        return pd.DataFrame(
            {
                "z": [z],
                "x": [tx],
                "y": [ty],
                "mvt": [data],
                "n_features": [len(feats)],
            }
        )

    return src.groupBy("z", "x", "y").applyInPandas(build, _OUT_SCHEMA)


def _clip_ring(pts: list, lo, hi) -> list:
    """Sutherland–Hodgman clip of a ring (no closing duplicate) to the
    axis-aligned rectangle [lo, hi]² — EXACT on rectilinear integer
    rings (every crossing of an axis-aligned edge with an axis-aligned
    clip line lands on integer coordinates)."""

    def one_axis(poly, axis, bound, keep_le):
        out = []
        n = len(poly)
        for i in range(n):
            cur, prev = poly[i], poly[i - 1]
            cin = (cur[axis] <= bound) if keep_le else (cur[axis] >= bound)
            pin = (prev[axis] <= bound) if keep_le else (prev[axis] >= bound)
            if cin != pin:
                t_num = bound - prev[axis]
                t_den = cur[axis] - prev[axis]
                other = 1 - axis
                val = prev[other] + (cur[other] - prev[other]) * t_num // t_den
                cross = (bound, val) if axis == 0 else (val, bound)
                out.append(cross)
            if cin:
                out.append(cur)
        return out

    for axis, bound, keep_le in (
        (0, lo[0], False),
        (0, hi[0], True),
        (1, lo[1], False),
        (1, hi[1], True),
    ):
        pts = one_axis(pts, axis, bound, keep_le)
        if not pts:
            return []
    return pts


def _ring_area2(pts: list) -> int:
    n = len(pts)
    return sum(
        pts[i][0] * pts[(i + 1) % n][1] - pts[(i + 1) % n][0] * pts[i][1]
        for i in range(n)
    )


def polygons_to_mvt(
    rings: DataFrame,
    *,
    tile_px: int = 256,
    extent: int = 4096,
    layer_name: str = "regions",
) -> DataFrame:
    """One MVT blob per tile from ``polygonize`` output rings: Polygon
    features in tile-local ``extent`` units, exterior ring first, tags
    ``label``/``region_px``. ``[z, x, y, mvt, n_features]``.

    Plan: every ring explodes to the tiles its bbox touches (two pure-
    Catalyst sequence explodes over array_min/max — output-sized, never
    a cross join), then ONE groupBy((z, x, y)) Arrow grouped map clips
    each ring to its tile with Sutherland–Hodgman (exact on the integer
    rectilinear rings polygonize emits), quantizes to the extent grid
    and encodes via kernels/mvt.py. A tile interior to a region's HOLE
    receives both the exterior and hole rings clipped to the full tile
    square with opposite windings; the net-zero-area feature is dropped
    rather than emitted (winding renderers would cancel it anyway)."""
    if extent < 16 or extent > 65536:
        raise ValueError(f"extent must be in [16, 65536], got {extent}")
    from pyspark.sql import functions as F

    tp, ext, lname = float(tile_px), int(extent), str(layer_name)
    src = rings.filter(F.col("closed")).select(
        "region_id", "z", "label", "region_px", "ring_idx", "xs", "ys"
    )
    tpl = F.lit(int(tile_px))
    tx_lo = F.floor(F.array_min("xs") / tpl)
    tx_hi = F.greatest(F.floor((F.array_max("xs") - 1) / tpl), tx_lo)
    ty_lo = F.floor(F.array_min("ys") / tpl)
    ty_hi = F.greatest(F.floor((F.array_max("ys") - 1) / tpl), ty_lo)
    exploded = (
        src.withColumn("tx", F.explode(F.sequence(tx_lo, tx_hi)))
        .withColumn("ty", F.explode(F.sequence(ty_lo, ty_hi)))
    )

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        z, tx, ty = int(key[0]), int(key[1]), int(key[2])
        lo = (tx * int(tp), ty * int(tp))
        hi = ((tx + 1) * int(tp), (ty + 1) * int(tp))
        ox, oy = float(lo[0]), float(lo[1])
        feats = []
        for (rid, label, rpx), grp in pdf.groupby(
            ["region_id", "label", "region_px"], sort=True
        ):
            clipped = []
            for r in grp.sort_values("ring_idx").itertuples(index=False):
                ring = list(zip(r.xs, r.ys))[:-1]  # drop closing dup
                c = _clip_ring(ring, lo, hi)
                if len(c) < 3:
                    continue
                q = [
                    (
                        int(round((px - ox) / tp * ext)),
                        int(round((py - oy) / tp * ext)),
                    )
                    for px, py in c
                ]
                dedup = [q[0]]
                for pt in q[1:]:
                    if pt != dedup[-1]:
                        dedup.append(pt)
                while len(dedup) > 1 and dedup[-1] == dedup[0]:
                    dedup.pop()
                if len(dedup) < 3 or _ring_area2(dedup) == 0:
                    continue
                clipped.append(dedup)
            if not clipped or sum(_ring_area2(c) for c in clipped) == 0:
                continue
            clipped.sort(key=lambda c: -_ring_area2(c))
            feats.append(
                {
                    "id": int(rid) & 0x7FFFFFFFFFFFFFFF,
                    "type": "polygon",
                    "geom": clipped,
                    "tags": {"label": int(label), "region_px": int(rpx)},
                }
            )
        data = encode_mvt([{"name": lname, "extent": ext, "features": feats}])
        return pd.DataFrame(
            {
                "z": [z],
                "x": [tx],
                "y": [ty],
                "mvt": [data],
                "n_features": [len(feats)],
            }
        )

    return exploded.groupBy("z", "tx", "ty").applyInPandas(build, _OUT_SCHEMA)


_GEN_SCHEMA = T.StructType(
    [
        T.StructField("region_id", T.LongType(), False),
        T.StructField("z", T.IntegerType(), False),
        T.StructField("label", T.IntegerType(), True),
        T.StructField("region_px", T.LongType(), True),
        T.StructField("ring_idx", T.IntegerType(), False),
        T.StructField("is_hole", T.BooleanType(), False),
        T.StructField("closed", T.BooleanType(), False),
        T.StructField("signed_area_px", T.LongType(), False),
        T.StructField("n_vertices", T.IntegerType(), False),
        T.StructField("xs", T.ArrayType(T.LongType()), False),
        T.StructField("ys", T.ArrayType(T.LongType()), False),
    ]
)


def generalize_rings(
    rings: DataFrame,
    *,
    to_zoom: int,
    tolerance_px: float = 1.0,
    min_ring_area_px: float = 2.0,
) -> DataFrame:
    """Cartographic generalization of ``polygonize`` rings to a coarser
    zoom: coordinates rescale to the target zoom's global-pixel grid
    (÷ 2^(z - to_zoom), rounded — ≤ half a display pixel of error),
    Douglas-Peucker simplifies at ``tolerance_px`` IN TARGET-ZOOM
    pixels (contour.py's ring convention: closed rings split at their
    first vertex), rings whose simplified |area| falls below
    ``min_ring_area_px`` drop, and regions whose EXTERIOR dropped lose
    their holes too (a relational semi-join on surviving exteriors —
    no orphan holes reach the tile cut). Output keeps the polygonize
    ring schema with ``z = to_zoom``, so a UNION of several
    generalized levels feeds ONE ``polygons_to_mvt`` call (it groups
    by (z, x, y)) and one PMTiles export — the vector-pyramid recipe.

    Per-ring work is an embarrassingly parallel Arrow map (no shuffle);
    the only shuffle is the tiny exterior-survivor semi-join. Known
    cartographic caveat, same as every per-feature simplifier
    (mapshaper default, ogr2ogr -simplify): shared boundaries simplify
    independently, so adjacent regions can open hairline slivers at
    display zooms; topology-preserving arc simplification is a
    different algorithm class, out of scope by design."""
    if tolerance_px < 0:
        raise ValueError(f"tolerance_px must be >= 0, got {tolerance_px}")
    from tilegrab_spark.operators.contour import _dp_keep_mask

    tol = float(tolerance_px)
    min_a = float(min_ring_area_px)
    tz = int(to_zoom)

    src = rings.filter(F.col("closed")).select(
        "region_id", "z", "label", "region_px", "ring_idx", "is_hole",
        "closed", "signed_area_px", "n_vertices", "xs", "ys",
    )

    def gen(batches):
        names = list(_GEN_SCHEMA.fieldNames())
        for pdf in batches:
            recs = []
            for t in pdf.itertuples(index=False):
                dz = int(t.z) - tz
                if dz < 0:
                    raise ValueError(
                        f"to_zoom {tz} is finer than the source zoom {int(t.z)}"
                    )
                scale = float(1 << dz)
                x = np.asarray(list(t.xs), dtype=np.float64) / scale
                y = np.asarray(list(t.ys), dtype=np.float64) / scale
                if x.shape[0] > 2 and tol > 0:
                    m = _dp_keep_mask(x, y, tol)
                    x, y = x[m], y[m]
                xi = np.rint(x).astype(np.int64)
                yi = np.rint(y).astype(np.int64)
                # drop consecutive duplicates introduced by rounding
                if xi.shape[0] > 1:
                    keep = np.ones(xi.shape[0], dtype=bool)
                    keep[1:] = (np.diff(xi) != 0) | (np.diff(yi) != 0)
                    xi, yi = xi[keep], yi[keep]
                # re-close after simplify/round
                if xi.shape[0] >= 3 and (xi[0] != xi[-1] or yi[0] != yi[-1]):
                    xi = np.append(xi, xi[0])
                    yi = np.append(yi, yi[0])
                if xi.shape[0] < 4:
                    continue  # collapsed
                area2 = int(
                    np.sum(xi[:-1] * yi[1:] - xi[1:] * yi[:-1])
                )
                if abs(area2) / 2.0 < min_a:
                    continue
                recs.append({
                    "region_id": int(t.region_id), "z": tz,
                    "label": None if t.label is None else int(t.label),
                    "region_px": None if t.region_px is None else int(t.region_px),
                    "ring_idx": int(t.ring_idx), "is_hole": bool(t.is_hole),
                    "closed": True, "signed_area_px": area2 // 2,
                    "n_vertices": int(xi.shape[0]),
                    "xs": [int(v) for v in xi], "ys": [int(v) for v in yi],
                })
            yield pd.DataFrame(
                {n: pd.Series([r[n] for r in recs], dtype=object) for n in names}
            )

    out = src.mapInPandas(gen, schema=_GEN_SCHEMA)
    exteriors = out.filter(F.col("ring_idx") == 0).select("region_id").distinct()
    return out.join(exteriors, on="region_id", how="leftsemi")


def ring_pyramid(
    rings: DataFrame,
    *,
    zooms,
    tolerance_px: float = 1.0,
    min_ring_area_px: float = 2.0,
) -> DataFrame:
    """Union of :func:`generalize_rings` at each target zoom (the source
    zoom itself passes through untouched when listed) — feed directly to
    :func:`polygons_to_mvt` for a multi-zoom vector tile set."""
    parts = []
    for tz in zooms:
        parts.append(
            generalize_rings(
                rings, to_zoom=int(tz), tolerance_px=tolerance_px,
                min_ring_area_px=min_ring_area_px,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
