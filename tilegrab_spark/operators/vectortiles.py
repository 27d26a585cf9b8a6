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
from pyspark.sql import DataFrame, types as T

from tilegrab_spark.kernels.mvt import encode_mvt

__all__ = ["contours_to_mvt"]

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
