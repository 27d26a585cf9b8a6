"""Tile-source registry (the reference's pluggable provider surface,
sources/base.py:7-30) re-expressed as data + a Catalyst projection.

In the reference a provider is a subclass with a ``{z}/{x}/{y}`` URL
template (sources/public.py:7-23, restricted.py:7-32); fetching is HTTP.
In this engine the provider is a ``source_id`` dimension of the image
table and URL rendering is a pure column expression (S4/P12) — no
network, no Python in the hot path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TileSource:
    uid: str
    name: str
    url_template: str  # python-format style with {z} {x} {y} [{q}] [{token}]
    requires_key: bool = False

    def get_url(self, z: int, x: int, y: int, api_key: str | None = None) -> str:
        """Driver-side scalar render — parity with sources/base.py:22-25
        and the Nearmap key check (restricted.py:26-32).  ``{q}`` (the
        Bing/Azure quadkey — engine extension, functions/interop.py)
        renders from the same (z, x, y)."""
        if self.requires_key and not api_key:
            raise ValueError(f"API key required for {self.name}")
        q = "".join(
            str(((x >> (i - 1)) & 1) | (((y >> (i - 1)) & 1) << 1))
            for i in range(z, 0, -1)
        )
        return self.url_template.format(x=x, y=y, z=z, q=q, token=api_key or "")


# Templates copied verbatim from the reference provider classes
# (sources/public.py:11,18-21; sources/restricted.py:11,27-29).
SOURCES: dict[str, TileSource] = {
    s.uid: s
    for s in (
        TileSource("osm", "OSM", "https://tile.openstreetmap.org/{z}/{x}/{y}.png"),
        TileSource(
            "esri_wi",
            "ESRIWorldImagery",
            "https://server.arcgisonline.com/ArcGIS/rest/services/"
            "World_Imagery/MapServer/tile/{z}/{y}/{x}",
        ),
        TileSource("gsat", "GoogleSat", "https://mt1.google.com/vt/lyrs=s&x={x}&y={y}&z={z}"),
        TileSource(
            "nmsat",
            "NearmapSat",
            "https://api.nearmap.com/tiles/v3/Vert/{z}/{x}/{y}.png?apikey={token}",
            requires_key=True,
        ),
        # Engine extension (not in the reference): a quadkey-addressed
        # provider in the Bing/Azure Maps shape — exercises the {q}
        # template path end-to-end.
        TileSource(
            "bingsat",
            "BingSat",
            "https://ecn.t0.tiles.virtualearth.net/tiles/a{q}.jpeg?g=1",
        ),
    )
}


def url_column(uid: str, z: Column, x: Column, y: Column, api_key: str | None = None) -> Column:
    """URL render as a vectorized Catalyst expression (no UDF): converts the
    provider's python-format template into a format_string projection."""
    src = SOURCES[uid]
    if src.requires_key and not api_key:
        raise ValueError(f"API key required for {src.name}")
    tmpl = src.url_template
    if api_key:
        tmpl = tmpl.replace("{token}", api_key)
    cols: list[Column] = []

    def repl(m: re.Match) -> str:
        ph = m.group(1)
        if ph == "q":
            from tilegrab_spark.functions.interop import quadkey_col

            cols.append(quadkey_col(x, y, z))
            return "%s"
        cols.append({"z": z, "x": x, "y": y}[ph])
        return "%d"

    fmt = re.sub(r"\{([zxyq])\}", repl, tmpl).replace("%%", "%")
    return F.format_string(fmt, *cols)
