"""S2-format spherical cell ids as pure Catalyst expressions.

The engine's slippy XYZ cells (functions/cells.py) carry Web-Mercator
distortion and exclude the poles; the hex lattice (operators/hexbin.py)
is planar too. This module adds the third addressing the north-star
brief names: S2-STYLE cells — the unit sphere projected onto a cube
(six faces, no singularities, every point on Earth included), each face
subdivided as a quadtree walked by a Hilbert curve, the whole cell
packed into one positive int64 with S2's id algebra:

- ``cell = face ∥ curve-position ∥ 1-marker`` (left-aligned, the
  trailing-one marker encodes the level);
- ``parent``  = clear the low bits, move the marker up — pure bit math;
- ``[range_min, range_max]`` = ``cell ∓ (lsb - 1)`` — every descendant
  of a cell is one CONTIGUOUS id range (the Hilbert fold consumes bits
  high-to-low, so a level-L position prefixes all its children), which
  is what makes "points in region" a range predicate parquet min/max
  stats can prune, at any mix of levels.

Faithful to public S2 (same cube projection with the quadratic S-T
correction that equalizes cell areas, same face→(u,v) axes, same
id/level/parent/range algebra), with two DOCUMENTED deviations — ids
are therefore NOT bit-compatible with the s2geometry library, while
every algebraic property holds:

- max level 28 (not 30) and the face placed at bits 57-59, keeping
  ids positive in a signed long (Spark has no uint64; s2geometry ids
  with face >= 4 go negative as longs and break ORDER BY/BETWEEN);
- one fixed Hilbert orientation on every face (s2geometry alternates
  per-face curve orientations; a fixed orientation preserves all
  within-face locality and the hierarchy/range algebra — only
  cross-face edge adjacency of ids is weaker, which no range query
  relies on).

Everything is whole-stage-codegen arithmetic (trig + when-chains +
the ``hilbert_key_col`` fold) — no UDF, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from tilegrab_spark.functions.interop import hilbert_key_col

__all__ = [
    "S2_MAX_LEVEL",
    "s2_cell_col",
    "s2_parent_col",
    "s2_level_col",
    "s2_range_cols",
]

S2_MAX_LEVEL = 28


def _check_level(level: int) -> int:
    if not isinstance(level, int) or not 1 <= level <= S2_MAX_LEVEL:
        raise ValueError(
            f"level must be an int in [1, {S2_MAX_LEVEL}], got {level!r}"
        )
    return level


def s2_cell_col(lon: Column, lat: Column, level: int) -> Column:
    """S2-format cell id (long) of a lon/lat degree point at ``level``
    (a Python int, 1..28 — shift widths, not data). NULL in, NULL out.

    Pipeline (all Catalyst scalar arithmetic): degrees → unit-sphere
    XYZ → dominant-axis cube face + (u, v) in [-1, 1] → S2's quadratic
    ``st = 0.5*sqrt(1 + 3u)`` area-equalizing transform → (i, j) grid
    coords → Hilbert position (``hilbert_key_col`` fold) → packed id.
    """
    _check_level(level)
    phi, theta = F.radians(lat.cast("double")), F.radians(lon.cast("double"))
    x = F.cos(phi) * F.cos(theta)
    y = F.cos(phi) * F.sin(theta)
    z = F.sin(phi)
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    on_x = (ax >= ay) & (ax >= az)
    on_y = (ay >= ax) & (ay >= az)
    face = (
        F.when(on_x, F.when(x > 0, F.lit(0)).otherwise(F.lit(3)))
        .when(on_y, F.when(y > 0, F.lit(1)).otherwise(F.lit(4)))
        .otherwise(F.when(z > 0, F.lit(2)).otherwise(F.lit(5)))
        .cast("long")
    )
    u = (
        F.when(face == 0, y / x)
        .when(face == 1, -x / y)
        .when(face == 2, -x / z)
        .when(face == 3, z / x)
        .when(face == 4, z / y)
        .otherwise(-y / z)
    )
    v = (
        F.when(face == 0, z / x)
        .when(face == 1, z / y)
        .when(face == 2, -y / z)
        .when(face == 3, y / x)
        .when(face == 4, -x / y)
        .otherwise(-x / z)
    )

    def st(w: Column) -> Column:
        return F.when(
            w >= 0, 0.5 * F.sqrt(1.0 + 3.0 * w)
        ).otherwise(1.0 - 0.5 * F.sqrt(1.0 - 3.0 * w))

    n = 1 << level

    def grid(w: Column) -> Column:
        return F.least(
            F.lit(n - 1).cast("long"),
            F.greatest(F.lit(0).cast("long"), F.floor(st(w) * n).cast("long")),
        )

    i, j = grid(u), grid(v)
    pos = hilbert_key_col(i, j, level)
    shift = 2 * (S2_MAX_LEVEL - level)
    cell = (
        F.shiftleft(face, 2 * S2_MAX_LEVEL + 1)
        + F.shiftleft(pos, shift + 1)
        + F.lit(1 << shift).cast("long")
    )
    return F.when(lon.isNull() | lat.isNull(), F.lit(None).cast("long")).otherwise(
        cell
    )


def _lsb(cell: Column) -> Column:
    c = cell.cast("long")
    return c.bitwiseAND(-c)


def s2_level_col(cell: Column) -> Column:
    """Subdivision level encoded by a cell's trailing-one marker
    (``28 - trailing_zeros/2``) — exact integer recovery via log2 of
    the isolated lsb (a power of two, exact in float64)."""
    tz = F.log2(_lsb(cell).cast("double")).cast("long")
    return (F.lit(S2_MAX_LEVEL) - (tz / 2).cast("long")).cast("int")


def s2_parent_col(cell: Column, levels: int = 1) -> Column:
    """Ancestor cell ``levels`` up: move the marker up two bits per
    level and clear what it passed — children share the parent's
    position prefix, so this is pure bit math (no re-projection).
    NULL when the cell is too shallow to have that ancestor."""
    if not isinstance(levels, int) or levels < 1:
        raise ValueError(f"levels must be a positive int, got {levels!r}")
    new_lsb = _lsb(cell) * F.lit(1 << (2 * levels)).cast("long")
    parent = cell.cast("long").bitwiseAND(
        F.bitwise_not(new_lsb - 1)
    ).bitwiseOR(new_lsb)
    return F.when(s2_level_col(cell) >= levels + 1, parent).otherwise(
        F.lit(None).cast("long")
    )


def s2_range_cols(cell: Column) -> tuple[Column, Column]:
    """``(range_min, range_max)`` — the inclusive id interval holding
    every descendant of ``cell`` AT EVERY DEEPER LEVEL (and the cell
    itself). Containment join = ``point_cell BETWEEN range_min AND
    range_max``; with an s2-sorted layout (cluster_by_space on the
    cell column) parquet min/max stats prune the scan to the region."""
    c = cell.cast("long")
    spread = _lsb(cell) - 1
    return c - spread, c + spread
