"""Tile-addressing interop as PURE Catalyst expressions.

The reference speaks only slippy XYZ (``{z}/{x}/{y}`` in
tile_sources, reference src/tilegrab/tiles/tile.py), but real tile
estates use three more addressings a switching user needs:

- **Quadkey** (Bing/Azure Maps): base-4 string, one digit per zoom
  level, ``digit = x_bit | (y_bit << 1)`` from the top level down.
- **TMS**: identical to XYZ except the y axis grows northward, so
  ``y_tms = 2^z - 1 - y``.
- **Morton / Z-order key**: the x/y bits interleaved into one long.
  This is also the 100 TB *data-layout* primitive: sorting or
  range-partitioning a tile or point table by its Morton key places
  spatially-near cells in the same files/partitions, so bbox queries
  prune most of the scan (the same idea as Delta's OPTIMIZE ZORDER).
  See operators/layout.py for the operator built on it.

Everything here is integer fold arithmetic over ``F.sequence`` +
``F.aggregate`` / ``F.transform`` with ``F.bit_get`` — no float pow,
so keys are exact for every zoom the slippy scheme supports (z <= 30;
2 bits per level fits a signed long to z = 31). No Python in the hot
path; the same formulas are registered for SQL-string users as
``tg_quadkey`` / ``tg_tms_y`` / ``tg_morton_key`` in sql.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(zoom: Column | int) -> Column:
    return F.lit(zoom) if isinstance(zoom, int) else zoom


def quadkey_col(x: Column, y: Column, zoom: Column | int) -> Column:
    """Bing-style quadkey string for slippy tile (x, y) at ``zoom``.

    One base-4 digit per level, most-significant level first:
    ``digit_i = bit_i(x) + 2 * bit_i(y)`` for i = z-1 .. 0.  Zoom 0 is
    the empty string (the single world tile), matching Bing's scheme.
    """
    z = _as_col(zoom).cast("int")
    digits = F.transform(
        F.sequence(z - 1, F.lit(0), F.lit(-1)),
        lambda i: (
            F.bit_get(x.cast("long"), i) + F.bit_get(y.cast("long"), i) * 2
        ).cast("string"),
    )
    # sequence(-1, 0, -1) for z=0 would yield [-1, 0]; guard explicitly.
    # array_join SKIPS null elements, so a NULL x/y would silently give
    # "" — propagate SQL NULL semantics by hand.
    return (
        F.when(x.isNull() | y.isNull() | z.isNull(), F.lit(None).cast("string"))
        .when(z <= 0, F.lit(""))
        .otherwise(F.array_join(digits, ""))
    )


def quadkey_decode_cols(qk: Column) -> tuple[Column, Column, Column]:
    """(z, x, y) long columns recovered from a quadkey string.

    Folds the digit characters high-to-low: ``x = x*2 + (d & 1)``,
    ``y = y*2 + (d >> 1)`` — the exact inverse of quadkey_col.
    """
    z = F.length(qk).cast("int")
    # split("", "") yields [""] — drop empties so zoom 0 folds cleanly
    chars = F.filter(F.split(qk, ""), lambda c: c != F.lit(""))
    digits = F.transform(chars, lambda c: F.ascii(c) - 48)
    acc = F.aggregate(
        digits,
        F.struct(F.lit(0).cast("long").alias("x"), F.lit(0).cast("long").alias("y")),
        lambda a, d: F.struct(
            (a["x"] * 2 + d.bitwiseAND(1).cast("long")).alias("x"),
            (a["y"] * 2 + F.shiftright(d, 1).cast("long")).alias("y"),
        ),
    )
    return z, acc["x"], acc["y"]


def tms_y_col(y: Column, zoom: Column | int) -> Column:
    """TMS (south-origin) row for a slippy (north-origin) row: the
    involution ``2^z - 1 - y`` — applying it twice returns y."""
    z = _as_col(zoom).cast("int")
    # shiftleft needs a literal shift; 2^z via double pow is exact for
    # every representable zoom (powers of two are exact float64).
    return F.pow(F.lit(2.0), z.cast("double")).cast("long") - 1 - y.cast("long")


def morton_key_col(x: Column, y: Column, zoom: Column | int) -> Column:
    """Z-order (Morton) key: x/y bits interleaved, y in the odd bits.

    Folded high-to-low as ``acc*4 + (2*y_bit + x_bit)`` — pure integer
    arithmetic, exact for z <= 31.  Within one zoom level the key is a
    space-filling curve position; across levels a parent's key is its
    child's key shifted right two bits (pinned in tests), which is what
    makes Morton ranges align with tile pyramids.
    """
    z = _as_col(zoom).cast("int")
    xl, yl = x.cast("long"), y.cast("long")
    folded = F.aggregate(
        F.sequence(z - 1, F.lit(0), F.lit(-1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc * 4 + F.bit_get(yl, i) * 2 + F.bit_get(xl, i),
    )
    return F.when(z <= 0, F.lit(0).cast("long")).otherwise(folded)


def morton_parent_col(key: Column, levels: int = 1) -> Column:
    """Morton key of the ancestor ``levels`` zooms up: drop 2 bits per
    level (children of one parent share a key prefix).  ``levels`` is a
    Python int (a shift amount, not data) — integer shiftright keeps
    all 60 key bits exact, which float division would not."""
    return F.shiftright(key.cast("long"), 2 * int(levels))
