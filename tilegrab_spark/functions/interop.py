"""Tile-addressing interop as PURE Catalyst expressions.

The reference speaks only slippy XYZ (``{z}/{x}/{y}`` in
tile_sources, reference src/tilegrab/tiles/tile.py), but real tile
estates use three more addressings a switching user needs:

- **Quadkey** (Bing/Azure Maps): base-4 string, one digit per zoom
  level, ``digit = x_bit | (y_bit << 1)`` from the top level down.
- **TMS**: identical to XYZ except the y axis grows northward, so
  ``y_tms = 2^z - 1 - y``.
- **Geohash**: the base-32 lat/lon cell string (interval-halving,
  bit-exact vs the public spec) — encode + center decode.
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


def hilbert_key_col(x: Column, y: Column, zoom: Column | int) -> Column:
    """Hilbert-curve key of slippy tile (x, y) at ``zoom`` — the
    locality-optimal alternative to :func:`morton_key_col` for data
    layout (consecutive keys are ALWAYS grid-adjacent; Z-order jumps
    across quadrant seams, so Hilbert-sorted files have strictly
    tighter per-file bounding boxes on seam-heavy estates).

    The standard top-down quadrant walk (the public-domain xy2d
    formulation: per level take the quadrant bits (rx, ry), emit gray
    code ``(3*rx) XOR ry``, then reflect/transpose the frame) as ONE
    ``F.aggregate`` fold with a (x, y, d) struct accumulator — pure
    integer Catalyst, no UDF, exact for z <= 30.  The key accumulates
    high-to-low as ``d*4 + code`` (bit-identical to the ``s*s`` sum;
    pinned against the sequential reference in tests).  NULL in, NULL
    out; zoom <= 0 keys to 0 (the single world tile).

    Unlike Morton, a Hilbert parent key is NOT ``child >> 2`` (the
    frame rotates per level) — pyramid-aligned range math stays with
    Morton (``morton_ranges_for_bbox``); use Hilbert for sort/layout
    keys where only relative order matters.
    """
    z = _as_col(zoom).cast("int")
    xl, yl = x.cast("long"), y.cast("long")
    # full-width reflection constant n-1 = 2^z - 1 (exact: powers of
    # two are exact float64; lower bits of n-1-x equal s-1-x for every
    # later level, so full-width and masked reflection agree)
    n1 = F.pow(F.lit(2.0), z.cast("double")).cast("long") - 1
    folded = F.aggregate(
        F.sequence(z - 1, F.lit(0), F.lit(-1)),
        F.struct(
            xl.alias("x"), yl.alias("y"), F.lit(0).cast("long").alias("d")
        ),
        lambda acc, i: _hilbert_step(acc, i, n1),
        lambda acc: acc["d"],
    )
    return (
        F.when(x.isNull() | y.isNull() | z.isNull(), F.lit(None).cast("long"))
        .when(z <= 0, F.lit(0).cast("long"))
        .otherwise(folded)
    )


def _hilbert_step(acc: Column, i: Column, n1: Column) -> Column:
    """One level of the Hilbert fold: consume bit ``i`` of the working
    frame, emit the quadrant's gray code into ``d``, rotate the frame.
    ry=1 keeps the frame; ry=0 swaps axes, reflecting both first when
    rx=1 (the two U-turn quadrants of the curve)."""
    rx = F.bit_get(acc["x"], i)
    ry = F.bit_get(acc["y"], i)
    code = (rx * 3).bitwiseXOR(ry).cast("long")
    keep = ry == 1
    flip = rx == 1
    new_x = F.when(keep, acc["x"]).otherwise(
        F.when(flip, n1 - acc["y"]).otherwise(acc["y"])
    )
    new_y = F.when(keep, acc["y"]).otherwise(
        F.when(flip, n1 - acc["x"]).otherwise(acc["x"])
    )
    return F.struct(
        new_x.alias("x"), new_y.alias("y"), (acc["d"] * 4 + code).alias("d")
    )


# ---------------------------------------------------------------------------
# Geohash (the fourth interop addressing: base-32 lat/lon cells)
# ---------------------------------------------------------------------------

_GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_col(lon: Column, lat: Column, precision: int) -> Column:
    """Geohash string of a lon/lat point at ``precision`` characters
    (1..12) — pure Catalyst. ``precision`` is a Python int (a
    bit-width, not data).

    Uses the spec's INTERVAL-HALVING formulation as one fold (struct
    accumulator carrying the shrinking lon/lat interval plus the bit
    value), not the ``floor((v-lo)/span * 2^k)`` shortcut — the two
    differ for points within a float ulp of a cell boundary (e.g.
    subnormal latitudes), and halving is the ground truth every public
    implementation agrees on (pinned by the hypothesis test against a
    scalar halving reference). 12 chars = 60 bits fits one signed
    long. NULL lon/lat propagates to NULL."""
    p = int(precision)
    if not 1 <= p <= 12:
        raise ValueError(f"precision must be in [1, 12], got {p}")
    bits = 5 * p
    lon_d, lat_d = lon.cast("double"), lat.cast("double")

    def step(acc: Column, k: Column) -> Column:
        even = k % 2 == 0
        mid_lon = (acc["lolon"] + acc["hilon"]) / 2
        mid_lat = (acc["lolat"] + acc["hilat"]) / 2
        bit_lon = (lon_d >= mid_lon).cast("long")
        bit_lat = (lat_d >= mid_lat).cast("long")
        return F.struct(
            F.when(even & (bit_lon == 1), mid_lon).otherwise(acc["lolon"]).alias("lolon"),
            F.when(even & (bit_lon == 0), mid_lon).otherwise(acc["hilon"]).alias("hilon"),
            F.when(~even & (bit_lat == 1), mid_lat).otherwise(acc["lolat"]).alias("lolat"),
            F.when(~even & (bit_lat == 0), mid_lat).otherwise(acc["hilat"]).alias("hilat"),
            (acc["v"] * 2 + F.when(even, bit_lon).otherwise(bit_lat)).alias("v"),
        )

    init = F.struct(
        F.lit(-180.0).alias("lolon"),
        F.lit(180.0).alias("hilon"),
        F.lit(-90.0).alias("lolat"),
        F.lit(90.0).alias("hilat"),
        F.lit(0).cast("long").alias("v"),
    )
    val = F.aggregate(F.sequence(F.lit(0), F.lit(bits - 1)), init, step)["v"]
    alph = F.lit(_GEOHASH_ALPHABET)
    # char c (0 = leftmost) covers bits [5(p-1-c), 5(p-c)) of val;
    # shiftright needs a literal shift, so extract the 5 bits by fold
    chars = F.transform(
        F.sequence(F.lit(0), F.lit(p - 1)),
        lambda c: F.substring(
            alph,
            (
                F.aggregate(
                    F.sequence(F.lit(0), F.lit(4)),
                    F.lit(0).cast("long"),
                    lambda acc, j: acc * 2
                    + F.bit_get(val, ((F.lit(p - 1) - c) * 5 + 4 - j).cast("int")),
                )
                + 1
            ).cast("int"),
            1,
        ),
    )
    return F.when(
        lon_d.isNotNull() & lat_d.isNotNull(), F.array_join(chars, "")
    ).otherwise(F.lit(None).cast("string"))


def geohash_decode_cols(gh: Column) -> tuple[Column, Column]:
    """(lon, lat) CELL-CENTER columns of a geohash string of any
    length 1..12 — base-32 digits fold to the bit value, then the same
    interval-halving fold in reverse (take the half each bit names);
    the center is the midpoint of the final interval. NULL/empty input
    yields NULLs."""
    p = F.length(gh).cast("int")
    bits = p * 5
    alph = F.lit(_GEOHASH_ALPHABET)
    val = F.aggregate(
        F.sequence(F.lit(1), p),
        F.lit(0).cast("long"),
        lambda acc, i: acc * 32
        + (F.instr(alph, F.substring(gh, i.cast("int"), 1)) - 1).cast("long"),
    )

    def step(acc: Column, k: Column) -> Column:
        even = k % 2 == 0
        bit = F.bit_get(val, (bits - 1 - k).cast("int"))
        mid_lon = (acc["lolon"] + acc["hilon"]) / 2
        mid_lat = (acc["lolat"] + acc["hilat"]) / 2
        return F.struct(
            F.when(even & (bit == 1), mid_lon).otherwise(acc["lolon"]).alias("lolon"),
            F.when(even & (bit == 0), mid_lon).otherwise(acc["hilon"]).alias("hilon"),
            F.when(~even & (bit == 1), mid_lat).otherwise(acc["lolat"]).alias("lolat"),
            F.when(~even & (bit == 0), mid_lat).otherwise(acc["hilat"]).alias("hilat"),
            acc["v"].alias("v"),
        )

    init = F.struct(
        F.lit(-180.0).alias("lolon"),
        F.lit(180.0).alias("hilon"),
        F.lit(-90.0).alias("lolat"),
        F.lit(90.0).alias("hilat"),
        F.lit(0).cast("long").alias("v"),
    )
    box = F.aggregate(F.sequence(F.lit(0), bits - 1), init, step)
    lon = (box["lolon"] + box["hilon"]) / 2
    lat = (box["lolat"] + box["hilat"]) / 2
    ok = gh.isNotNull() & (F.length(gh) >= 1)
    return (
        F.when(ok, lon).otherwise(F.lit(None).cast("double")),
        F.when(ok, lat).otherwise(F.lit(None).cast("double")),
    )
