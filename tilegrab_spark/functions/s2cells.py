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
    "s2_ranges_for_bbox",
    "s2_bbox_predicate",
    "s2_ranges_for_cap",
    "s2_cap_predicate",
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
    # NaN coordinates would sail through the when-chains (every NaN
    # comparison is false → face 5, floor(NaN) → 0) and pile corrupt
    # rows into one concrete south-pole corner cell — null them like
    # NULLs instead
    bad = lon.isNull() | lat.isNull() | F.isnan(lon) | F.isnan(lat)
    return F.when(bad, F.lit(None).cast("long")).otherwise(cell)


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


# ---------------------------------------------------------------------------
# Region covering (the read side — the S2 RegionCoverer shape)
# ---------------------------------------------------------------------------
#
# Driver-side by design, like operators/layout.py::morton_ranges_for_bbox:
# the bbox is query metadata (four floats), the output feeds a pushed-down
# ``cell BETWEEN lo AND hi`` disjunction; no data moves through Python.


def _st2uv(s: float) -> float:
    return (4 * s * s - 1) / 3 if s >= 0.5 else (1 - 4 * (1 - s) * (1 - s)) / 3


_FACE_XYZ = {
    0: lambda u, v: (1.0, u, v),
    1: lambda u, v: (-u, 1.0, v),
    2: lambda u, v: (-u, -v, 1.0),
    3: lambda u, v: (-1.0, -v, -u),
    4: lambda u, v: (v, -1.0, -u),
    5: lambda u, v: (v, u, -1.0),
}


def _cell_lonlat_bounds(face: int, u0: float, u1: float, v0: float, v1: float):
    """EXACT (lat_min, lat_max, lon_intervals) of the spherical patch
    that is the central projection of face-plane rect [u0,u1]x[v0,v1]
    (central projection preserves direction, so extremes over the
    sphere equal extremes over the PLANAR rect — closed-form per face
    class). ``lon_intervals``: list of (lo, hi) in [-180, 180], or
    ``None`` when the patch contains a pole (all longitudes).

    Latitude: equatorial faces have z linear in one rect coordinate and
    r_xy = sqrt(1 + w^2) in the other — extremes at corners plus the
    w = 0 crossing; polar faces have lat = ±atan(1/hypot(u, v)) —
    extremes at the origin-clamped nearest point and the farthest
    corner. Longitude: a convex planar rect avoiding the polar axis
    subtends a minimal arc <= 180° attained at corners (support lines
    of a polygon touch vertices); the largest-gap-of-sorted-angles
    construction recovers it, split at the ±180 seam.
    """
    import math

    if face in (0, 1):  # z = v, r = hypot(1, u)
        us = [u0, u1] + ([0.0] if u0 <= 0.0 <= u1 else [])
        lats = [
            math.degrees(math.atan2(v, math.hypot(1.0, u)))
            for v in (v0, v1)
            for u in us
        ]
    elif face in (3, 4):  # z = -u, r = hypot(1, v)
        vs = [v0, v1] + ([0.0] if v0 <= 0.0 <= v1 else [])
        lats = [
            math.degrees(math.atan2(-u, math.hypot(1.0, v)))
            for u in (u0, u1)
            for v in vs
        ]
    else:  # polar: z = ±1, r = hypot(u, v)
        du = 0.0 if u0 <= 0.0 <= u1 else min(abs(u0), abs(u1))
        dv = 0.0 if v0 <= 0.0 <= v1 else min(abs(v0), abs(v1))
        rmin = math.hypot(du, dv)
        rmax = max(math.hypot(u, v) for u in (u0, u1) for v in (v0, v1))
        near = 90.0 if rmin == 0.0 else math.degrees(math.atan2(1.0, rmin))
        far = math.degrees(math.atan2(1.0, rmax))
        lats = [near, far] if face == 2 else [-near, -far]
    lat_min, lat_max = min(lats), max(lats)

    if face in (2, 5) and u0 <= 0.0 <= u1 and v0 <= 0.0 <= v1:
        return lat_min, lat_max, None  # pole inside: all longitudes
    corners = []
    for u in (u0, u1):
        for v in (v0, v1):
            x, y, _ = _FACE_XYZ[face](u, v)
            corners.append(math.degrees(math.atan2(y, x)))
    ang = sorted(corners)
    gaps = [(ang[(i + 1) % 4] - ang[i]) % 360.0 for i in range(4)]
    gi = max(range(4), key=lambda i: gaps[i])
    lo, hi = ang[(gi + 1) % 4], ang[gi]
    if lo <= hi:
        return lat_min, lat_max, [(lo, hi)]
    return lat_min, lat_max, [(lo, 180.0), (-180.0, hi)]


_EPS = 1e-12


def _ivals_disjoint(a, b) -> bool:
    """True only when the interval lists certainly do not intersect
    (None = full circle). Unsure → False (conservative: recurse)."""
    if a is None or b is None:
        return False
    return all(
        ah < bl - _EPS or bh < al - _EPS for al, ah in a for bl, bh in b
    )


def _ivals_contained(inner, outer) -> bool:
    """True only when ``inner`` certainly sits inside ``outer``."""
    if outer is None:
        return True
    if inner is None:
        return False
    return all(
        any(ol - _EPS <= il and ih <= oh + _EPS for ol, oh in outer)
        for il, ih in inner
    )


def s2_ranges_for_bbox(
    lon0: float,
    lat0: float,
    lon1: float,
    lat1: float,
    *,
    max_level: int = 12,
    max_ranges: int = 64,
) -> list[tuple[int, int]]:
    """Cover a lat/lon bbox with contiguous S2-format id ranges — the
    RegionCoverer recursion: per face, a cell certainly inside the bbox
    emits its descendant range, certainly disjoint is dropped,
    straddling recurses to ``max_level`` (then emits — over-scan, never
    loss). ``lon0 > lon1`` means the bbox crosses the antimeridian.

    Output ranges select every point cell encoded at ANY level >= the
    emitted cover cells' levels (the practical case: point columns are
    fine-level). Adjacent ranges merge; if the count would exceed
    ``max_ranges`` the smallest gaps coalesce — extra ids only cost
    over-scan, callers still apply the exact lon/lat predicate.
    """
    import math

    if not (-90.0 <= lat0 <= lat1 <= 90.0):
        raise ValueError(f"need -90 <= lat0 <= lat1 <= 90, got {lat0}, {lat1}")
    if not isinstance(max_level, int) or not 0 <= max_level <= S2_MAX_LEVEL:
        raise ValueError(f"max_level must be in [0, {S2_MAX_LEVEL}], got {max_level!r}")
    if lon0 <= lon1:
        qlon = [(lon0, lon1)]
    else:  # antimeridian crossing
        qlon = [(lon0, 180.0), (-180.0, lon1)]

    def classify(face, u0, u1, v0, v1):
        clat0, clat1, clon = _cell_lonlat_bounds(face, u0, u1, v0, v1)
        if clat1 < lat0 - _EPS or clat0 > lat1 + _EPS:
            return "out"
        if _ivals_disjoint(clon, qlon):
            return "out"
        if (
            lat0 - _EPS <= clat0
            and clat1 <= lat1 + _EPS
            and _ivals_contained(clon, qlon)
        ):
            return "in"
        return "split"

    return _cover_region(classify, max_level, max_ranges)


def _xy2d_py(z: int, x: int, y: int) -> int:
    """Python mirror of the Catalyst hilbert fold (same public xy2d
    walk) — driver-side id construction for the coverers."""
    n = 1 << z
    d = 0
    s = n >> 1
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s >>= 1
    return d


def _cover_region(classify, max_level: int, max_ranges: int) -> list[tuple[int, int]]:
    """Shared RegionCoverer recursion: ``classify(face, u0, u1, v0,
    v1)`` returns ``"in"`` (emit the cell's descendant range), ``"out"``
    (drop) or ``"split"`` (recurse; emits at ``max_level`` — over-scan,
    never loss). Adjacent ranges merge; smallest gaps coalesce down to
    ``max_ranges``."""
    out: list[tuple[int, int]] = []

    def emit(face: int, i: int, j: int, level: int) -> None:
        shift = 2 * (S2_MAX_LEVEL - level)
        cid = (
            (face << (2 * S2_MAX_LEVEL + 1))
            | (_xy2d_py(level, i, j) << (shift + 1))
            | (1 << shift)
        )
        lsb = 1 << shift
        out.append((cid - (lsb - 1), cid + (lsb - 1)))

    def visit(face: int, i: int, j: int, level: int) -> None:
        n = 1 << level
        u0, u1 = _st2uv(i / n), _st2uv((i + 1) / n)
        v0, v1 = _st2uv(j / n), _st2uv((j + 1) / n)
        cls = classify(face, u0, u1, v0, v1)
        if cls == "out":
            return
        if cls == "in" or level == max_level:
            emit(face, i, j, level)
            return
        for di in (0, 1):
            for dj in (0, 1):
                visit(face, 2 * i + di, 2 * j + dj, level + 1)

    for face in range(6):
        visit(face, 0, 0, 0)
    out.sort()
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        # adjacent sibling ranges sit exactly 2 apart (the skipped id is
        # a coarser straddling cell — merging keeps fine-level exactness)
        if merged and lo <= merged[-1][1] + 2:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    while len(merged) > max_ranges:
        gaps = [
            (merged[i + 1][0] - merged[i][1], i) for i in range(len(merged) - 1)
        ]
        _, i = min(gaps)
        merged[i] = (merged[i][0], merged[i + 1][1])
        del merged[i + 1]
    return merged


# P(u, v) = A + B*u + C*v per face — the linear face-plane frames the
# cap coverer's closed-form angle extremes run on (same maps as
# _FACE_XYZ, split into the affine components)
_FACE_ABC = {
    0: ((1, 0, 0), (0, 1, 0), (0, 0, 1)),
    1: ((0, 1, 0), (-1, 0, 0), (0, 0, 1)),
    2: ((0, 0, 1), (-1, 0, 0), (0, -1, 0)),
    3: ((-1, 0, 0), (0, 0, -1), (0, -1, 0)),
    4: ((0, -1, 0), (0, 0, -1), (1, 0, 0)),
    5: ((0, 0, -1), (0, 1, 0), (1, 0, 0)),
}

# mean earth radius, meters (IUGG) — the same sphere the engine's
# haversine paths use (operators/trajectory.py::_EARTH_R)
_EARTH_R = 6371008.8


def _cap_cos_extremes(face: int, cvec, u0: float, u1: float, v0: float, v1: float):
    """EXACT (min, max) of ``cos(angle(center, P))`` over the spherical
    patch = central projection of the face-plane rect. With
    ``P = A + B u + C v`` and ``|P|^2 = 1 + u^2 + v^2``,
    ``g(u, v) = (a + b u + c v) / sqrt(1 + u^2 + v^2)`` has its
    extremes at rect corners, edge critical points
    (``u* = b (1+v^2) / (a + c v)`` and the v-analogue) or the interior
    critical point ``(b/a, c/a)`` — the cap center's projection onto
    the face plane. All candidates evaluate in closed form
    (brute-validated in tests)."""
    import math

    A, B, C = _FACE_ABC[face]
    a = sum(x * y for x, y in zip(cvec, A))
    b = sum(x * y for x, y in zip(cvec, B))
    c = sum(x * y for x, y in zip(cvec, C))
    cands = [(u, v) for u in (u0, u1) for v in (v0, v1)]
    for v in (v0, v1):
        al = a + c * v
        if abs(al) > 1e-30:
            us = b * (1 + v * v) / al
            if u0 <= us <= u1:
                cands.append((us, v))
    for u in (u0, u1):
        al = a + b * u
        if abs(al) > 1e-30:
            vs = c * (1 + u * u) / al
            if v0 <= vs <= v1:
                cands.append((u, vs))
    if abs(a) > 1e-30:
        ui, vi = b / a, c / a
        if u0 <= ui <= u1 and v0 <= vi <= v1:
            cands.append((ui, vi))
    vals = [
        (a + b * u + c * v) / math.sqrt(1.0 + u * u + v * v) for u, v in cands
    ]
    return min(vals), max(vals)


def s2_ranges_for_cap(
    lon: float,
    lat: float,
    radius_m: float,
    *,
    max_level: int = 12,
    max_ranges: int = 64,
) -> list[tuple[int, int]]:
    """Cover a spherical cap (all points within ``radius_m`` great-
    circle meters of lon/lat) with contiguous S2-format id ranges —
    the within-distance prefilter that works identically at the
    equator, at the poles and across the antimeridian (where the
    planar grid's latitude-adaptive blocking needs special cases).
    Same recursion and guarantees as :func:`s2_ranges_for_bbox`:
    certainly-inside cells emit, certainly-outside drop, straddlers
    recurse then over-scan — never loss. Callers AND the exact
    haversine test on top."""
    import math

    if radius_m < 0:
        raise ValueError(f"radius_m must be >= 0, got {radius_m}")
    if not isinstance(max_level, int) or not 0 <= max_level <= S2_MAX_LEVEL:
        raise ValueError(f"max_level must be in [0, {S2_MAX_LEVEL}], got {max_level!r}")
    ang = radius_m / _EARTH_R
    if ang >= math.pi:
        # whole sphere: every face's full range
        return _cover_region(lambda *a: "in", 0, max_ranges)
    cos_r = math.cos(ang)
    phi, theta = math.radians(lat), math.radians(lon)
    cvec = (
        math.cos(phi) * math.cos(theta),
        math.cos(phi) * math.sin(theta),
        math.sin(phi),
    )

    def classify(face, u0, u1, v0, v1):
        gmin, gmax = _cap_cos_extremes(face, cvec, u0, u1, v0, v1)
        # cos is decreasing in angle: gmax < cos_r means even the
        # closest point is outside the cap
        if gmax < cos_r - _EPS:
            return "out"
        if gmin >= cos_r - _EPS:
            return "in"
        return "split"

    return _cover_region(classify, max_level, max_ranges)


def s2_cap_predicate(
    cell: Column,
    lon: float,
    lat: float,
    radius_m: float,
    *,
    max_level: int = 12,
    max_ranges: int = 64,
) -> Column:
    """Catalyst predicate selecting the cap's S2 cover ranges (see
    :func:`s2_bbox_predicate` — same pushdown and over-scan notes)."""
    ranges = s2_ranges_for_cap(
        lon, lat, radius_m, max_level=max_level, max_ranges=max_ranges
    )
    if not ranges:
        return F.lit(False)
    pred = cell.between(ranges[0][0], ranges[0][1])
    for lo, hi in ranges[1:]:
        pred = pred | cell.between(lo, hi)
    return pred


def s2_bbox_predicate(
    cell: Column,
    lon0: float,
    lat0: float,
    lon1: float,
    lat1: float,
    *,
    max_level: int = 12,
    max_ranges: int = 64,
) -> Column:
    """Catalyst predicate selecting the bbox's S2 cover ranges —
    ``cell BETWEEN lo AND hi OR ...`` — which parquet min/max stats on
    an s2-clustered layout prune server-side. Callers AND the exact
    lon/lat test on top (the cover over-scans at straddling cells)."""
    ranges = s2_ranges_for_bbox(
        lon0, lat0, lon1, lat1, max_level=max_level, max_ranges=max_ranges
    )
    if not ranges:
        return F.lit(False)
    pred = cell.between(ranges[0][0], ranges[0][1])
    for lo, hi in ranges[1:]:
        pred = pred | cell.between(lo, hi)
    return pred
