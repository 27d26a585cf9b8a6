"""Spatial autocorrelation statistics over tile-keyed values.

The reference selects and merges tiles but never ASKS anything of the
raster it assembles; the classic first questions a tile lake gets at
analysis time are "is this surface spatially clustered?" (global
Moran's I), "where?" (local Moran / LISA), and "which cells are
hot/cold spots?" (Getis-Ord Gi*). All three are neighbor-weighted
moment statistics — on the XYZ grid the spatial-weights matrix is just
tile adjacency, so they reduce to the SAME blocked self-equi-join on
packed cell keys the engine already uses for dissolve
(``adjacency_edges``, dissolve.py) plus closed-form column arithmetic.

No geometry library, no matrix, no driver loop:

1. **edges** — one forward-probe self-join per direction (rook 2,
   queen 4), each undirected pair emitted once (dissolve.py);
2. **degrees / spatial lag** — the edge list exploded to both
   directions, one groupBy(cell): ``w_i = deg_i``,
   ``lag_i = SUM(neighbor values)``;
3. **global moments** — one aggregate over the value column
   (n, SUM x, SUM x^2) plus one aggregate over the edge list
   (E, SUM va*vb, SUM va+vb); every statistic below is a closed-form
   combination of those scalars, attached via a broadcast of the
   single-row moments frame.

With binary symmetric weights the Moran constants collapse to
``S0 = 2E``, ``S1 = 4E``, ``S2 = 4 * SUM(deg_i^2)``, and the
cross-product term over ordered pairs is twice the undirected-edge sum
— so the whole statistic needs exactly the aggregates above.

Scale shape: the neighbor join and the two tiny aggregations — the
same two-shuffle profile as dissolve, all on packed int64 keys, pure
Catalyst end to end (whole-stage codegen, no Python). Deterministic,
so every operator here is exactly SQL-oracle-able; the pytest oracle
re-derives all three statistics in DuckDB from the same rows
(tests/test_spatialstats.py).

Variance/z-score for global Moran's I uses the NORMALITY assumption
(the standard first report); Gi* uses the usual per-cell z formulation
(Ord & Getis 1995), in the starred (self-included) and plain variants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from tilegrab_spark.operators.dissolve import adjacency_edges
from tilegrab_spark.sources.images import cell_id_col

__all__ = ["spatial_lag", "morans_i", "local_morans", "getis_ord_gi", "gi_scores"]


def _values(tiles: DataFrame, value_col: str) -> DataFrame:
    """(z, x, y, cell, v) frame. One row per tile is the caller's
    contract (a tile raster); duplicate keys would double-count edges
    exactly as they would in the SQL oracle."""
    return tiles.select(
        "z", "x", "y", F.col(value_col).cast("double").alias("v")
    ).withColumn("cell", cell_id_col("z", "x", "y"))


def _directed_edges(tiles: DataFrame, diagonal: bool) -> DataFrame:
    """Both orientations of the undirected adjacency pairs:
    (cell, nbr) — the row set behind degrees and spatial lags."""
    e = adjacency_edges(tiles, diagonal=diagonal)
    return e.select(
        F.col("cell_a").alias("cell"), F.col("cell_b").alias("nbr")
    ).unionByName(e.select(F.col("cell_b").alias("cell"), F.col("cell_a").alias("nbr")))


def spatial_lag(tiles: DataFrame, value_col: str, *, diagonal: bool = False) -> DataFrame:
    """Per-cell neighbor aggregates: ``w`` (neighbor count) and ``lag``
    (sum of neighbor values; 0 for isolated cells). The building block
    of the local statistics, exposed because a neighborhood-sum pass is
    also the cheapest smoother a tile raster gets."""
    vals = _values(tiles, value_col)
    nbr_vals = _directed_edges(tiles, diagonal).join(
        vals.select(F.col("cell").alias("nbr"), F.col("v").alias("nv")), "nbr"
    )
    sums = nbr_vals.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("w"),
        F.sum("nv").alias("lag"),
    )
    return (
        vals.join(sums, "cell", "left")
        .withColumn("w", F.coalesce("w", F.lit(0).cast("long")))
        .withColumn("lag", F.coalesce("lag", F.lit(0.0)))
        .select("z", "x", "y", "cell", "v", "w", "lag")
    )


def _moments(vals: DataFrame) -> DataFrame:
    """Single-row global moments frame (n, sx, sxx) — broadcast onto
    per-cell frames; every global constant derives from it."""
    return vals.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("sx"),
        F.sum(F.col("v") * F.col("v")).alias("sxx"),
    )


def morans_i(tiles: DataFrame, value_col: str, *, diagonal: bool = False) -> DataFrame:
    """Global Moran's I with binary contiguity weights (rook by
    default, queen with ``diagonal=True``).

    Returns ONE row: ``[n, n_edges, s0, s1, s2, morans_i, expected_i,
    variance_i, z_score, gearys_c]``. ``variance_i``/``z_score`` are
    under the normality assumption; the statistic columns are NULL when
    undefined (no edges, constant surface, or n < 2) rather than NaN.

    Plan: the adjacency self-join, then two scalar aggregations (values
    and edges) and a degree aggregation, combined with closed-form
    arithmetic on a one-row frame — nothing here scales with anything
    but the tile count.
    """
    vals = _values(tiles, value_col)
    edges = adjacency_edges(tiles, diagonal=diagonal)
    va = vals.select(F.col("cell").alias("cell_a"), F.col("v").alias("va"))
    vb = vals.select(F.col("cell").alias("cell_b"), F.col("v").alias("vb"))
    edge_moments = (
        edges.join(va, "cell_a")
        .join(vb, "cell_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.coalesce(F.sum(F.col("va") * F.col("vb")), F.lit(0.0)).alias("sab"),
            F.coalesce(F.sum(F.col("va") + F.col("vb")), F.lit(0.0)).alias("sa_plus_b"),
            F.coalesce(
                F.sum((F.col("va") - F.col("vb")) * (F.col("va") - F.col("vb"))),
                F.lit(0.0),
            ).alias("sdiff2"),
        )
    )
    deg2 = (
        _directed_edges(tiles, diagonal)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("double").alias("deg"))
        .agg(F.coalesce(F.sum(F.col("deg") * F.col("deg")), F.lit(0.0)).alias("sum_deg2"))
    )
    row = _moments(vals).crossJoin(F.broadcast(edge_moments)).crossJoin(F.broadcast(deg2))

    n = F.col("n").cast("double")
    xbar = F.col("sx") / n
    # m2 = SUM (x - xbar)^2 ; cross = SUM over undirected edges of
    # (va - xbar)(vb - xbar), expanded so no second pass is needed.
    m2 = F.col("sxx") - n * xbar * xbar
    cross = F.col("sab") - xbar * F.col("sa_plus_b") + F.col("n_edges") * xbar * xbar
    s0 = F.lit(2.0) * F.col("n_edges")
    s1 = F.lit(4.0) * F.col("n_edges")
    s2 = F.lit(4.0) * F.col("sum_deg2")
    defined = (F.col("n_edges") > 0) & (m2 > 0) & (F.col("n") > 1)

    i_stat = (n / s0) * (F.lit(2.0) * cross) / m2
    e_i = F.lit(-1.0) / (n - 1.0)
    var_i = (n * n * s1 - n * s2 + F.lit(3.0) * s0 * s0) / (
        (n * n - 1.0) * s0 * s0
    ) - e_i * e_i

    def _guard(c: Column) -> Column:
        return F.when(defined, c).otherwise(F.lit(None).cast("double"))

    return row.select(
        F.col("n"),
        F.col("n_edges"),
        s0.cast("long").alias("s0"),
        s1.cast("long").alias("s1"),
        s2.cast("long").alias("s2"),
        _guard(i_stat).alias("morans_i"),
        _guard(e_i).alias("expected_i"),
        _guard(var_i).alias("variance_i"),
        _guard((i_stat - e_i) / F.sqrt(var_i)).alias("z_score"),
        # Geary's C — Moran's companion statistic (E[C]=1; C<1 positive
        # association, C>1 negative; more sensitive to local
        # heterogeneity). For symmetric binary weights the ordered-pair
        # squared-difference sum is twice the undirected edge sum, so:
        # C = (n-1) * SUM_edges (va-vb)^2 / (S0 * m2).
        _guard((n - 1.0) * F.col("sdiff2") / (s0 * m2)).alias("gearys_c"),
    )


def local_morans(tiles: DataFrame, value_col: str, *, diagonal: bool = False) -> DataFrame:
    """Local Moran's I (LISA): per cell,
    ``I_i = (x_i - xbar) / (m2 / n) * SUM_j w_ij (x_j - xbar)`` plus the
    cluster ``quadrant`` label — HH/LL (positive association around a
    high/low value), HL/LH (outliers), NULL for isolated cells or a
    constant surface. High positive ``local_i`` = part of a cluster,
    negative = spatial outlier; the global I is the w-weighted mean of
    these."""
    lagged = spatial_lag(tiles, value_col, diagonal=diagonal)
    row = _moments(lagged.select("v"))
    out = lagged.crossJoin(F.broadcast(row))
    n = F.col("n").cast("double")
    xbar = F.col("sx") / n
    m2n = (F.col("sxx") - n * xbar * xbar) / n
    zi = F.col("v") - xbar
    # lag of centered values: SUM_j (x_j - xbar) = lag - w * xbar
    zlag = F.col("lag") - F.col("w") * xbar
    defined = (F.col("w") > 0) & (m2n > 0)
    quadrant = (
        F.when(~defined, F.lit(None).cast("string"))
        .when((zi >= 0) & (zlag >= 0), F.lit("HH"))
        .when((zi < 0) & (zlag < 0), F.lit("LL"))
        .when(zi >= 0, F.lit("HL"))
        .otherwise(F.lit("LH"))
    )
    return out.select(
        "z",
        "x",
        "y",
        "v",
        "w",
        "lag",
        F.when(defined, zi / m2n * zlag).otherwise(F.lit(None).cast("double")).alias("local_i"),
        quadrant.alias("quadrant"),
    )


def getis_ord_gi(
    tiles: DataFrame,
    value_col: str,
    *,
    diagonal: bool = False,
    star: bool = True,
) -> DataFrame:
    """Getis-Ord Gi*/Gi hot-spot z-scores per cell, plus a ``spot``
    label at the conventional confidence cuts (|z| >= 1.645 / 1.96 /
    2.576 -> ``hot90``..``hot99`` / ``cold90``..``cold99``, else
    ``ns``).

    ``star=True`` (Gi*) includes the cell itself in its own
    neighborhood (weights ``W_i = deg_i + 1``) with global moments over
    all n cells; ``star=False`` (plain Gi) excludes it, and the mean /
    variance are recomputed PER CELL over the remaining n-1 values —
    still closed-form off the same one-row moments frame, no extra
    pass."""
    lagged = spatial_lag(tiles, value_col, diagonal=diagonal)
    return gi_scores(lagged, star=star).select(
        "z", "x", "y", "v", "w", "gi_z", "spot"
    )


def gi_scores(lagged: DataFrame, *, star: bool = True) -> DataFrame:
    """Gi*/Gi z-scores from ANY lag frame — the lattice-agnostic core
    (the tile grid passes ``spatial_lag`` output; the hex lattice
    passes ``operators.hexbin.hex_hotspots``'s). Contract: one row per
    cell with ``v`` (value), ``w`` (neighbor count), ``lag`` (neighbor
    value sum); every other column passes through (``n``/``sx``/``sxx``
    are reserved for the moments frame). Adds ``gi_z`` + ``spot``; the
    only new plan node is the broadcast of the one-row global moments
    frame."""
    row = _moments(lagged.select("v"))
    out = lagged.crossJoin(F.broadcast(row))
    n_all = F.col("n").cast("double")
    if star:
        n = n_all
        wsum = (F.col("w") + 1).cast("double")
        nbr_sum = F.col("lag") + F.col("v")
        mean = F.col("sx") / n
        var = F.col("sxx") / n - mean * mean
    else:
        n = n_all - 1.0
        wsum = F.col("w").cast("double")
        nbr_sum = F.col("lag")
        mean = (F.col("sx") - F.col("v")) / n
        var = (F.col("sxx") - F.col("v") * F.col("v")) / n - mean * mean
    denom_inner = (n * wsum - wsum * wsum) / (n - 1.0)
    defined = (var > 0) & (denom_inner > 0) & (n > 1.0)
    gi = (nbr_sum - mean * wsum) / (F.sqrt(var) * F.sqrt(denom_inner))
    gz = F.when(defined, gi).otherwise(F.lit(None).cast("double"))
    spot = (
        F.when(gz.isNull(), F.lit(None).cast("string"))
        .when(gz >= 2.576, F.lit("hot99"))
        .when(gz >= 1.96, F.lit("hot95"))
        .when(gz >= 1.645, F.lit("hot90"))
        .when(gz <= -2.576, F.lit("cold99"))
        .when(gz <= -1.96, F.lit("cold95"))
        .when(gz <= -1.645, F.lit("cold90"))
        .otherwise(F.lit("ns"))
    )
    keep = [c for c in lagged.columns]
    return out.select(*keep, gz.alias("gi_z"), spot.alias("spot"))
