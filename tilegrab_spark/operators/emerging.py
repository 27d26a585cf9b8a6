"""Space-time trend statistics — Mann-Kendall / Sen's slope per key,
and emerging hot-spot analysis over a (cell, time-bucket) cube.

spatialstats.py answers "where is the surface clustered *now*";
the monitoring question over N crawls/buckets is "where is clustering
*emerging*" — the ESRI space-time-cube shape: per-bucket Getis-Ord Gi*
in space, then a Mann-Kendall monotone-trend test on each cell's gi_z
time series, then a category from (how often hot, hot latest, trend).

Mann-Kendall here is ENTIRELY pure Catalyst: each key's series is
collected into one bounded array (time buckets — dozens to a few
hundred, never data-sized) and S / tie-corrected variance / Sen's
slope are nested higher-order array expressions (aggregate/filter/
transform), whole-stage-codegen'd, zero Python, zero joins beyond the
one groupBy exchange. The O(n²)-per-key pair scan lives INSIDE the
expression over an epoch-count-bounded array, so it costs microseconds
per cell and nothing shuffles but the series itself. Deterministic and
exactly SQL-expressible — tests/test_emerging.py re-derives S, the tie
term, the variance, z, and Sen's slope in DuckDB from the same rows.

Definitions (Mann 1945, Kendall 1975, Sen 1968; Hirsch's tie form):

- ``S = Σ_{t_i < t_j} sign(v_j - v_i)`` — pairs with EQUAL time values
  are excluded (contract: one row per (key, t); duplicates don't break
  the statistic, they just contribute no pairs against each other);
- ``var_S = [n(n-1)(2n+5) - Σ_g t_g(t_g-1)(2t_g+5)] / 18`` with ``t_g``
  the per-distinct-value tie counts;
- ``mk_z = (S-1)/√var_S`` for S>0, ``(S+1)/√var_S`` for S<0, 0 at S=0;
  null when var_S = 0 (all values tied) or n < 2;
- ``trend`` label at the 95% cut: increasing / decreasing / ns;
- ``sens_slope`` = median of the pairwise slopes
  ``(v_j - v_i)/(t_j - t_i)`` over the same ordered pairs (even counts
  average the two middles) — the robust magnitude companion to the
  sign-only test.

``emerging_hotspots`` plan shape: one adjacency self-join on packed
cell keys (shared across ALL buckets — the lattice doesn't change),
one per-bucket lag aggregation, a broadcast of the n_buckets-row
moments frame, then the Mann-Kendall groupBy — every stage bucket- or
edge-sized, pure Catalyst end to end. Cube contract (ESRI's): the
input carries a row for EVERY (cell, bucket) in the analysis extent —
fill absent counts with 0 upstream (a cell missing from some buckets
would otherwise bias both the per-bucket moments and its own series).

Categories (documented simplification of the ESRI taxonomy — the full
one needs consecutive-run bookkeeping; these rules are closed-form
over (hot_frac, latest_hot, trend)):

- ``new``            — hot in the latest bucket, hot in <50% of all
  buckets, trend not decreasing;
- ``intensifying``   — hot in ≥50% of buckets, increasing gi_z trend;
- ``diminishing``    — hot in ≥50% of buckets, decreasing gi_z trend;
- ``persistent``     — hot in ≥90% of buckets, no significant trend;
- ``sporadic``       — hot somewhere (incl. a latest-bucket hot with a
  decreasing trend) but none of the above;
- ``none``           — never hot.

The reference has no analytics surface at all; this completes the
engine's spatial-statistics suite with the temporal axis, the vector
sibling of operators/timeseries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from tilegrab_spark.operators.dissolve import adjacency_edges

__all__ = ["mann_kendall", "emerging_hotspots"]


def _mk_cols(arr: Column):
    """Mann-Kendall S / tie term / Sen's slope as pure array
    expressions over ``arr`` = sorted array<struct<t:double,v:double>>.
    Returns (n, s, tie_term, sens_slope) Columns."""
    n = F.size(arr)
    # S: for each element, sign-sum against every STRICTLY LATER time
    s = F.aggregate(
        F.transform(
            arr,
            lambda x: F.aggregate(
                F.filter(arr, lambda y: y["t"] > x["t"]),
                F.lit(0).cast("long"),
                lambda acc, y: acc + F.signum(y["v"] - x["v"]).cast("long"),
            ),
        ),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    # tie term over per-distinct-value counts
    vals = F.transform(arr, lambda x: x["v"])
    tie = F.aggregate(
        F.transform(
            F.array_distinct(vals),
            lambda u: (
                lambda c: c * (c - 1) * (2 * c + 5)
            )(F.size(F.filter(vals, lambda v: v == u)).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    # Sen's slope: median of pairwise slopes over the same ordered pairs
    slopes = F.sort_array(
        F.flatten(
            F.transform(
                arr,
                lambda x: F.transform(
                    F.filter(arr, lambda y: y["t"] > x["t"]),
                    lambda y: (y["v"] - x["v"]) / (y["t"] - x["t"]),
                ),
            )
        )
    )
    m = F.size(slopes)
    mid = F.element_at(slopes, (m / 2 + 1).cast("int"))
    lo = F.element_at(slopes, (m / 2).cast("int"))
    sen = F.when(m == 0, F.lit(None).cast("double")).when(
        m % 2 == 1, mid
    ).otherwise((lo + mid) / 2.0)
    return n, s, tie, sen


def mann_kendall(
    df: DataFrame,
    *,
    key_cols,
    t_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key Mann-Kendall monotone-trend test + Sen's slope over a
    bounded time series (module docstring for the exact statistics).
    Output: key_cols + [n, s, var_s, mk_z, trend, sens_slope]. Null
    values/times are dropped before the test; n counts what remains."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    src = df.filter(F.col(t_col).isNotNull() & F.col(value_col).isNotNull())
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(t_col).cast("double").alias("t"),
                F.col(value_col).cast("double").alias("v"),
            )
        )
    )
    grouped = src.groupBy(*[F.col(c) for c in key_cols]).agg(arr.alias("_arr"))
    n, s, tie, sen = _mk_cols(F.col("_arr"))
    nL = n.cast("long")
    var_s = (
        (nL * (nL - 1) * (2 * nL + 5) - tie).cast("double") / F.lit(18.0)
    )
    sd = F.sqrt(var_s)
    z = (
        F.when((var_s <= 0) | (nL < 2), F.lit(None).cast("double"))
        .when(s > 0, (s - 1) / sd)
        .when(s < 0, (s + 1) / sd)
        .otherwise(F.lit(0.0))
    )
    trend = (
        F.when(z.isNull(), F.lit("ns"))
        .when(z >= 1.96, F.lit("increasing"))
        .when(z <= -1.96, F.lit("decreasing"))
        .otherwise(F.lit("ns"))
    )
    return grouped.select(
        *key_cols,
        nL.alias("n"),
        s.alias("s"),
        var_s.alias("var_s"),
        z.alias("mk_z"),
        trend.alias("trend"),
        sen.alias("sens_slope"),
    )


def emerging_hotspots(
    cube: DataFrame,
    value_col: str,
    *,
    t_col: str = "t_bucket",
    diagonal: bool = False,
) -> DataFrame:
    """Emerging hot-spot analysis over a dense (cell, bucket) cube
    keyed by ``z``/``x``/``y`` + ``t_col`` (module docstring for the
    plan shape, the cube contract, and the category rules). Output:
    one row per cell — [z, x, y, n_buckets, hot_frac, latest_hot,
    mk_z, trend, sens_slope, category]."""
    cells = cube.select("z", "x", "y").distinct()
    edges = adjacency_edges(cells, diagonal=diagonal)  # [cell_a, cell_b]
    both = edges.select(
        F.col("cell_a").alias("src"), F.col("cell_b").alias("dst")
    ).unionByName(
        edges.select(F.col("cell_b").alias("src"), F.col("cell_a").alias("dst"))
    )
    from tilegrab_spark.sources.images import cell_id_col

    vals = cube.select(
        cell_id_col("z", "x", "y").alias("cell"),
        F.col("z"),
        F.col("x"),
        F.col("y"),
        F.col(t_col).cast("double").alias("t"),
        F.col(value_col).cast("double").alias("v"),
    )
    # per-(bucket, cell) spatial lag: one keyed join per direction-
    # doubled edge list, bounded by edges x buckets
    nbr = both.join(vals.select("cell", "t", "v"), both.src == F.col("cell")).select(
        F.col("dst").alias("cell"), "t", "v"
    )
    lag = nbr.groupBy("cell", "t").agg(
        F.count("*").alias("w"), F.sum("v").alias("lag")
    )
    lagged = vals.join(lag, ["cell", "t"], "left").fillna(
        {"w": 0, "lag": 0.0}
    )
    # per-bucket global moments (n_buckets rows, broadcast back)
    mom = vals.groupBy("t").agg(
        F.count("*").cast("double").alias("nb"),
        F.sum("v").alias("sx"),
        F.sum(F.col("v") * F.col("v")).alias("sxx"),
    )
    g = lagged.join(F.broadcast(mom), "t")
    # Gi* (star: self-included) with per-bucket moments — the same
    # closed form as spatialstats.gi_scores
    nb = F.col("nb")
    wsum = (F.col("w") + 1).cast("double")
    nbr_sum = F.col("lag") + F.col("v")
    mean = F.col("sx") / nb
    var = F.col("sxx") / nb - mean * mean
    denom_inner = (nb * wsum - wsum * wsum) / (nb - 1.0)
    defined = (var > 0) & (denom_inner > 0) & (nb > 1.0)
    gi = (nbr_sum - mean * wsum) / (F.sqrt(var) * F.sqrt(denom_inner))
    g = g.select(
        "cell",
        "z",
        "x",
        "y",
        "t",
        F.when(defined, gi).otherwise(F.lit(None).cast("double")).alias("gi_z"),
    )
    hot = (F.col("gi_z") >= 1.96).cast("int")
    per_cell = g.groupBy("cell", "z", "x", "y").agg(
        F.count("*").alias("n_buckets"),
        F.avg(F.coalesce(hot, F.lit(0))).alias("hot_frac"),
        F.max_by(F.coalesce(hot, F.lit(0)), F.col("t")).alias("latest_hot"),
    )
    mk = mann_kendall(
        g.filter(F.col("gi_z").isNotNull()),
        key_cols=["cell"],
        t_col="t",
        value_col="gi_z",
    ).select("cell", "mk_z", "trend", "sens_slope")
    out = per_cell.join(mk, "cell", "left")
    latest_hot = F.col("latest_hot") == 1
    category = (
        F.when(F.col("hot_frac") == 0, F.lit("none"))
        .when(
            latest_hot
            & (F.col("hot_frac") < 0.5)
            & (F.coalesce(F.col("trend"), F.lit("ns")) != "decreasing"),
            F.lit("new"),
        )
        .when(
            (F.col("hot_frac") >= 0.5) & (F.col("trend") == "increasing"),
            F.lit("intensifying"),
        )
        .when(
            (F.col("hot_frac") >= 0.5) & (F.col("trend") == "decreasing"),
            F.lit("diminishing"),
        )
        .when(F.col("hot_frac") >= 0.9, F.lit("persistent"))
        .otherwise(F.lit("sporadic"))
    )
    return out.select(
        "z",
        "x",
        "y",
        "n_buckets",
        "hot_frac",
        "latest_hot",
        "mk_z",
        "trend",
        "sens_slope",
        category.alias("category"),
    )
