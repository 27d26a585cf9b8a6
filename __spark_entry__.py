"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship spatial aggregation on sf0.001.
``queries()``    — one entry per implemented operator (SURVEY.md §2 +
                   training-data ops), each (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents for every
                   SQL-expressible query (same column names/aliases).

Float determinism policy (the driver value-hashes results): sums go
through DECIMAL casts (order-independent, bit-identical across engines);
trig-derived doubles are only ever *floored into integers* (tile
indices) with the reference's EPSILON nudge, or kept out of oracle-
checked outputs (ranks/ids instead of raw distances).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dsum(c, p: int = 4):
    return F.sum(c.cast(f"decimal(25,{p})")).cast("double")


# T.geojson 4326 bbox (reference golden, FIXTURES.md §4.1) — constants in
# both engines for the tile-enumeration queries.
T_BBOX = (80.59111369868114, 7.253238366601672, 80.60679900129578, 7.267703227740267)
EPS = 1e-14
LL_EPS = 1e-11


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spatial cell aggregation over sf0.001 — derive lon/lat
    from lineitem keys, Catalyst cell-encode at z=8 (P1), count + extent
    stats per cell (A1/A3), rank dense cells (window)."""
    from tilegrab_spark.functions.cells import cell_encode_cols, cell_id_col

    li = _t(spark, "/root/testdata/sf0.001", "lineitem")
    lon = (F.pmod(F.col("l_orderkey") * 7, F.lit(360000)) / 1000.0) - 180.0
    lat = (F.pmod(F.col("l_partkey") * 13, F.lit(170000)) / 1000.0) - 85.0
    x, y = cell_encode_cols(lon, lat, 8)
    cells = li.withColumn("x", x).withColumn("y", y).withColumn("z", F.lit(8))
    agg = (
        cells.groupBy("z", "x", "y")
        .agg(
            F.count("*").alias("n_rows"),
            _dsum(F.col("l_extendedprice")).alias("sum_price"),
            F.min("l_orderkey").alias("min_order"),
            F.max("l_orderkey").alias("max_order"),
        )
        .withColumn("cell_id", cell_id_col("z", "x", "y"))
    )
    w = Window.orderBy(F.desc("n_rows"), F.col("cell_id"))
    return agg.withColumn("density_rank", F.row_number().over(w))


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def _q1_pricing(spark, sf):
    li = _t(spark, sf, "lineitem")
    keep = li.filter(F.col("l_shipdate") <= "1998-09-02")
    return (
        keep.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(25,6))) AS DOUBLE) AS sum_charge,
  COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


def _equi_join(spark, sf):
    li, part = _t(spark, sf, "lineitem"), _t(spark, sf, "part")
    return (
        li.join(F.broadcast(part.filter(F.col("p_size") < 10)), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "l_linenumber", "p_partkey", "p_brand", "l_quantity")
    )


_EQUI_SQL = """
SELECT l_orderkey, l_linenumber, p_partkey, p_brand, l_quantity
FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_size < 10
"""


def _q3_shipping(spark, sf):
    """TPC-H Q3 shape: 3-way join + grouped decimal aggregate + top-k."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.col("l_orderkey"))
        .limit(20)
    )


_Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 20
"""


def _semi_join(spark, sf):
    c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    big = o.filter(F.col("o_totalprice") > 100000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
"""


def _anti_join(spark, sf):
    # customers with NO high-value order — non-trivial on the driver
    # corpus (plain customer-without-orders is 0 rows at every sf)
    c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    big = o.filter(F.col("o_totalprice") > 300000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


_ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
"""


def _extent_agg(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.min("l_orderkey").alias("min_order"),
            F.max("l_orderkey").alias("max_order"),
            F.count("*").alias("n"),
        )
    )


_EXTENT_SQL = """
SELECT l_returnflag, MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
       MIN(l_orderkey) AS min_order, MAX(l_orderkey) AS max_order, COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def _limit_set_except(spark, sf):
    """L1 (safe_limit in deterministic generation order) and SURVEY
    §2.8 set algebra (EXCEPT ALL) evidenced in ONE contract row (driver
    window economy): ordered top-10 of orders UNION-tagged with the
    part-table set difference."""
    o = _t(spark, sf, "orders")
    top = (
        o.orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(10)
        .select(
            F.col("o_orderkey").alias("key"),
            F.col("o_totalprice").alias("val"),
            F.lit("limit").alias("variant"),
        )
    )
    p = _t(spark, sf, "part")
    small = p.filter(F.col("p_size") < 25).select("p_partkey")
    b13 = p.filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    ex = small.exceptAll(b13).select(
        F.col("p_partkey").alias("key"),
        F.lit(0.0).alias("val"),
        F.lit("except").alias("variant"),
    )
    return top.unionByName(ex)


_LIMIT_SET_SQL = """
SELECT o_orderkey AS key, o_totalprice AS val, 'limit' AS variant FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""
_LIMIT_SET_SQL = f"""
SELECT * FROM ({_LIMIT_SET_SQL})
UNION ALL
SELECT key, 0.0 AS val, 'except' AS variant FROM (
  SELECT p_partkey AS key FROM part WHERE p_size < 25
  EXCEPT ALL
  SELECT p_partkey AS key FROM part WHERE p_brand = 'Brand#13')
"""


def _window_topn(spark, sf):
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


_WINDOW_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders) WHERE rnk <= 3
"""


def _regexp_proj(spark, sf):
    d = _t(spark, sf, "documents")
    return (
        d.withColumn("src_num", F.regexp_extract("source", r"src(\d+)", 1).cast("int"))
        .groupBy("src_num")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


_REGEXP_SQL = r"""
SELECT CAST(regexp_extract(source, 'src(\d+)', 1) AS INT) AS src_num,
       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
"""


def _url_render(spark, sf):
    o = _t(spark, sf, "orders")
    z = F.pmod(F.col("o_orderkey"), F.lit(20)).cast("int")
    x = F.pmod(F.col("o_custkey"), F.lit(1024)).cast("long")
    y = F.pmod(F.col("o_orderkey") * 3, F.lit(1024)).cast("long")
    return o.select(
        F.col("o_orderkey"),
        F.format_string("https://tile.openstreetmap.org/%d/%d/%d.png", z, x, y).alias("url"),
    )


_URL_SQL = """
SELECT o_orderkey,
  printf('https://tile.openstreetmap.org/%d/%d/%d.png',
         (o_orderkey % 20), (o_custkey % 1024), ((o_orderkey * 3) % 1024)) AS url
FROM orders
"""


def _status_routing(spark, sf):
    e = _t(spark, sf, "events")
    status = (
        F.when(F.col("value") >= 0.9, F.lit("SUCCESS"))
        .when(F.col("value") >= 0.5, F.lit("SKIP"))
        .when(F.col("value") >= 0.1, F.lit("EMPTY"))
        .otherwise(F.lit("FAILED"))
    )
    return (
        e.withColumn("status", status)
        .groupBy("event_type", "status")
        .agg(F.count("*").alias("n"))
    )


_STATUS_SQL = """
SELECT event_type,
  CASE WHEN value >= 0.9 THEN 'SUCCESS' WHEN value >= 0.5 THEN 'SKIP'
       WHEN value >= 0.1 THEN 'EMPTY' ELSE 'FAILED' END AS status,
  COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def _resume_anti(spark, sf):
    li = _t(spark, sf, "lineitem")
    committed = li.filter(F.pmod(F.col("l_orderkey"), F.lit(10)) < 3).select(
        "l_orderkey", "l_linenumber"
    )
    return li.join(
        committed, on=["l_orderkey", "l_linenumber"], how="left_anti"
    ).select("l_orderkey", "l_linenumber", "l_quantity")


_RESUME_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE (l_orderkey % 10) >= 3
"""


def _snapshot_time_travel(spark, sf):
    """Iceberg-style snapshot table (plans/snapshots.py): commit the
    even-doc_id half, then write a BATCH OF DUPLICATE ROWS **without**
    committing its snapshot (a killed job), then commit the odd half.
    Reads at snapshot 1 and at the head are rolled up per version — the
    oracle can only match if (a) time travel returns exactly commit 1
    and (b) the uncommitted duplicates are invisible at every snapshot
    (they would inflate n_docs and chars_sum otherwise)."""
    import tempfile

    from tilegrab_spark.plans.snapshots import SnapshotTable

    docs = _t(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="tg_snap_"))
    t.append(docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0))
    # crashed writer: data files land, snapshot commit never happens
    t._write_data(docs.filter(F.pmod(F.col("doc_id"), F.lit(7)) == 0), ())
    t.append(docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1))

    def rollup(df, tag):
        return df.groupBy("lang").agg(
            F.lit(tag).alias("version"),
            F.count("*").alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
            F.sum("n_chars").alias("chars_sum"),
        ).select("version", "lang", "n_docs", "id_sum", "chars_sum")

    return rollup(t.read(as_of=1), "v1").unionByName(rollup(t.read(), "head"))


_SNAPSHOT_SQL = """
SELECT * FROM (
  SELECT 'v1' AS version, lang, COUNT(*) AS n_docs,
         CAST(SUM(doc_id) AS BIGINT) AS id_sum, CAST(SUM(n_chars) AS BIGINT) AS chars_sum
  FROM documents WHERE doc_id % 2 = 0 GROUP BY lang
  UNION ALL
  SELECT 'head' AS version, lang, COUNT(*) AS n_docs,
         CAST(SUM(doc_id) AS BIGINT) AS id_sum, CAST(SUM(n_chars) AS BIGINT) AS chars_sum
  FROM documents GROUP BY lang
)
"""


# --- tile math (P1/F1/cell-id) with SQL oracles on the same formulas ---

def _tile_encode(spark, sf):
    """P1 lon/lat->tile encode AND the packed int64 cell id (formerly
    the separate cell_pack row) in ONE contract row: the pack runs over
    the encoded xtile/ytile, so one oracle pins both the Mercator
    formula and the z<<58|x<<29|y bit layout."""
    from tilegrab_spark.functions.cells import cell_encode_cols, cell_id_col

    li = _t(spark, sf, "lineitem")
    lon = (F.pmod(F.col("l_orderkey") * 7, F.lit(360000)) / 1000.0) - 180.0
    lat = (F.pmod(F.col("l_partkey") * 13, F.lit(170000)) / 1000.0) - 85.0
    x, y = cell_encode_cols(lon, lat, 12)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        x.alias("xtile"),
        y.alias("ytile"),
        cell_id_col(F.lit(12), x, y).alias("cell_id"),
    )


_ENCODE_SQL = f"""
WITH pts AS (
  SELECT l_orderkey, l_linenumber,
    ((l_orderkey * 7) % 360000) / 1000.0 - 180.0 AS lon,
    ((l_partkey * 13) % 170000) / 1000.0 - 85.0 AS lat
  FROM lineitem),
enc AS (
  SELECT l_orderkey, l_linenumber,
    lon / 360.0 + 0.5 AS xf,
    0.5 - 0.25 * ln((1.0 + sin(radians(lat))) / (1.0 - sin(radians(lat)))) / pi() AS yf
  FROM pts)
SELECT l_orderkey, l_linenumber, xtile, ytile,
  (12::BIGINT << 58) | (xtile << 29) | ytile AS cell_id
FROM (
  SELECT l_orderkey, l_linenumber,
    CASE WHEN xf <= 0 THEN 0 WHEN xf >= 1 THEN 4095
         ELSE CAST(floor((xf + {EPS}) * 4096.0) AS BIGINT) END AS xtile,
    CASE WHEN yf <= 0 THEN 0 WHEN yf >= 1 THEN 4095
         ELSE CAST(floor((yf + {EPS}) * 4096.0) AS BIGINT) END AS ytile
  FROM enc)
"""


def _decontaminate_hits(spark, sf):
    """Benchmark decontamination (operators/decontaminate.py): the eval
    set is a deterministic slice of the corpus itself (doc_id % 97 == 0)
    so every eval doc must at minimum flag its own corpus copy; n=13 is
    the GPT-3/PaLM convention, and eval docs shorter than 13 tokens
    exercise the whole-sequence-gram rule. Eval side broadcast; the
    corpus is never shuffled (the one exchange carries hit rows only)."""
    from tilegrab_spark.operators.decontaminate import contamination_hits

    d = _t(spark, sf, "documents")
    ev = d.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    return contamination_hits(d, ev, n=13, min_hits=1)


_DECON_SQL = """
WITH eval_v AS (
  SELECT doc_id AS eval_id, text FROM documents WHERE doc_id % 97 = 0
),
ks AS (
  SELECT list(DISTINCT least(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 13)) AS klist
  FROM eval_v
),
dt AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents
),
dg AS (
  SELECT DISTINCT doc_id,
    unnest(list_distinct(flatten(
      [[array_to_string(toks[i : i + k - 1], ' ')
        for i in range(1, greatest(len(toks) - k + 1, 1) + 1)]
       for k in (SELECT klist FROM ks)]
    ))) AS gram
  FROM dt
),
et AS (
  SELECT eval_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM eval_v
),
eg AS (
  SELECT DISTINCT eval_id,
    unnest([array_to_string(toks[i : i + least(len(toks), 13) - 1], ' ')
            for i in range(1, greatest(len(toks) - least(len(toks), 13) + 1, 1) + 1)]) AS gram
  FROM et
),
hits AS (
  SELECT d.doc_id, d.gram, e.eval_id
  FROM (SELECT * FROM dg WHERE length(gram) > 0) d
  JOIN (SELECT * FROM eg WHERE length(gram) > 0) e USING (gram)
)
SELECT doc_id,
       count(DISTINCT gram) AS n_hits,
       count(DISTINCT eval_id) AS n_eval_docs
FROM hits GROUP BY doc_id
HAVING count(DISTINCT gram) >= 1
"""

# Exact binary-fraction weights (0.5 + 0.25 + 0.25 == 1.0 in ANY summation
# order) and a budget small enough that NO language exhausts at any test
# SF: the water-fill solver then terminates in one proportional round,
# which is what makes the per-language keep rate — and therefore the
# int(rate * 2^60) hash threshold — bit-identically re-derivable in SQL.
_MIX_WEIGHTS = {"en": 0.5, "de": 0.25, "fr": 0.25}
_MIX_BUDGET = 40_000


def _mixture_sample(spark, sf):
    """Token-budget mixture sampling (operators/sampling.py::
    sample_mixture): ~40k chars at en:de:fr = 2:1:1, weighted by
    n_chars. Deterministic md5 hash-threshold keep — the oracle
    re-derives totals, rates and thresholds independently (the capped /
    water-filling path is pinned by tests/test_mixture.py)."""
    from tilegrab_spark.operators.sampling import sample_mixture

    d = _t(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    return sample_mixture(
        d,
        id_col="doc_id",
        group_col="lang",
        token_col="n_chars",
        weights=_MIX_WEIGHTS,
        budget_tokens=_MIX_BUDGET,
        salt="mix",
    )


def _mixture_sql() -> str:
    space = 1 << 60
    vals = ", ".join(f"('{k}', {v!r})" for k, v in sorted(_MIX_WEIGHTS.items()))
    return f"""
WITH w(lang, wt) AS (VALUES {vals}),
tot AS (
  SELECT lang, CAST(SUM(n_chars) AS DOUBLE) AS total
  FROM documents GROUP BY lang
),
act AS (
  SELECT t.lang, w.wt, t.total FROM tot t JOIN w ON t.lang = w.lang
  WHERE t.total > 0
),
ws AS (SELECT SUM(wt) AS wsum FROM act),
thr AS (
  SELECT a.lang,
         CAST(floor((({_MIX_BUDGET}.0 * a.wt / ws.wsum) / a.total) * {float(space)!r}) AS BIGINT) AS cut
  FROM act a CROSS JOIN ws
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN thr ON d.lang = thr.lang
WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || 'mix'), 1, 15))::BIGINT < thr.cut
"""


def _tile_interop(spark, sf):
    """Interop addressings (functions/interop.py): quadkey, TMS row,
    Morton/Z-order key + parent, and the quadkey->x/y round-trip — all
    pure Catalyst folds, re-derived in the oracle with DuckDB bit ops
    over a fixed bit series."""
    from tilegrab_spark.functions.interop import (
        morton_key_col,
        morton_parent_col,
        quadkey_col,
        quadkey_decode_cols,
        tms_y_col,
    )

    from tilegrab_spark.functions.interop import hilbert_key_col
    from tilegrab_spark.functions.s2cells import s2_cell_col, s2_parent_col

    li = _t(spark, sf, "lineitem")
    d = li.select(
        "l_orderkey",
        "l_linenumber",
        F.pmod(F.col("l_orderkey"), F.lit(4096)).alias("x"),
        F.pmod(F.col("l_partkey"), F.lit(4096)).alias("y"),
    ).select(
        "l_orderkey",
        "l_linenumber",
        "x",
        "y",
        quadkey_col(F.col("x"), F.col("y"), 12).alias("quadkey"),
        morton_key_col(F.col("x"), F.col("y"), 12).alias("morton_key"),
        tms_y_col(F.col("y"), 12).alias("tms_y"),
        # bin-center lon/lat keeps every point well away from cell
        # boundaries (level 6 cells span ~0.35 in st), so the two
        # engines' trig can never disagree on the grid coordinate
        (F.lit(-180.0) + (F.col("x") + 0.5) * (360.0 / 4096.0)).alias("lon"),
        (F.lit(-90.0) + (F.col("y") + 0.5) * (180.0 / 4096.0)).alias("lat"),
    )
    _, xb, yb = quadkey_decode_cols(F.col("quadkey"))
    s2 = s2_cell_col(F.col("lon"), F.col("lat"), 6)
    return d.select(
        "l_orderkey",
        "l_linenumber",
        "quadkey",
        "morton_key",
        "tms_y",
        xb.alias("x_back"),
        yb.alias("y_back"),
        morton_parent_col(F.col("morton_key")).alias("parent_key"),
        hilbert_key_col(F.col("x"), F.col("y"), 12).alias("hilbert_key"),
        s2.alias("s2_cell"),
        s2_parent_col(s2, 2).alias("s2_parent"),
    )


def _hilbert_sql_stages(prefix: str, src: str, xc: str, yc: str, zbits: int, n1: int) -> str:
    """Generate the Hilbert fold as ``zbits`` unrolled CTE stages (the
    same public xy2d walk functions/interop.py folds in Catalyst) —
    each stage consumes one bit and rotates the frame; DuckDB lateral
    alias resolution is sidestepped by giving every stage its own
    column names."""
    ctes = [f"{prefix}{zbits} AS (SELECT *, {xc} AS {prefix}x{zbits}, "
            f"{yc} AS {prefix}y{zbits}, CAST(0 AS BIGINT) AS {prefix}d{zbits} FROM {src})"]
    for i in range(zbits - 1, -1, -1):
        p = i + 1
        rx = f"(({prefix}x{p} >> {i}) & 1)"
        ry = f"(({prefix}y{p} >> {i}) & 1)"
        ctes.append(f"""{prefix}{i} AS (
  SELECT *,
    CASE WHEN {ry} = 1 THEN {prefix}x{p}
         WHEN {rx} = 1 THEN {n1} - {prefix}y{p}
         ELSE {prefix}y{p} END AS {prefix}x{i},
    CASE WHEN {ry} = 1 THEN {prefix}y{p}
         WHEN {rx} = 1 THEN {n1} - {prefix}x{p}
         ELSE {prefix}x{p} END AS {prefix}y{i},
    {prefix}d{p} * 4 + xor({rx} * 3, {ry}) AS {prefix}d{i}
  FROM {prefix}{p})""")
    return ",\n".join(ctes)


def _interop_sql() -> str:
    # Per-row unrolled bit math — (l_orderkey, l_linenumber) is NOT a
    # unique key in the synthetic lineitem, so a GROUP-BY formulation
    # would merge bits across duplicate keys. Fixed z=12; the Hilbert
    # and S2 folds re-derive as generated unrolled CTE stages, the S2
    # trig pipeline (sphere -> face -> quadratic ST -> grid) inline.
    digit = "(((x >> {i}) & 1) + 2 * ((y >> {i}) & 1))"
    quadkey = " || ".join(
        f"CAST({digit.format(i=i)} AS VARCHAR)" for i in range(11, -1, -1)
    )
    morton = " + ".join(f"{digit.format(i=i)} * {4**i}" for i in range(12))
    hilbert = _hilbert_sql_stages("h", "t", "x", "y", 12, 4095)
    s2fold = _hilbert_sql_stages("s", "s2ij", "si", "sj", 6, 63)
    # id packing at level 6: shift = 2*(28-6) = 44
    shift = 2 * (28 - 6)
    lsb, plsb = 1 << shift, 1 << (shift + 4)  # parent 2 levels up
    return f"""
WITH t AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_orderkey % 4096 AS BIGINT) AS x,
         CAST(l_partkey % 4096 AS BIGINT) AS y,
         -180.0 + (CAST(l_orderkey % 4096 AS BIGINT) + 0.5) * (360.0 / 4096.0) AS lon,
         -90.0 + (CAST(l_partkey % 4096 AS BIGINT) + 0.5) * (180.0 / 4096.0) AS lat
  FROM lineitem),
{hilbert},
s2xyz AS (
  SELECT *, cos(radians(lat)) * cos(radians(lon)) AS px,
            cos(radians(lat)) * sin(radians(lon)) AS py,
            sin(radians(lat)) AS pz
  FROM h0),
s2face AS (
  SELECT *,
    CASE WHEN abs(px) >= abs(py) AND abs(px) >= abs(pz)
           THEN CASE WHEN px > 0 THEN 0 ELSE 3 END
         WHEN abs(py) >= abs(px) AND abs(py) >= abs(pz)
           THEN CASE WHEN py > 0 THEN 1 ELSE 4 END
         ELSE CASE WHEN pz > 0 THEN 2 ELSE 5 END END AS face
  FROM s2xyz),
s2uv AS (
  SELECT *,
    CASE face WHEN 0 THEN py/px WHEN 1 THEN -px/py WHEN 2 THEN -px/pz
              WHEN 3 THEN pz/px WHEN 4 THEN pz/py ELSE -py/pz END AS su,
    CASE face WHEN 0 THEN pz/px WHEN 1 THEN pz/py WHEN 2 THEN -py/pz
              WHEN 3 THEN py/px WHEN 4 THEN -px/py ELSE -px/pz END AS sv
  FROM s2face),
s2ij AS (
  SELECT *,
    least(63, greatest(0, CAST(floor(
      (CASE WHEN su >= 0 THEN 0.5*sqrt(1+3*su) ELSE 1-0.5*sqrt(1-3*su) END) * 64
    ) AS BIGINT))) AS si,
    least(63, greatest(0, CAST(floor(
      (CASE WHEN sv >= 0 THEN 0.5*sqrt(1+3*sv) ELSE 1-0.5*sqrt(1-3*sv) END) * 64
    ) AS BIGINT))) AS sj
  FROM s2uv),
{s2fold}
SELECT l_orderkey, l_linenumber,
       {quadkey} AS quadkey,
       CAST({morton} AS BIGINT) AS morton_key,
       4095 - y AS tms_y, x AS x_back, y AS y_back,
       CAST({morton} AS BIGINT) >> 2 AS parent_key,
       hd0 AS hilbert_key,
       (CAST(face AS BIGINT) << 57) + (sd0 << {shift + 1}) + {lsb} AS s2_cell,
       (((CAST(face AS BIGINT) << 57) + (sd0 << {shift + 1}) + {lsb})
         & ~CAST({plsb - 1} AS BIGINT)) | CAST({plsb} AS BIGINT) AS s2_parent
FROM s0
"""


def _bbox_enum(spark, sf):
    """F1 bbox enumeration + the multi-resolution cover pair in ONE
    contract row (driver window economy), union-tagged by variant:

    - ``enum``: the original F1 generate-as-predicate enumeration of
      the T bbox at z=16;
    - ``compact``: compact_cover (operators/cover.py) of the SAME bbox
      enumerated at z=20 (~2,000 tiles — deep enough for 4 promotion
      levels) with ~1% deterministic holes punched via the md5
      sampling-hash contract — complete sibling quads collapse to
      parents down to z=16, hole-adjacent quads stay expanded;
    - ``uncompact``: the cover expanded back to z=20 — provably equal
      to the holey set iff the cover is exact, so the oracle (which
      compacts and expands independently in SQL) pins BOTH directions
      round-trip."""
    from tilegrab_spark.operators.cover import compact_cover, uncompact_cover
    from tilegrab_spark.operators.sampling import sample_hash
    from tilegrab_spark.operators.tiles import enumerate_tiles
    from tilegrab_spark.sources.geometries import GeometrySet
    import numpy as np

    minx, miny, maxx, maxy = T_BBOX
    ring = np.array(
        [[minx, miny], [minx, maxy], [maxx, maxy], [maxx, miny], [minx, miny]]
    )
    geom = GeometrySet(geom_id="T", polygons=[[ring]])
    base = enumerate_tiles(spark, geom, 16).select("z", "x", "y", "cell_id")
    deep = enumerate_tiles(spark, geom, 20).select("z", "x", "y", "cell_id")
    holey = deep.filter(sample_hash(F.col("cell_id"), "cover") % 97 != 0)
    cover = compact_cover(holey, 20, min_zoom=16)
    back = uncompact_cover(cover, 20)
    cols = [F.col("z").cast("int").alias("z"), "x", "y", "cell_id"]
    return (
        base.select(F.lit("enum").alias("variant"), *cols)
        .unionByName(cover.select(F.lit("compact").alias("variant"), *cols))
        .unionByName(back.select(F.lit("uncompact").alias("variant"), *cols))
    )


_BBOX_SQL = f"""
WITH corners AS (
  SELECT
    CAST(floor(({T_BBOX[0]} / 360.0 + 0.5 + {EPS}) * 65536.0) AS BIGINT) AS x0,
    CAST(floor((({T_BBOX[2]} - {LL_EPS}) / 360.0 + 0.5 + {EPS}) * 65536.0) AS BIGINT) AS x1,
    CAST(floor((0.5 - 0.25 * ln((1.0 + sin(radians({T_BBOX[3]}))) / (1.0 - sin(radians({T_BBOX[3]})))) / pi() + {EPS}) * 65536.0) AS BIGINT) AS y0,
    CAST(floor((0.5 - 0.25 * ln((1.0 + sin(radians({T_BBOX[1]} + {LL_EPS}))) / (1.0 - sin(radians({T_BBOX[1]} + {LL_EPS})))) / pi() + {EPS}) * 65536.0) AS BIGINT) AS y1
),
corners20 AS (
  SELECT
    CAST(floor(({T_BBOX[0]} / 360.0 + 0.5 + {EPS}) * 1048576.0) AS BIGINT) AS x0,
    CAST(floor((({T_BBOX[2]} - {LL_EPS}) / 360.0 + 0.5 + {EPS}) * 1048576.0) AS BIGINT) AS x1,
    CAST(floor((0.5 - 0.25 * ln((1.0 + sin(radians({T_BBOX[3]}))) / (1.0 - sin(radians({T_BBOX[3]})))) / pi() + {EPS}) * 1048576.0) AS BIGINT) AS y0,
    CAST(floor((0.5 - 0.25 * ln((1.0 + sin(radians({T_BBOX[1]} + {LL_EPS}))) / (1.0 - sin(radians({T_BBOX[1]} + {LL_EPS})))) / pi() + {EPS}) * 1048576.0) AS BIGINT) AS y1
),
base AS (
  SELECT 16 AS z, x0 + dxs.generate_series AS x, y0 + dys.generate_series AS y,
    (16::BIGINT << 58) | ((x0 + dxs.generate_series) << 29) | (y0 + dys.generate_series) AS cell_id
  FROM corners, generate_series(0, 255) dxs, generate_series(0, 255) dys
  WHERE x0 + dxs.generate_series <= x1 AND y0 + dys.generate_series <= y1
),
deep AS (
  SELECT x0 + dxs.generate_series AS x, y0 + dys.generate_series AS y,
    (20::BIGINT << 58) | ((x0 + dxs.generate_series) << 29) | (y0 + dys.generate_series) AS cell_id
  FROM corners20, generate_series(0, 127) dxs, generate_series(0, 127) dys
  WHERE x0 + dxs.generate_series <= x1 AND y0 + dys.generate_series <= y1
),
holey AS (
  SELECT x, y FROM deep
  WHERE ('0x' || substr(md5(cell_id::VARCHAR || 'cover'), 1, 15))::BIGINT % 97 <> 0
),
c20 AS (SELECT x >> 1 AS px, y >> 1 AS py, count(*) AS c FROM holey GROUP BY 1, 2),
e20 AS (SELECT 20 AS z, f.x, f.y FROM holey f
        JOIN c20 ON c20.px = f.x >> 1 AND c20.py = f.y >> 1 WHERE c20.c < 4),
f19 AS (SELECT px AS x, py AS y FROM c20 WHERE c = 4),
c19 AS (SELECT x >> 1 AS px, y >> 1 AS py, count(*) AS c FROM f19 GROUP BY 1, 2),
e19 AS (SELECT 19 AS z, f.x, f.y FROM f19 f
        JOIN c19 ON c19.px = f.x >> 1 AND c19.py = f.y >> 1 WHERE c19.c < 4),
f18 AS (SELECT px AS x, py AS y FROM c19 WHERE c = 4),
c18 AS (SELECT x >> 1 AS px, y >> 1 AS py, count(*) AS c FROM f18 GROUP BY 1, 2),
e18 AS (SELECT 18 AS z, f.x, f.y FROM f18 f
        JOIN c18 ON c18.px = f.x >> 1 AND c18.py = f.y >> 1 WHERE c18.c < 4),
f17 AS (SELECT px AS x, py AS y FROM c18 WHERE c = 4),
c17 AS (SELECT x >> 1 AS px, y >> 1 AS py, count(*) AS c FROM f17 GROUP BY 1, 2),
e17 AS (SELECT 17 AS z, f.x, f.y FROM f17 f
        JOIN c17 ON c17.px = f.x >> 1 AND c17.py = f.y >> 1 WHERE c17.c < 4),
f16 AS (SELECT px AS x, py AS y FROM c17 WHERE c = 4),
compact AS (
  SELECT * FROM e20 UNION ALL SELECT * FROM e19 UNION ALL SELECT * FROM e18
  UNION ALL SELECT * FROM e17 UNION ALL SELECT 16 AS z, x, y FROM f16
),
cid AS (SELECT z, x, y, (z::BIGINT << 58) | (x << 29) | y AS cell_id FROM compact)
SELECT 'enum' AS variant, z, x, y, cell_id FROM base
UNION ALL
SELECT 'compact' AS variant, z, x, y, cell_id FROM cid
UNION ALL
SELECT 'uncompact' AS variant, 20 AS z,
       c.x * (1 << (20 - c.z)) + dx.u AS x,
       c.y * (1 << (20 - c.z)) + dy.u AS y,
       (20::BIGINT << 58) | ((c.x * (1 << (20 - c.z)) + dx.u) << 29)
         | (c.y * (1 << (20 - c.z)) + dy.u) AS cell_id
FROM cid c,
     LATERAL unnest(range(0, 1 << (20 - c.z))) AS dx(u),
     LATERAL unnest(range(0, 1 << (20 - c.z))) AS dy(u)
"""


# --- training-data ops over documents/embeddings ---

def _sql_surface(spark, sf):
    """Tile math through the SQL-STRING surface (tilegrab_spark/sql.py,
    round-3 VERDICT missing #3): the same P1 encode as tile_encode_p1
    but executed via spark.sql over registered tg_* scalar functions
    (pure-Catalyst bodies), plus the packed cell id and its unpack
    round-trip. Integer outputs only (float parity with the DataFrame
    API is pinned bit-wise in tests/test_sql.py)."""
    from tilegrab_spark.sql import register_sql_functions

    register_sql_functions(spark)
    _t(spark, sf, "lineitem").createOrReplaceTempView("li_sqlsurface")
    return spark.sql("""
      WITH pts AS (
        SELECT l_orderkey, l_linenumber,
               (pmod(l_orderkey * 7, 360000) / 1000.0d) - 180.0d AS lon,
               (pmod(l_partkey * 13, 170000) / 1000.0d) - 85.0d AS lat
        FROM li_sqlsurface),
      enc AS (
        SELECT l_orderkey, l_linenumber,
               tg_tile_encode(lon, lat, 12) AS t
        FROM pts)
      SELECT l_orderkey, l_linenumber, t.x AS xtile, t.y AS ytile,
             tg_cell_id(12, t.x, t.y) AS cell_id,
             tg_cell_unpack(tg_cell_id(12, t.x, t.y)).x AS x_back
      FROM enc
    """)


def _sql_surface_sql() -> str:
    from tilegrab_spark.kernels.geo import EPSILON

    return f"""
WITH pts AS (
  SELECT l_orderkey, l_linenumber,
    ((l_orderkey * 7) % 360000) / 1000.0 - 180.0 AS lon,
    ((l_partkey * 13) % 170000) / 1000.0 - 85.0 AS lat
  FROM lineitem),
enc AS (
  SELECT l_orderkey, l_linenumber,
    lon / 360.0 + 0.5 AS xf,
    0.5 - 0.25 * ln((1.0 + sin(radians(lat))) / (1.0 - sin(radians(lat)))) / pi() AS yf
  FROM pts),
tiles AS (
  SELECT l_orderkey, l_linenumber,
    CASE WHEN xf <= 0 THEN 0 WHEN xf >= 1 THEN 4095
         ELSE CAST(floor((xf + {EPSILON!r}) * 4096.0) AS BIGINT) END AS xtile,
    CASE WHEN yf <= 0 THEN 0 WHEN yf >= 1 THEN 4095
         ELSE CAST(floor((yf + {EPSILON!r}) * 4096.0) AS BIGINT) END AS ytile
  FROM enc)
SELECT l_orderkey, l_linenumber, xtile, ytile,
  (12::BIGINT << 58) | (xtile << 29) | ytile AS cell_id,
  xtile AS x_back
FROM tiles
"""


def _dedup_exact(spark, sf):
    """Exact dedup + duplicate-group rollup in ONE contract row (driver
    window economy): the kept representatives from ``exact_dedup``
    left-joined with ``duplicate_groups``' per-hash counts (keep_id is
    the join key, so the group→representative mapping is pinned too);
    singletons get n_dups=1."""
    from tilegrab_spark.operators.dedup import duplicate_groups, exact_dedup

    d = _t(spark, sf, "documents")
    kept = exact_dedup(d).select("doc_id", "lang", "source", "n_chars")
    groups = duplicate_groups(d).select(
        F.col("keep_id").alias("doc_id"), "n_dups"
    )
    return kept.join(groups, "doc_id", "left").select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.coalesce(F.col("n_dups"), F.lit(1)).cast("long").alias("n_dups"),
    )


_DEDUP_SQL = """
WITH kept AS (
  SELECT doc_id, lang, source, n_chars FROM (
    SELECT doc_id, lang, source, n_chars,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents) WHERE rn = 1
),
g AS (
  SELECT md5(text) AS content_hash, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
  FROM documents GROUP BY 1 HAVING COUNT(*) > 1
)
SELECT k.doc_id, k.lang, k.source, k.n_chars,
       COALESCE(g.n_dups, 1)::BIGINT AS n_dups
FROM kept k LEFT JOIN g ON k.doc_id = g.keep_id
"""


def _word_jaccard(spark, sf):
    from tilegrab_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return ngram_jaccard_pairs(d, k=1, threshold=0.6)


_JACCARD_SQL = r"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
words AS (
  SELECT doc_id, unnest(list_distinct(string_split_regex(lower(text), '\s+'))) AS w
  FROM docs),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM words GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
  FROM words a JOIN words b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
  CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE) AS jaccard
FROM pairs JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE) >= 0.6
"""


def _text_signals(spark, sf):
    """Per-document text-analysis signals in ONE contract row (driver
    window economy): token counting, quality scoring, language-ID,
    Gopher-style repetition and the hashed-linear classifier margin
    (operators/classifier.py, deterministic integer test weights) —
    five operators over the same corpus, joined on doc_id. Each
    sub-operator's full column set survives, so the value hash pins
    all five independently-derived oracles at once."""
    from tilegrab_spark.operators.text import (
        with_lang_id,
        with_quality_score,
        with_repetition_signals,
        with_token_counts,
    )

    d = _t(spark, sf, "documents")
    tk = with_token_counts(d).select(
        "doc_id",
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.col("bpe_tokens").cast("long").alias("bpe_tokens"),
    )
    q = with_quality_score(d).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "punct_ratio",
        F.col("n_stopwords").cast("long").alias("n_stopwords"),
        "quality",
    )
    lg = with_lang_id(d).select("doc_id", "lang_pred")
    rp = with_repetition_signals(d).select(
        "doc_id",
        F.col("n_lines").cast("int").alias("n_lines"),
        "dup_line_frac",
        "top_word_frac",
    )
    import hashlib

    import numpy as np

    from tilegrab_spark.operators.classifier import score_documents

    w = np.array(
        [
            int(hashlib.md5(f"{i}w".encode()).hexdigest()[:15], 16) % 2001
            - 1000
            for i in range(64)
        ],
        dtype=np.int64,
    )
    cl = score_documents(d, w).select(
        "doc_id", F.col("margin").alias("clf_margin")
    )
    return (
        tk.join(q, "doc_id")
        .join(lg, "doc_id")
        .join(rp, "doc_id")
        .join(cl, "doc_id")
    )


def _text_signals_sql() -> str:
    return f"""
SELECT tk.doc_id, tk.ws_tokens, tk.bpe_tokens,
       q.n_tokens, q.punct_ratio, q.n_stopwords, q.quality,
       lg.lang_pred,
       rp.n_lines, rp.dup_line_frac, rp.top_word_frac,
       cl.clf_margin
FROM ({_TOKENS_SQL}) tk
JOIN ({_QUALITY_SQL}) q ON q.doc_id = tk.doc_id
JOIN ({_lang_id_sql()}) lg ON lg.doc_id = tk.doc_id
JOIN ({_REPETITION_SQL}) rp ON rp.doc_id = tk.doc_id
JOIN ({_CLF_SQL}) cl ON cl.doc_id = tk.doc_id
"""


# hashed-linear classifier margin (operators/classifier.py) with the
# deterministic integer test weights w[i] = md5_60(i||'w') % 2001 - 1000
# over 64 features: integer arithmetic end-to-end, so the margin pins
# tokenization, the md5 feature-hash contract, and the weighted sum
# bit-for-bit (the sigmoid is a pure function of the margin, pytest-pinned)
_CLF_SQL = r"""
WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                       t -> t <> '')) AS tok
  FROM documents),
idxd AS (
  SELECT doc_id,
    ('0x' || substr(md5(tok || 'qc'), 1, 15))::BIGINT % 64 AS idx
  FROM toks),
summed AS (
  SELECT doc_id,
    SUM((('0x' || substr(md5(idx::VARCHAR || 'w'), 1, 15))::BIGINT % 2001)
        - 1000) AS m
  FROM idxd GROUP BY doc_id)
SELECT d.doc_id, CAST(COALESCE(s.m, 0) AS BIGINT) AS clf_margin
FROM documents d LEFT JOIN summed s ON s.doc_id = d.doc_id
"""


_TOKENS_SQL = r"""
SELECT doc_id,
  CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE len(string_split_regex(trim(text), '\s+')) END AS ws_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
FROM documents
"""


_QUALITY_SQL = r"""
WITH base AS (
  SELECT doc_id, text, length(text) AS n_chars,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS n_tokens,
    length(regexp_replace(text, '[^\.,;:!\?"'']', '', 'g')) AS n_punct,
    len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\s+')),
        ['the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','with','for','on','as','at','by'])) AS n_stop
  FROM documents)
SELECT doc_id, n_tokens,
  CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio,
  CASE WHEN n_tokens > 0 THEN n_stop ELSE 0 END AS n_stopwords,
  (CASE WHEN n_tokens >= 5 THEN 0.25 ELSE 0.0 END
   + CASE WHEN n_tokens > 0 AND (CAST(n_chars AS DOUBLE)/n_tokens) BETWEEN 3 AND 12 THEN 0.25 ELSE 0.0 END
   + CASE WHEN (CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0.0 END) <= 0.2 THEN 0.25 ELSE 0.0 END
   + CASE WHEN (CASE WHEN n_tokens > 0 THEN n_stop ELSE 0 END) >= 1 THEN 0.25 ELSE 0.0 END) AS quality
FROM base
"""


def _ann_topk(spark, sf):
    """Both ANN paths in ONE contract row (driver window economy),
    union-tagged by variant:

    - ``exact``: brute-force cosine top-10 for 8 queries
      (operators/similarity.py::cosine_topk) — the oracle baseline.
    - ``ivf``: IVF ANN at FULL probe width (n_probe = n_centroids):
      probing every inverted list makes the approximate path provably
      identical to exact top-k, so the DuckDB exact-cosine oracle pins
      the whole machinery — k-means assignment, probe routing, per-list
      scan, ranking. The recall-gated PARTIAL-probe behaviour (the
      actual scale path) is asserted in tests/test_similarity.py.
    - ``pq``: product-quantization search (operators/quantization.py)
      with a FULL-WIDTH candidate list: pq_topk at k >= N makes the
      exact-cosine re-rank provably identical to exact top-k, so the
      same oracle pins codebook training, encoding, the ADC scan and
      the re-rank join. ADC *pruning* quality (the scale path: small
      candidate lists) is asserted in tests/test_quantization.py."""
    from tilegrab_spark.operators.similarity import (
        ann_topk_ivf,
        assign_lists,
        cosine_topk,
        train_centroids,
    )

    emb = _t(spark, sf, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(q, emb, k=10).select(
        "query_id",
        "vec_id",
        F.col("rank").cast("long").alias("rank"),
        F.lit("exact").alias("variant"),
    )
    cents = train_centroids(emb, n_centroids=8, iters=3)
    wl = assign_lists(emb, cents)
    q4 = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ivf = ann_topk_ivf(q4, wl, cents, k=5, n_probe=8).select(
        "query_id",
        "vec_id",
        F.col("rank").cast("long").alias("rank"),
        F.lit("ivf").alias("variant"),
    )
    from tilegrab_spark.operators.quantization import (
        encode_pq,
        pq_topk,
        rerank_exact,
        train_pq,
    )

    books = train_pq(emb, m=8, nbits=4, iters=3, sample=512)
    codes = encode_pq(emb, books)
    q6 = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cand = pq_topk(q6, codes, books, k=1_000_000)  # full width: re-rank is exact
    pq = rerank_exact(cand, q6, emb, k=7).select(
        "query_id",
        "vec_id",
        F.col("rank").cast("long").alias("rank"),
        F.lit("pq").alias("variant"),
    )
    return exact.unionByName(ivf).unionByName(pq)


_ANN_TOPK_SQL = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, e.vec_id, list_cosine_similarity(q.qv, e.v) AS cosine
  FROM q CROSS JOIN emb e)
SELECT query_id, vec_id, rank, 'exact' AS variant FROM (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored) WHERE rank <= 10
UNION ALL
SELECT query_id, vec_id, rank, 'ivf' AS variant FROM (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored WHERE query_id < 4) WHERE rank <= 5
UNION ALL
SELECT query_id, vec_id, rank, 'pq' AS variant FROM (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored WHERE query_id < 6) WHERE rank <= 7
"""


def _embedding_pairs(spark, sf):
    """Embedding cosine near-dup pairs. ``exact=True`` is the explicit
    oracle-baseline opt-in (the DEFAULT is the LSH sign-bucket path — a
    probabilistic candidate set no exhaustive SQL oracle can pin; the
    recall-vs-exact gate lives in test_dedup). Threshold margin on the
    driver corpus is >=8.5e-4 — far above cross-engine float noise, so
    the ids-only output is hash-stable."""
    from tilegrab_spark.operators.dedup import embedding_cosine_pairs

    emb = _t(spark, sf, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return embedding_cosine_pairs(emb, threshold=0.5, exact=True).select("id_a", "id_b")


_EMB_PAIRS_SQL = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM emb a JOIN emb b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.5
"""


def _clean_corpus(spark, sf):
    """Composite training-data pipeline: quality filter -> exact dedup ->
    join embeddings -> per-lang rollup. One query exercising filters,
    dedup, a dimension join and aggregation together."""
    from tilegrab_spark.operators.dedup import exact_dedup
    from tilegrab_spark.operators.text import with_quality_score, with_token_counts

    d = with_token_counts(with_quality_score(_t(spark, sf, "documents")))
    good = d.filter(F.col("quality") >= 0.75)
    deduped = exact_dedup(good)
    emb = _t(spark, sf, "embeddings")
    joined = deduped.join(emb, deduped.doc_id == emb.vec_id, "inner")
    return (
        joined.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("ws_tokens").cast("long")).alias("total_tokens"),
            F.min("doc_id").alias("min_doc"),
        )
        .orderBy("lang")
    )


_CLEAN_SQL = r"""
WITH scored AS (
  SELECT doc_id, lang, text,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS ws_tokens,
    (CASE WHEN (CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(lower(trim(text)), '\s+')) END) >= 5 THEN 0.25 ELSE 0.0 END
     + CASE WHEN (CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(lower(trim(text)), '\s+')) END) > 0
             AND (CAST(length(text) AS DOUBLE) / (CASE WHEN length(trim(text)) = 0 THEN 1
                  ELSE len(string_split_regex(lower(trim(text)), '\s+')) END)) BETWEEN 3 AND 12 THEN 0.25 ELSE 0.0 END
     + CASE WHEN (CASE WHEN length(text) > 0 THEN
            CAST(length(regexp_replace(text, '[^\.,;:!\?"'']', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END) <= 0.2 THEN 0.25 ELSE 0.0 END
     + CASE WHEN len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\s+')),
          ['the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','with','for','on','as','at','by'])) >= 1
            AND (CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(string_split_regex(lower(trim(text)), '\s+')) END) > 0 THEN 0.25 ELSE 0.0 END) AS quality
  FROM documents),
good AS (SELECT * FROM scored WHERE quality >= 0.75),
deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM good
  ) WHERE rn = 1),
joined AS (SELECT d.* FROM deduped d JOIN embeddings e ON d.doc_id = e.vec_id)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(ws_tokens) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS min_doc
FROM joined GROUP BY lang ORDER BY lang
"""


def _knn_cells(spark, sf):
    """kNN via cell-ring expansion on cells derived from lineitem keys;
    oracle = brute-force window over the same derived cells."""
    from tilegrab_spark.operators.knn import knn_join
    from tilegrab_spark.kernels.geo import tile_bounds

    li = _t(spark, sf, "lineitem")
    images = (
        li.select(
            F.lit(10).alias("z"),
            F.pmod(F.col("l_orderkey"), F.lit(64)).cast("long").alias("x"),
            F.pmod(F.col("l_partkey"), F.lit(64)).cast("long").alias("y"),
        )
        .distinct()
        .withColumn("image_id", F.format_string("10_%d_%d", "x", "y"))
    )
    qcells = [(5, 5), (30, 40), (60, 60)]
    rows = []
    for i, (qx, qy) in enumerate(qcells):
        mnl, mnt, mxl, mxt = tile_bounds(qx, qy, 10)
        # 0.3/0.7 offsets: asymmetric -> no exact distance ties on the grid
        rows.append(
            (f"q{i}", float(mnl + 0.3 * (mxl - mnl)), float(mnt + 0.7 * (mxt - mnt)))
        )
    queries = spark.createDataFrame(rows, "query_id string, lon double, lat double")
    return knn_join(queries, images, 10, k=5).select(
        "query_id", "image_id", F.col("rank").cast("long").alias("rank")
    )


def _knn_sql() -> str:
    from tilegrab_spark.kernels.geo import WEB_MERCATOR_EXTENT, tile_bounds
    import math

    R = 6378137.0
    qcells = [(5, 5), (30, 40), (60, 60)]
    vals = []
    for i, (qx, qy) in enumerate(qcells):
        mnl, mnt, mxl, mxt = tile_bounds(qx, qy, 10)
        lon = float(mnl + 0.3 * (mxl - mnl))
        lat = float(mnt + 0.7 * (mxt - mnt))
        qmx = math.radians(lon) * R
        qmy = math.log(math.tan(math.pi / 4 + math.radians(lat) / 2)) * R
        vals.append(f"('q{i}', {qmx!r}, {qmy!r})")
    ext = WEB_MERCATOR_EXTENT
    ts = 2 * ext / 1024
    return f"""
WITH cells AS (
  SELECT DISTINCT (l_orderkey % 64) AS x, (l_partkey % 64) AS y FROM lineitem),
images AS (
  SELECT x, y, printf('10_%d_%d', x, y) AS image_id,
         {-ext} + (x + 0.5) * {ts!r} AS cx, {ext!r} - (y + 0.5) * {ts!r} AS cy
  FROM cells),
queries(query_id, qmx, qmy) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.query_id, i.image_id,
         sqrt((i.cx - q.qmx)^2 + (i.cy - q.qmy)^2) AS dist
  FROM queries q CROSS JOIN images i)
SELECT query_id, image_id, rank FROM (
  SELECT query_id, image_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist, image_id) AS rank
  FROM scored) WHERE rank <= 5
"""


# --- non-SQL-expressible ops (rows-only checks) ---

def _minhash_pairs(spark, sf):
    """LSH near-dup pairs, FULLY oracled: the SQL below re-derives the
    whole pipeline — shingles, all 64 permutations (HUGEINT), the 16
    band SLICES, pairs sharing >=1 identical band, exact Jaccard >= 0.5.
    Spark buckets on xxhash64(band, slice) rather than the raw slice
    (8-byte shuffle keys); since candidates are verified by EXACT
    Jaccard, the final pair set is hash-function-independent — identical
    to the oracle's share-a-band-slice derivation (a band-hash collision
    could only ever ADD a candidate, which the exact filter then keeps
    iff it's a true pair anyway)."""
    from tilegrab_spark.operators.dedup import minhash_lsh_pairs

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return minhash_lsh_pairs(d, threshold=0.5)


def _minhash_lsh_sql() -> str:
    from tilegrab_spark.operators.dedup import _MERSENNE, _perm_params

    a, b = _perm_params(64)
    av = ",".join(str(int(v)) for v in a)
    bv = ",".join(str(int(v)) for v in b)
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS t
  FROM documents WHERE doc_id < 200
),
sh AS (
  SELECT doc_id, CASE WHEN len(t) >= 3
    THEN list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)])
    ELSE [array_to_string(t, ' ')] END AS shingles
  FROM toks
),
hh AS (
  SELECT doc_id,
         (('0x' || substr(md5(s), 1, 16))::UBIGINT
          & 9223372036854775807::UBIGINT)::HUGEINT AS h
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
),
perms AS (
  SELECT unnest([{av}]) AS a, unnest([{bv}]) AS b,
         (generate_subscripts([{av}], 1) - 1)::INTEGER AS i
),
persig AS (
  SELECT doc_id, i, MIN((a::HUGEINT * h + b::HUGEINT) % {_MERSENNE})::BIGINT AS v
  FROM perms, hh GROUP BY doc_id, i
),
sigs AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM persig GROUP BY doc_id),
banded AS (
  SELECT doc_id, bs.generate_series AS band,
         list_slice(sig, bs.generate_series * 4 + 1, bs.generate_series * 4 + 4) AS bslice
  FROM sigs, generate_series(0, 15) bs
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bslice = b.bslice AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
         / len(list_distinct(sa.shingles || sb.shingles))::DOUBLE AS jaccard
FROM cand c
JOIN sh sa ON sa.doc_id = c.id_a
JOIN sh sb ON sb.doc_id = c.id_b
WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
        / len(list_distinct(sa.shingles || sb.shingles))::DOUBLE >= 0.5
"""


def _incremental_lsh(spark, sf):
    """Incremental near-dup pairs (streaming/incremental_dedup.py): the
    corpus arrives as two batches (doc_id parity split); batch 0 seeds
    the persisted signature table, batch 1 computes signatures ONLY for
    its own docs and LSH-joins new-vs-all. Returned frame = the pairs
    INTRODUCED by batch 1 (>=1 odd doc id) — the oracle re-derives the
    full LSH pair set in SQL and filters to pairs touching batch 1,
    which is exactly the incremental contract (old x old pairs belong
    to batch 0 and are not re-emitted)."""
    import shutil
    import tempfile

    from tilegrab_spark.operators.dedup import release_signature_caches
    from tilegrab_spark.streaming.incremental_dedup import incremental_lsh_pairs

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    b0 = d.filter(F.col("doc_id") % 2 == 0)
    b1 = d.filter(F.col("doc_id") % 2 == 1)
    tmp = tempfile.mkdtemp(prefix="tg_incr_sig_")
    sig_path = f"{tmp}/sigs"
    try:
        incremental_lsh_pairs(b0, sig_path, b0, batch_id=0, threshold=0.5).count()
        pairs = incremental_lsh_pairs(b1, sig_path, d, batch_id=1, threshold=0.5)
        # materialized by commit=True; safe to drop the table under it
        out = pairs.localCheckpoint(eager=True)
    finally:
        release_signature_caches()
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _incremental_lsh_sql() -> str:
    return (
        "SELECT * FROM (" + _minhash_lsh_sql() + ") "
        "WHERE id_a % 2 = 1 OR id_b % 2 = 1"
    )


def _hamming_family(spark, sf):
    """Both hamming-family near-dup generators in ONE contract row
    (driver window economy), union-tagged by variant:

    - ``simhash``: SimHash-of-text pairs (operators/dedup.py::
      simhash_pairs) at max_hamming=8.
    - ``generic``: the raw int64-hamming pigeonhole join
      (hamming_near_dup_pairs — the engine under phash image dedup);
      the driver tables carry no phash column, so the surrogate key is
      n_chars cast to int64. DuckDB re-derives both pair sets
      exhaustively, proving the pigeonhole blocking missed nothing."""
    from tilegrab_spark.operators.dedup import (
        hamming_near_dup_pairs,
        simhash_pairs,
    )

    d = _t(spark, sf, "documents")
    sh = simhash_pairs(d.filter(F.col("doc_id") < 200), max_hamming=8).select(
        "id_a",
        "id_b",
        F.col("hamming").cast("int").alias("hamming"),
        F.lit("simhash").alias("variant"),
    )
    g = _t(spark, sf, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("h64")
    )
    hn = hamming_near_dup_pairs(
        g, hash_col="h64", id_col="doc_id", max_hamming=1
    ).select(
        "id_a",
        "id_b",
        F.col("hamming").cast("int").alias("hamming"),
        F.lit("generic").alias("variant"),
    )
    return sh.unionByName(hn)


# The oracle re-derives SimHash itself (md5-low-64 token hash — the
# _stable_hash64 contract — per-bit majority vote) and then finds pairs
# EXHAUSTIVELY; matching it proves both the hash math and that the
# pigeonhole blocking in hamming_near_dup_pairs missed nothing.
_SIMHASH_SQL = """
WITH toks AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents WHERE doc_id < 200)
  WHERE w <> ''
),
th AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS h FROM toks),
bits AS (
  SELECT doc_id, g.generate_series AS b,
         SUM(((h >> g.generate_series::UBIGINT) & 1)::BIGINT) AS ones, COUNT(*) AS n
  FROM th, generate_series(0, 63) g
  GROUP BY doc_id, g.generate_series
),
sh AS (
  -- left join so token-less docs keep simhash 0 (the UDF's empty case)
  SELECT d.doc_id,
         COALESCE(SUM(CASE WHEN ones * 2 >= n THEN (1::HUGEINT << b)
                           ELSE 0::HUGEINT END), 0::HUGEINT) AS u
  FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d
  LEFT JOIN bits ON d.doc_id = bits.doc_id
  GROUP BY d.doc_id
),
sg AS (
  SELECT doc_id,
    (u - CASE WHEN u >= 9223372036854775808::HUGEINT
              THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)::BIGINT AS simhash
  FROM sh
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sg a JOIN sg b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
"""

# hamming_pairs contract row: simhash variant (above, re-derived
# exhaustively) unioned with the generic int64-hamming variant over the
# n_chars surrogate key (also exhaustive - proving the pigeonhole
# blocking in hamming_near_dup_pairs missed nothing).
_HAMMING_FAMILY_SQL = f"""
SELECT id_a, id_b, hamming, 'simhash' AS variant FROM ({_SIMHASH_SQL})
UNION ALL
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.n_chars::BIGINT, b.n_chars::BIGINT)) AS INTEGER) AS hamming,
       'generic' AS variant
FROM documents a JOIN documents b
  ON a.doc_id < b.doc_id
 AND bit_count(xor(a.n_chars::BIGINT, b.n_chars::BIGINT)) <= 1
"""


def _cross_modal(spark, sf):
    """Cross-modal near-dup pairs (operators/crossmodal.py): visual
    modality = int64-hamming over a 64-bit signature (here SimHash of the
    text stands in for the image table's phash — the operator is
    hash-generic and the driver tables carry no phash), caption modality
    = exact word-jaccard, combined with one full-outer join on the pair
    key. FULLY oracled: DuckDB re-derives BOTH pair lists independently
    (the SimHash md5 majority-vote math exhaustively, jaccard from the
    inverted index) and the same outer-join/modality combine in SQL.
    Nulls are coalesced to sentinels (-1) on both sides so the driver's
    value-hash never sees NaN."""
    from tilegrab_spark.operators.crossmodal import cross_modal_pairs
    from tilegrab_spark.operators.dedup import with_simhash

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    out = cross_modal_pairs(
        with_simhash(d),
        id_col="doc_id",
        hash_col="simhash",
        text_col="text",
        max_hamming=8,
        k=1,
        jaccard_threshold=0.6,
    )
    return out.select(
        "id_a",
        "id_b",
        F.coalesce(F.col("hamming").cast("int"), F.lit(-1)).alias("hamming"),
        F.coalesce(F.col("jaccard"), F.lit(-1.0)).alias("jaccard"),
        "modality",
    )


def _cross_modal_sql() -> str:
    """Oracle: the two standalone modality oracles (each already an
    independent re-derivation) FULL OUTER JOINed with the same modality
    CASE as the operator."""
    vis = _SIMHASH_SQL.strip().rstrip(";")
    cap = _JACCARD_SQL.strip().rstrip(";")
    return f"""
SELECT COALESCE(v.id_a, c.id_a) AS id_a,
       COALESCE(v.id_b, c.id_b) AS id_b,
       COALESCE(v.hamming, -1) AS hamming,
       COALESCE(c.jaccard, -1.0) AS jaccard,
       CASE WHEN v.id_a IS NOT NULL AND c.id_a IS NOT NULL THEN 'both'
            WHEN v.id_a IS NOT NULL THEN 'visual'
            ELSE 'caption' END AS modality
FROM ({vis}) v FULL OUTER JOIN ({cap}) c
  ON v.id_a = c.id_a AND v.id_b = c.id_b
"""


def _dissolve(spark, sf):
    """Tile dissolve (operators/dissolve.py): 4-adjacency connected
    regions over a tile set derived from lineitem keys, with per-region
    bbox + handshake perimeter. FULLY oracled — DuckDB re-derives the
    adjacency edges, the COMPONENTS THEMSELVES (recursive-CTE
    reachability fixpoint, an independent algorithm from the engine's
    pointer-jumping min-label propagation), and every aggregate."""
    from tilegrab_spark.operators.dissolve import dissolve_tiles

    li = _t(spark, sf, "lineitem").select(
        (F.col("l_orderkey") % 60).cast("long").alias("x"),
        (F.col("l_partkey") % 60).cast("long").alias("y"),
    )
    cells = (
        li.filter((F.col("x") * 2654435761 + F.col("y") * 40503) % 97 < 44)
        .withColumn("z", F.lit(10))
        .distinct()
    )
    return dissolve_tiles(cells)


_DISSOLVE_SQL = """
WITH cells AS (
  SELECT DISTINCT (l_orderkey % 60)::BIGINT AS x, (l_partkey % 60)::BIGINT AS y
  FROM lineitem
  WHERE ((l_orderkey % 60) * 2654435761 + (l_partkey % 60) * 40503) % 97 < 44
),
packed AS (SELECT x, y, (10::BIGINT << 58) | (x << 29) | y AS cell FROM cells),
edges AS (
  SELECT a.cell AS ca, b.cell AS cb FROM packed a JOIN packed b
    ON (b.x = a.x + 1 AND b.y = a.y) OR (b.x = a.x AND b.y = a.y + 1)
),
und AS (SELECT ca, cb FROM edges UNION SELECT cb AS ca, ca AS cb FROM edges),
reach AS (
  WITH RECURSIVE lab(cell, comp) AS (
    SELECT cell, cell AS comp FROM packed
    UNION
    SELECT u.ca AS cell, l.comp FROM und u JOIN lab l ON l.cell = u.cb
  )
  SELECT cell, MIN(comp) AS comp FROM lab GROUP BY cell
),
labeled AS (SELECT p.x, p.y, p.cell, r.comp FROM packed p JOIN reach r ON p.cell = r.cell),
internal AS (SELECT l.comp, COUNT(*) AS ne FROM edges e JOIN reach l ON l.cell = e.ca GROUP BY 1)
SELECT l.comp AS region_id, 10 AS z, COUNT(*) AS n_tiles,
       MIN(x) AS minx, MIN(y) AS miny, MAX(x) AS maxx, MAX(y) AS maxy,
       4 * COUNT(*) - 2 * COALESCE(ANY_VALUE(i.ne), 0) AS perimeter
FROM labeled l LEFT JOIN internal i ON i.comp = l.comp
GROUP BY l.comp
"""


_DIFF_A = [(16, x, y, 0) for x in range(47439, 47443) for y in (31441, 31442)]
_DIFF_B = [
    (16, x, y, 1 if (x + y) % 2 else 0)
    for x in range(47439, 47443)
    for y in (31441, 31442)
    if not (x == 47439 and y == 31441)  # removed in epoch B
] + [(16, 47443, y, 0) for y in (31441, 31442)]  # added in epoch B


def _tile_diff(spark, sf):
    """Temporal change detection between two image-table epochs
    (operators/change.py::tile_diff): one full-outer equi-join on the
    packed cell key + a bounded Arrow diff kernel. FULLY oracled: the
    added/removed/changed/unchanged classification is re-derived
    relationally in DuckDB from the two epoch key lists, and the pixel
    stats for every matched cell are recomputed at oracle-build time
    from the FIXTURES.md pixel formula with independent numpy (the
    zonal_stats_t leaf-values pattern). Nulls -> sentinels (-1) for the
    driver's value-hash."""
    import tempfile

    from tilegrab_spark.operators.change import tile_diff
    from tilegrab_spark.sources.images import (
        read_image_table,
        write_synthetic_image_table,
    )

    tmp = tempfile.mkdtemp()
    write_synthetic_image_table(spark, f"{tmp}/a", _DIFF_A, n_buckets=2)
    write_synthetic_image_table(spark, f"{tmp}/b", _DIFF_B, n_buckets=2)
    out = tile_diff(
        read_image_table(spark, f"{tmp}/a"),
        read_image_table(spark, f"{tmp}/b"),
        threshold=16,
    )
    return out.select(
        "key",
        "status",
        F.coalesce("n_px", F.lit(-1)).alias("n_px"),
        F.coalesce("changed_frac", F.lit(-1.0)).alias("changed_frac"),
        F.coalesce("mean_abs_diff", F.lit(-1.0)).alias("mean_abs_diff"),
        F.coalesce("psnr_db", F.lit(-1.0)).alias("psnr_db"),
    )


def _tile_diff_sql() -> str:
    import numpy as np

    from tilegrab_spark.kernels.geo import pack_cell_id
    from tilegrab_spark.kernels.png import synth_tile_pixels

    a = {(x, y): s for (_, x, y, s) in _DIFF_A}
    b = {(x, y): s for (_, x, y, s) in _DIFF_B}
    a_vals = ", ".join(f"({int(pack_cell_id(x, y, 16))})" for (x, y) in sorted(a))
    b_vals = ", ".join(f"({int(pack_cell_id(x, y, 16))})" for (x, y) in sorted(b))
    leaves = []
    for (x, y) in sorted(set(a) & set(b)):
        pa = synth_tile_pixels(x, y, 16, a[(x, y)]).astype(np.int16)
        pb = synth_tile_pixels(x, y, 16, b[(x, y)]).astype(np.int16)
        d = np.abs(pa - pb)
        dmax = d.max(axis=2)
        mse = float(np.square(d, dtype=np.int64).mean())
        psnr = float(10.0 * np.log10(255.0**2 / mse)) if mse > 0 else -1.0
        leaves.append(
            f"({int(pack_cell_id(x, y, 16))}, {dmax.size},"
            f" {float((dmax > 16).mean())!r}, {float(dmax.mean())!r}, {psnr!r},"
            f" {int(mse > 0)})"
        )
    leaf_vals = ", ".join(leaves)
    return f"""
WITH a(key) AS (VALUES {a_vals}),
     b(key) AS (VALUES {b_vals}),
     leaf(key, n_px, cf, mad, psnr, is_changed) AS (VALUES {leaf_vals})
SELECT COALESCE(a.key, b.key) AS key,
       CASE WHEN a.key IS NULL THEN 'added'
            WHEN b.key IS NULL THEN 'removed'
            WHEN leaf.is_changed = 1 THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(COALESCE(leaf.n_px, -1) AS BIGINT) AS n_px,
       COALESCE(leaf.cf, -1.0) AS changed_frac,
       COALESCE(leaf.mad, -1.0) AS mean_abs_diff,
       COALESCE(leaf.psnr, -1.0) AS psnr_db
FROM a FULL OUTER JOIN b ON a.key = b.key
LEFT JOIN leaf ON leaf.key = COALESCE(a.key, b.key)
"""


def _band_rollup(spark, sf):
    """Raster map algebra (operators/algebra.py::band_math): the GLI
    vegetation index evaluated per pixel over synthetic tiles, reduced
    per tile in the Arrow kernel, then rolled up per tile COLUMN with an
    algebraic groupBy (exact mean from carried sums, not averaged
    averages). FULLY oracled: per-tile leaf stats are recomputed at
    oracle-build time from the FIXTURES pixel formula with the GLI math
    written inline in numpy (independent of the operator's expression
    compiler), and the column rollup is DuckDB's own GROUP BY."""
    import tempfile

    from tilegrab_spark.operators.algebra import band_math
    from tilegrab_spark.sources.images import (
        read_image_table,
        write_synthetic_image_table,
    )

    tmp = tempfile.mkdtemp()
    write_synthetic_image_table(spark, f"{tmp}/imgs", _DIFF_A, n_buckets=2)
    stats = band_math(
        read_image_table(spark, f"{tmp}/imgs"), "gli", threshold=0.2
    )
    x = F.shiftrightunsigned("key", 29).bitwiseAND(F.lit((1 << 29) - 1))
    return (
        stats.withColumn("x", x.cast("long"))
        .groupBy("x")
        .agg(
            F.count("*").alias("n_tiles"),
            F.sum("n_finite").alias("n_finite"),
            (F.sum("sum") / F.sum("n_finite")).alias("mean_gli"),
            F.min("min").alias("min_gli"),
            F.max("max").alias("max_gli"),
            F.avg("frac_above").alias("avg_frac_above"),
        )
    )


def _band_rollup_sql() -> str:
    import numpy as np

    from tilegrab_spark.kernels.png import synth_tile_pixels

    leaves = []
    for (_, x, y, src) in _DIFF_A:
        p = synth_tile_pixels(x, y, 16, src).astype(np.float64)
        r, g, b = p[..., 0], p[..., 1], p[..., 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            gli = (2 * g - r - b) / (2 * g + r + b)
        fin = gli[np.isfinite(gli)]
        leaves.append(
            f"({x}, {fin.size}, {float(fin.sum())!r}, {float(fin.min())!r},"
            f" {float(fin.max())!r}, {float((fin > 0.2).mean())!r})"
        )
    vals = ", ".join(leaves)
    return f"""
WITH leaf(x, n_finite, s, mn, mx, fa) AS (VALUES {vals})
SELECT CAST(x AS BIGINT) AS x, CAST(COUNT(*) AS BIGINT) AS n_tiles,
       CAST(SUM(n_finite) AS BIGINT) AS n_finite,
       SUM(s) / SUM(n_finite) AS mean_gli,
       MIN(mn) AS min_gli, MAX(mx) AS max_gli,
       AVG(fa) AS avg_frac_above
FROM leaf GROUP BY x
"""


def _focal(spark, sf):
    """Focal box stats (operators/focal.py): cross-tile (2r+1)² box
    sums over the _DIFF_A 4×2 block — interior tiles take real halos
    from up to 8 neighbors, boundary tiles fall back to edge
    replication, and the surrounding ring surfaces as status='no_tile'.
    FULLY oracled: the oracle builder recomputes every tile's canvas
    from the FIXTURES pixel formula by direct neighbor-pixel indexing
    (independent of the operator's strip-shipping), integral-images it,
    and inlines the integer leaf stats; -1 sentinels for the ring rows
    per the float/NULL policy."""
    import tempfile

    from tilegrab_spark.operators.focal import focal_box_stats
    from tilegrab_spark.sources.images import (
        read_image_table,
        write_synthetic_image_table,
    )

    tmp = tempfile.mkdtemp()
    write_synthetic_image_table(spark, f"{tmp}/imgs", _DIFF_A, n_buckets=2)
    stats = focal_box_stats(read_image_table(spark, f"{tmp}/imgs"), radius=1)
    x = F.shiftrightunsigned("key", 29).bitwiseAND(F.lit((1 << 29) - 1))
    y = F.col("key").bitwiseAND(F.lit((1 << 29) - 1))
    return stats.select(
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
        "status",
        F.coalesce("n_px", F.lit(-1)).cast("long").alias("n_px"),
        F.coalesce("box_sum", F.lit(-1)).cast("long").alias("box_sum"),
        F.coalesce("box_min", F.lit(-1)).cast("int").alias("box_min"),
        F.coalesce("box_max", F.lit(-1)).cast("int").alias("box_max"),
    )


def _focal_sql() -> str:
    import numpy as np

    from tilegrab_spark.kernels.png import synth_tile_pixels

    cells = {(x, y) for (_z, x, y, _s) in _DIFF_A}
    rows = []
    for (x, y) in sorted(cells):
        canvas = np.pad(
            synth_tile_pixels(x, y, 16, 0), ((1, 1), (1, 1), (0, 0)), mode="edge"
        )
        for sy in (-1, 0, 1):
            for sx in (-1, 0, 1):
                if (sx, sy) == (0, 0) or (x + sx, y + sy) not in cells:
                    continue
                nb = synth_tile_pixels(x + sx, y + sy, 16, 0)
                ys = slice(0, 1) if sy < 0 else slice(257, 258) if sy > 0 else slice(1, 257)
                xs = slice(0, 1) if sx < 0 else slice(257, 258) if sx > 0 else slice(1, 257)
                nys = slice(255, 256) if sy < 0 else slice(0, 1) if sy > 0 else slice(0, 256)
                nxs = slice(255, 256) if sx < 0 else slice(0, 1) if sx > 0 else slice(0, 256)
                canvas[ys, xs] = nb[nys, nxs]
        chan = canvas.max(axis=2).astype(np.int64)
        S = np.zeros((259, 259), dtype=np.int64)
        S[1:, 1:] = chan.cumsum(0).cumsum(1)
        box = S[3:, 3:] - S[:-3, 3:] - S[3:, :-3] + S[:-3, :-3]
        rows.append(
            (x, y, "ok", box.size, int(box.sum()), int(box.min()), int(box.max()))
        )
    ring = sorted(
        {
            (x + dx, y + dy)
            for (x, y) in cells
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        }
        - cells
    )
    rows += [(x, y, "no_tile", -1, -1, -1, -1) for (x, y) in ring]
    vals = ", ".join(
        f"({x}, {y}, '{st}', {n}, {s}, {mn}, {mx})"
        for (x, y, st, n, s, mn, mx) in rows
    )
    return f"""
WITH leaf(x, y, status, n_px, box_sum, box_min, box_max) AS (VALUES {vals})
SELECT CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y, status,
       CAST(n_px AS BIGINT) AS n_px, CAST(box_sum AS BIGINT) AS box_sum,
       CAST(box_min AS INTEGER) AS box_min, CAST(box_max AS INTEGER) AS box_max
FROM leaf
"""


def _shard_pack(spark, sf):
    """Shard packing (operators/packing.py::pack_shards): distributed
    two-level prefix sum over the doc_id order — the training-export
    layout step. FULLY oracled: DuckDB re-derives every global byte
    offset with one SUM() OVER and the shard assignment with integer
    division; matching 500 offsets proves the range-partition + local
    window + broadcast partition-offset composition loses nothing."""
    from tilegrab_spark.operators.packing import pack_shards

    d = _t(spark, sf, "documents").select("doc_id", "n_chars")
    return pack_shards(
        d, size_col="n_chars", order_col="doc_id", shard_bytes=16384
    ).select("doc_id", "start_offset", "shard_id")


_SHARD_PACK_SQL = """
SELECT doc_id,
       CAST(SUM(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) - n_chars AS BIGINT) AS start_offset,
       CAST((SUM(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) - n_chars) // 16384 AS BIGINT) AS shard_id
FROM documents
"""


_EXPORT_FRACTIONS = {"en": 0.6, "de": 1.0, "es": 0.5, "zh": 0.4, "fr": 0.3}


def _export_pipeline(spark, sf):
    """The composed training-export pipeline: quality gate (text.py) →
    per-language deterministic sample (sampling.py) → shard packing
    (packing.py) → per-shard manifest. Every stage is individually
    oracled elsewhere; this query pins the COMPOSITION end-to-end —
    DuckDB re-derives the quality score, the sampling hash + thresholds,
    the prefix-sum offsets and the manifest rollup in one SQL chain."""
    from tilegrab_spark.operators.packing import pack_shards, shard_manifest
    from tilegrab_spark.operators.sampling import stratified_sample
    from tilegrab_spark.operators.text import with_quality_score

    d = _t(spark, sf, "documents")
    q = with_quality_score(d).filter(F.col("quality") >= 0.75)
    s = stratified_sample(
        q.select("doc_id", "lang", "n_chars"),
        id_col="doc_id",
        fractions=_EXPORT_FRACTIONS,
        stratum_col="lang",
        salt="export",
    )
    packed = pack_shards(
        s, size_col="n_chars", order_col="doc_id", shard_bytes=8192
    )
    return shard_manifest(packed, size_col="n_chars", order_col="doc_id").select(
        "shard_id", "n_items", "bytes", "first_key", "last_key"
    )


def _export_pipeline_sql() -> str:
    space = 1 << 60
    cases = " ".join(
        f"WHEN '{k}' THEN {int(v * space)}"
        for k, v in sorted(_EXPORT_FRACTIONS.items())
    )
    quality_base = r"""
  SELECT d.doc_id, d.lang, d.n_chars,
    (CASE WHEN n_tokens >= 5 THEN 0.25 ELSE 0.0 END
     + CASE WHEN n_tokens > 0 AND (CAST(len_chars AS DOUBLE)/n_tokens) BETWEEN 3 AND 12 THEN 0.25 ELSE 0.0 END
     + CASE WHEN (CASE WHEN len_chars > 0 THEN CAST(n_punct AS DOUBLE)/len_chars ELSE 0.0 END) <= 0.2 THEN 0.25 ELSE 0.0 END
     + CASE WHEN (CASE WHEN n_tokens > 0 THEN n_stop ELSE 0 END) >= 1 THEN 0.25 ELSE 0.0 END) AS quality
  FROM (
    SELECT doc_id, lang, n_chars, length(text) AS len_chars,
      CASE WHEN length(trim(text)) = 0 THEN 0
           ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS n_tokens,
      length(regexp_replace(text, '[^\.,;:!\?"'']', '', 'g')) AS n_punct,
      len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\s+')),
          ['the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','with','for','on','as','at','by'])) AS n_stop
    FROM documents) d
"""
    return f"""
WITH q AS ({quality_base}),
kept AS (
  SELECT doc_id, lang, n_chars FROM q
  WHERE quality >= 0.75
    AND ('0x' || substr(md5(doc_id::VARCHAR || 'export'), 1, 15))::BIGINT
        < CASE lang {cases} ELSE 0 END
),
off AS (
  SELECT doc_id, n_chars,
         CAST(SUM(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) - n_chars AS BIGINT) AS so
  FROM kept
)
SELECT so // 8192 AS shard_id, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(n_chars) AS BIGINT) AS bytes,
       MIN(doc_id) AS first_key, MAX(doc_id) AS last_key
FROM off GROUP BY 1
"""


_SAMPLE_FRACTIONS = {"en": 0.5, "de": 0.8, "zh": 0.25, "fr": 0.0}


def _stratified_sampling(spark, sf):
    """Both stratified-sampling operators in ONE contract row (driver
    window economy), union-tagged by variant:

    - ``rate``: deterministic per-stratum rate sampling
      (operators/sampling.py::stratified_sample): keep iff
      md5-60-bit-hash(doc_id||salt) < fraction * 2^60 per lang — a pure
      map-side filter. 'es' is deliberately unlisted ->
      default_fraction=1.0 keeps it all.
    - ``topn``: exact per-stratum quota by deterministic hash order
      (operators/sampling.py::stratified_topn).
    - ``weighted``: global weighted sample without replacement
      (operators/sampling.py::weighted_sample — Efraimidis–Spirtas
      A-ES bottom-k on the race key ``-ln((hash+1)/2^60)/w`` with
      w = length(text)).

    FULLY oracled: DuckDB recomputes the same hash, the same integer
    thresholds (precomputed so float->int truncation can't diverge),
    the row_number cut, and the full exponential race (hash -> u ->
    -ln(u)/w -> bottom-k) independently."""
    from tilegrab_spark.operators.sampling import (
        stratified_sample,
        stratified_topn,
        weighted_sample,
    )

    d = _t(spark, sf, "documents").select("doc_id", "lang")
    rate = stratified_sample(
        d,
        id_col="doc_id",
        fractions=_SAMPLE_FRACTIONS,
        stratum_col="lang",
        default_fraction=1.0,
        salt="contract",
    ).select(
        "doc_id",
        "lang",
        F.lit(-1).cast("long").alias("sample_rank"),
        F.lit("rate").alias("variant"),
    )
    topn = stratified_topn(
        d, id_col="doc_id", stratum_col="lang", n=25, salt="contract"
    ).select(
        "doc_id",
        "lang",
        F.col("sample_rank").cast("long").alias("sample_rank"),
        F.lit("topn").alias("variant"),
    )
    dw = _t(spark, sf, "documents").select(
        "doc_id", "lang", F.length("text").cast("double").alias("w")
    )
    weighted = weighted_sample(dw, id_col="doc_id", weight_col="w", k=40).select(
        "doc_id",
        "lang",
        F.col("sample_rank").cast("long").alias("sample_rank"),
        F.lit("weighted").alias("variant"),
    )
    return rate.unionByName(topn).unionByName(weighted)


def _stratified_sampling_sql() -> str:
    space = 1 << 60
    cases = " ".join(
        f"WHEN '{k}' THEN {int(v * space)}"
        for k, v in sorted(_SAMPLE_FRACTIONS.items())
    )
    return f"""
SELECT doc_id, lang, -1::BIGINT AS sample_rank, 'rate' AS variant
FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR || 'contract'), 1, 15))::BIGINT
      < CASE lang {cases} ELSE {space} END
UNION ALL
SELECT doc_id, lang, sample_rank, 'topn' AS variant FROM (
  SELECT doc_id, lang,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || 'contract'), 1, 15))::BIGINT,
                    doc_id) AS BIGINT) AS sample_rank
  FROM documents)
WHERE sample_rank <= 25
UNION ALL
SELECT doc_id, lang, sample_rank, 'weighted' AS variant FROM (
  SELECT doc_id, lang, CAST(row_number() OVER (ORDER BY ekey, doc_id) AS BIGINT)
         AS sample_rank
  FROM (
    SELECT doc_id, lang,
           -ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT + 1)
                / {float(space)}) / length(text) AS ekey
    FROM documents WHERE length(text) > 0)
) WHERE sample_rank <= 40
"""


def _lang_id_sql() -> str:
    """DuckDB re-derivation of the lang-ID heuristic, generated from the
    SAME marker table the Arrow UDF uses (operators/text.py) so the two
    can't drift: marker hit counts via replace-length arithmetic, CJK
    ratio via regexp_replace, first-max-wins argmax (pandas idxmax
    order), en fallback when all scores are zero."""
    from tilegrab_spark.operators.text import _LANG_MARKERS

    def cnt(m: str) -> str:
        esc = m.replace("'", "''")
        return f"(length(low) - length(replace(low, '{esc}', ''))) / {len(m)}"

    score = {
        lang: "+".join(cnt(m) for m in marks)
        for lang, marks in _LANG_MARKERS.items()
        if marks
    }
    return f"""
WITH base AS (
  SELECT doc_id, lower(text) AS low,
         greatest(length(text), 1)::DOUBLE AS n,
         length(regexp_replace(text, '[^一-鿿]', '', 'g'))::DOUBLE AS cjk_n
  FROM documents
),
s AS (
  SELECT doc_id,
         ({score['en']})::DOUBLE / n AS s_en, ({score['es']})::DOUBLE / n AS s_es,
         ({score['de']})::DOUBLE / n AS s_de, ({score['fr']})::DOUBLE / n AS s_fr,
         cjk_n / n AS cjk
  FROM base
)
SELECT doc_id,
  CASE WHEN cjk >= 0.2 THEN 'zh'
       WHEN greatest(s_en, s_es, s_de, s_fr) <= 0 THEN 'en'
       WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
       WHEN s_de >= s_fr THEN 'de'
       ELSE 'fr' END AS lang_pred
FROM s
"""


def _text_fingerprints(spark, sf):
    """Document fingerprinting in ONE contract row (driver window
    economy), two independent signature families exploded to the same
    (doc_id, i, v) scalar shape and tagged by variant:

    - ``winnow``: winnowed Rabin-Karp fingerprints. The oracle
      re-derives the whole thing in SQL: UTF-8 bytes via hex-of-blob,
      every 16-byte rolling window as a sum of byte*B^k products in
      HUGEINT (powers of B mod 2^64 inlined from the same constants),
      unsigned-order winnowing to the 8 smallest.
    - ``minhash``: MinHash signatures (the math under
      minhash_lsh_pairs). The oracle re-derives shingling, the
      md5-low-63-bit shingle hash, and all 16 (a*h+b) mod (2^61-1)
      permutations with HUGEINT arithmetic — permutation constants
      inlined from the SAME _perm_params(seed=42) the UDF uses."""
    from tilegrab_spark.operators.dedup import with_minhash, with_shingles
    from tilegrab_spark.operators.text import with_fingerprint

    # both engines fingerprint the same 4096-CHAR prefix (substr semantics
    # are char-based in Spark and DuckDB alike), which bounds the oracle's
    # byte expansion at 4*4096 regardless of corpus — no silent divergence
    # on long documents
    d = _t(spark, sf, "documents")
    wn = (
        with_fingerprint(d.withColumn("text", F.substring("text", 1, 4096)))
        .select("doc_id", F.posexplode("fingerprint").alias("i", "v"))
        .withColumn("variant", F.lit("winnow"))
    )
    mh = (
        with_minhash(with_shingles(d.filter(F.col("doc_id") < 100)), num_hashes=16)
        .select("doc_id", F.posexplode("minhash").alias("i", "v"))
        .withColumn("variant", F.lit("minhash"))
    )
    return wn.unionByName(mh)


def _fingerprint_sql() -> str:
    B, M = 1000003, 1 << 64
    pw = ",".join(str(pow(B, k, M)) for k in range(16))
    return f"""
WITH docs AS (
  -- same 4096-char prefix as the Spark side; 16384 bytes = the UTF-8
  -- worst case, so the fixed series bound below can never truncate
  SELECT doc_id, hex(encode(substr(text, 1, 4096))) AS hx,
         octet_length(encode(substr(text, 1, 4096))) AS n
  FROM documents
),
bytes AS (
  SELECT doc_id, n, g.generate_series AS pos,
         ('0x' || substr(hx, 2*g.generate_series - 1, 2))::INTEGER AS b
  FROM docs, generate_series(1, 16384) g WHERE g.generate_series <= n
),
pw(p, k) AS (SELECT unnest([{pw}]), generate_subscripts([{pw}], 1) - 1),
win AS (
  SELECT b.doc_id, b.pos - 15 + p.k AS j,
         SUM(b.b::HUGEINT * p.p::HUGEINT) AS acc
  FROM bytes b JOIN pw p
    ON b.pos - 15 + p.k >= 1 AND b.pos - 15 + p.k <= b.n - 15
  WHERE b.n >= 16
  GROUP BY b.doc_id, b.pos - 15 + p.k
  HAVING COUNT(*) = 16
),
short AS (
  SELECT b.doc_id, 1 AS j, SUM(b.b::HUGEINT * p.p::HUGEINT) AS acc
  FROM bytes b JOIN pw p ON p.k = b.n - b.pos
  WHERE b.n < 16 AND b.n > 0
  GROUP BY b.doc_id
),
hashes AS (
  SELECT doc_id, (acc % 18446744073709551616::HUGEINT) AS hu FROM win
  UNION ALL SELECT doc_id, (acc % 18446744073709551616::HUGEINT) FROM short
),
sig AS (
  SELECT doc_id,
         (hu - CASE WHEN hu >= 9223372036854775808::HUGEINT
                    THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)::BIGINT AS v,
         row_number() OVER (PARTITION BY doc_id ORDER BY hu) AS rk
  FROM (SELECT DISTINCT doc_id, hu FROM hashes)
)
SELECT doc_id, (rk - 1)::INTEGER AS i, v FROM sig WHERE rk <= 8
"""


_REPETITION_SQL = r"""
WITH lines AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)), l -> length(trim(l)) > 0) AS ls
  FROM documents),
base AS (
  SELECT doc_id, len(ls)::INTEGER AS n_lines,
         CASE WHEN len(ls) > 0
              THEN (len(ls) - len(list_distinct(ls)))::DOUBLE / len(ls)
              ELSE 0.0 END AS dup_line_frac
  FROM lines),
words AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            w -> w <> '')) AS w
  FROM documents),
pw AS (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w),
top AS (SELECT doc_id, MAX(c)::DOUBLE / SUM(c)::DOUBLE AS twf FROM pw GROUP BY doc_id)
SELECT b.doc_id, b.n_lines, b.dup_line_frac, COALESCE(t.twf, 0.0) AS top_word_frac
FROM base b LEFT JOIN top t ON b.doc_id = t.doc_id
"""


def _clean_scrub(spark, sf):
    """Cleaning + PII scrub over documents salted with deterministic PII
    (a subset gets an email+phone suffix derived from doc_id, built
    identically in both engines so the regexes exercise real matches)."""
    from tilegrab_spark.operators.text import with_clean_text, with_pii_scrubbed

    d = _t(spark, sf, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact: user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or +1-555-123-4567"),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    return with_pii_scrubbed(with_clean_text(d)).select(
        "doc_id", "clean_text", "n_emails", "n_phones", "scrubbed"
    )


def _clean_scrub_sql() -> str:
    from tilegrab_spark.operators.text import _CONTROL_RE, EMAIL_RE, PHONE_BOUNDED_RE

    email = EMAIL_RE.replace("'", "''")
    phone = PHONE_BOUNDED_RE.replace("'", "''")
    return f"""
WITH salted AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 7 = 0
                      THEN ' contact: user' || doc_id || '@example.com or +1-555-123-4567'
                      ELSE '' END AS text
  FROM documents)
, s1 AS (
  SELECT doc_id, text,
         regexp_replace(text, '{email}', '<EMAIL>', 'g') AS em
  FROM salted)
, s2 AS (
  SELECT *, regexp_replace(em, '{phone}', '\\1<PHONE>\\3', 'g') AS p1
  FROM s1)
SELECT doc_id,
  trim(regexp_replace(regexp_replace(text, '{_CONTROL_RE}', '', 'g'),
                      '[ \\t]+', ' ', 'g')) AS clean_text,
  len(regexp_extract_all(text, '{email}'))::INTEGER AS n_emails,
  (len(regexp_extract_all(em, '{phone}'))
   + len(regexp_extract_all(p1, '{phone}')))::INTEGER AS n_phones,
  regexp_replace(p1, '{phone}', '\\1<PHONE>\\3', 'g') AS scrubbed
FROM s2
"""


def _cc_islands(spark, sf):
    """Distributed connected components on chain edges (consecutive
    doc_ids sharing a lang). Oracle: gaps-and-islands window SQL — the
    closed form of the same components."""
    from tilegrab_spark.operators.components import connected_components

    d = _t(spark, sf, "documents").select("doc_id", "lang")
    a, b = d.alias("a"), d.alias("b")
    edges = a.join(
        b,
        (F.col("b.doc_id") == F.col("a.doc_id") + 1)
        & (F.col("a.lang") == F.col("b.lang")),
    ).select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    return connected_components(edges)


_CC_SQL = """
WITH m AS (
  SELECT doc_id, lang,
    CASE WHEN lag(lang) OVER (ORDER BY doc_id) = lang THEN 0 ELSE 1 END AS brk
  FROM documents),
i AS (SELECT doc_id, SUM(brk) OVER (ORDER BY doc_id) AS island FROM m),
c AS (SELECT doc_id,
        MIN(doc_id) OVER (PARTITION BY island) AS component,
        COUNT(*) OVER (PARTITION BY island) AS sz
      FROM i)
SELECT doc_id AS node, component FROM c WHERE sz > 1
"""


# The reference's own golden shape-refined tile set for T.geojson at z=16
# (FIXTURES.md §4 / reference tests) — the one non-SQL-expressible input
# (point-in-polygon refine) to the mosaic oracle below.
_T_SHAPE_Z16 = [
    (47439, 31441), (47440, 31441), (47440, 31442), (47440, 31443),
    (47440, 31444), (47441, 31441), (47442, 31441),
]


def _mosaic_meta(spark, sf):
    """The flagship image pipeline on a small deterministic table
    (synthesized under /tmp per call): select-join-stitch. FULLY oracled:
    group metadata is re-derived in SQL from the golden tile set, and
    ``pixel_md5`` — the md5 of the DECODED mosaic pixel buffer — is
    matched against an independent numpy reference paste (the sequential
    decode→paste loop in the exact shape of the reference's
    images/mosaic.py:7-27) computed inside _mosaic_pixels_sql()."""
    import hashlib
    import tempfile

    from tilegrab_spark.operators.image_join import join_images
    from tilegrab_spark.operators.mosaic import mosaic
    from tilegrab_spark.operators.tiles import tiles_for
    from tilegrab_spark.sources.geometries import geometry_from_geojson
    from tilegrab_spark.sources.images import (
        read_image_table,
        write_synthetic_image_table,
    )

    geom = geometry_from_geojson("/root/reference/tests/data/T.geojson", "T")
    tiles = tiles_for(spark, geom, 16, by="shape")
    path = tempfile.mkdtemp() + "/images"
    cells = [(16, x, y, 0) for x in range(47439, 47443) for y in range(31441, 31445)]
    write_synthetic_image_table(spark, path, cells, n_buckets=4)
    joined = join_images(tiles, read_image_table(spark, path).drop("cell_id"))

    @F.pandas_udf("string")
    def pix_md5(bs: pd.Series) -> pd.Series:
        from tilegrab_spark.kernels.png import decode_png

        return pd.Series(
            [hashlib.md5(decode_png(bytes(b)).tobytes()).hexdigest() for b in bs]
        )

    return mosaic(joined, group_w=2, group_h=2, full_groups_only=False).select(
        "geom_id", "z", "gx", "gy", "tminx", "tminy", "w", "h", "n_tiles",
        pix_md5(F.col("bytes")).alias("pixel_md5"),
    )


def _mosaic_pixels_sql() -> str:
    """Group metadata derived in SQL from the golden tile VALUES; pixel
    md5s computed here by an INDEPENDENT row-at-a-time numpy paste over
    the same deterministic synthetic pixels (kernels/png.py::
    synth_tile_pixels — the fixture contract, FIXTURES.md §2)."""
    import hashlib

    import numpy as np

    from tilegrab_spark.kernels.png import synth_tile_pixels

    ax = min(x for x, _ in _T_SHAPE_Z16)
    ay = min(y for _, y in _T_SHAPE_Z16)
    groups: dict = {}
    for x, y in _T_SHAPE_Z16:
        groups.setdefault(((x - ax) // 2, (y - ay) // 2), []).append((x, y))
    md5_vals = []
    for (gx, gy), tl in sorted(groups.items()):
        canvas = np.zeros((512, 512, 3), np.uint8)
        for x, y in tl:
            ox, oy = (x - (ax + gx * 2)) * 256, (y - (ay + gy * 2)) * 256
            canvas[oy : oy + 256, ox : ox + 256] = synth_tile_pixels(x, y, 16, 0)
        md5_vals.append(
            f"({gx}, {gy}, '{hashlib.md5(canvas.tobytes()).hexdigest()}')"
        )
    tile_vals = ", ".join(f"({x}, {y})" for x, y in _T_SHAPE_Z16)
    return f"""
WITH tiles(x, y) AS (VALUES {tile_vals}),
ext AS (SELECT MIN(x) AS ax, MIN(y) AS ay FROM tiles),
g AS (
  SELECT CAST(floor((x - ax) / 2.0) AS INT) AS gx,
         CAST(floor((y - ay) / 2.0) AS INT) AS gy,
         MIN(ax) AS ax, MIN(ay) AS ay, COUNT(*) AS n
  FROM tiles, ext GROUP BY 1, 2
),
px(gx, gy, pixel_md5) AS (VALUES {", ".join(md5_vals)})
SELECT 'T' AS geom_id, 16 AS z, g.gx, g.gy,
       (ax + g.gx * 2)::BIGINT AS tminx, (ay + g.gy * 2)::BIGINT AS tminy,
       512 AS w, 512 AS h, CAST(n AS INT) AS n_tiles, px.pixel_md5
FROM g JOIN px ON g.gx = px.gx AND g.gy = px.gy
"""


def _text_fingerprints_sql() -> str:
    return f"""
SELECT doc_id, i, v, 'winnow' AS variant FROM ({_fingerprint_sql()})
UNION ALL
SELECT doc_id, i, v, 'minhash' AS variant FROM ({_minhash_sql()})
"""


def _minhash_sql() -> str:
    from tilegrab_spark.operators.dedup import _MERSENNE, _perm_params

    a, b = _perm_params(16)
    av = ",".join(str(int(v)) for v in a)
    bv = ",".join(str(int(v)) for v in b)
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS t
  FROM documents WHERE doc_id < 100
),
sh AS (
  SELECT doc_id, CASE WHEN len(t) >= 3
    THEN list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)])
    ELSE [array_to_string(t, ' ')] END AS shingles
  FROM toks
),
hh AS (
  SELECT doc_id,
         (('0x' || substr(md5(s), 1, 16))::UBIGINT
          & 9223372036854775807::UBIGINT)::HUGEINT AS h
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
),
perms AS (
  SELECT unnest([{av}]) AS a, unnest([{bv}]) AS b,
         (generate_subscripts([{av}], 1) - 1)::INTEGER AS i
)
SELECT doc_id, i, MIN((a::HUGEINT * h + b::HUGEINT) % {_MERSENNE})::BIGINT AS v
FROM perms, hh GROUP BY doc_id, i
"""


def _sessionize(spark, sf):
    """Gaps-and-islands sessionization of the events table (30-min gap):
    lag + flag + running sum, rolled up per session. Epoch-microsecond
    ints keep the cross-engine value hash exact."""
    from tilegrab_spark.operators.sessions import session_summary

    return session_summary(_t(spark, sf, "events"), gap_minutes=30.0)


_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, value, ts_us,
         (SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS UNBOUNDED PRECEDING) - 1)::INTEGER AS session_idx
  FROM flagged
)
SELECT user_id, session_idx, COUNT(*) AS n_events,
       MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
       (SUM(value::DECIMAL(25,6)))::DOUBLE AS sum_value
FROM sess GROUP BY user_id, session_idx
"""


def _hll_sketch(spark, sf):
    """Mergeable HLL distinct sketch (operators/sketches.py) — per-
    priority distinct-customer registers collapsed to integer scalars.
    The oracle re-derives the ENTIRE sketch in SQL — md5-low-8 hash,
    bucket split, trailing-zero rank, per-bucket MAX, zero-bucket count
    and the 2^40-scaled harmonic denominator — so every register the
    estimator consumes is pinned, not just the estimate. (The double
    estimate itself is exercised in test_sketches.py; integers here per
    the float-determinism policy above.)"""
    from tilegrab_spark.operators.sketches import hll_distinct

    return hll_distinct(
        _t(spark, sf, "orders"),
        key_col="o_custkey",
        group_cols=["o_orderpriority"],
        p=8,
    ).select("o_orderpriority", "zeros", "sum_rho", "harm_s40")


_HLL_SQL = """
WITH h AS (
  SELECT o_orderpriority,
         ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 16))::UBIGINT AS u
  FROM orders
),
br AS (
  SELECT o_orderpriority,
         (u & 255::UBIGINT)::BIGINT AS bucket,
         (u >> 8)::BIGINT AS w
  FROM h
),
rr AS (
  SELECT o_orderpriority, bucket,
         MAX(CASE WHEN w = 0 THEN 57
             ELSE bit_count(((w & (-w)) - 1)::BIGINT) + 1 END)::BIGINT AS rho
  FROM br GROUP BY o_orderpriority, bucket
)
SELECT o_orderpriority,
       (256 - COUNT(*))::BIGINT AS zeros,
       SUM(rho)::BIGINT AS sum_rho,
       (SUM(CASE WHEN rho <= 40 THEN (1::BIGINT << (40 - rho)::INTEGER) ELSE 0::BIGINT END)
        + (256 - COUNT(*)) * (1::BIGINT << 40))::BIGINT AS harm_s40
FROM rr GROUP BY o_orderpriority
"""


def _range_join_bands(spark, sf):
    """Bucketized range join (operators/rangejoin.py): lineitem prices
    vs 140 OVERLAPPING price bands (so this is a genuine inequality
    join, not bucketing), rolled up per band. The oracle does the naive
    ``p >= lo AND p < hi`` inequality join in DuckDB — independent of
    the bucket rewrite — which also proves the exactly-once pair
    emission. Integer dollars via floor() on both engines; quantity sum
    through the DECIMAL cast per the float policy."""
    from tilegrab_spark.operators.rangejoin import range_join

    li = _t(spark, sf, "lineitem").select(
        F.floor("l_extendedprice").alias("price_d"), "l_quantity"
    )
    bands = spark.range(0, 140).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 800).cast("double").alias("lo"),
        (F.col("id") * 800 + 1200).cast("double").alias("hi"),
    )
    j = range_join(
        li, bands, point_col="price_d", lo_col="lo", hi_col="hi",
        bucket_width=1000, closed="left",
    )
    return j.groupBy("band_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        _dsum(F.col("l_quantity"), 2).alias("sum_qty"),
    )


_RANGE_JOIN_SQL = """
WITH bands AS (
  SELECT i AS band_id, (i * 800)::DOUBLE AS lo, (i * 800 + 1200)::DOUBLE AS hi
  FROM range(0, 140) t(i)
),
pts AS (
  SELECT FLOOR(l_extendedprice)::BIGINT AS price_d, l_quantity FROM lineitem
)
SELECT band_id, COUNT(*)::BIGINT AS n_items,
       (SUM(l_quantity::DECIMAL(25,2)))::DOUBLE AS sum_qty
FROM pts JOIN bands ON price_d >= lo AND price_d < hi
GROUP BY band_id
"""


def _incremental_hll(spark, sf):
    """Incremental sketch store (streaming/sketch_stream.py): documents
    ingested as TWO batches into a snapshot-backed HLL register table,
    then folded — and the oracle recomputes the registers in ONE SQL
    pass over the whole table. Equality proves delta ingest + per-bucket
    MAX fold ≡ batch recompute, end to end through the snapshot layer."""
    import tempfile

    from tilegrab_spark.streaming.sketch_stream import SketchStore

    docs = _t(spark, sf, "documents")
    tmp = tempfile.mkdtemp(prefix="tg_hllstore_")
    store = SketchStore(
        spark, f"{tmp}/store", kind="hll", key_col="doc_id",
        group_cols=["lang"], p=8,
    )
    store.ingest_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
    store.ingest_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
    return store.distinct_summary().select("lang", "zeros", "sum_rho", "harm_s40")


_INCR_HLL_SQL = """
WITH h AS (
  SELECT lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT AS u
  FROM documents
),
br AS (
  SELECT lang, (u & 255::UBIGINT)::BIGINT AS bucket, (u >> 8)::BIGINT AS w FROM h
),
rr AS (
  SELECT lang, bucket,
         MAX(CASE WHEN w = 0 THEN 57
             ELSE bit_count(((w & (-w)) - 1)::BIGINT) + 1 END)::BIGINT AS rho
  FROM br GROUP BY lang, bucket
)
SELECT lang,
       (256 - COUNT(*))::BIGINT AS zeros,
       SUM(rho)::BIGINT AS sum_rho,
       (SUM(CASE WHEN rho <= 40 THEN (1::BIGINT << (40 - rho)::INTEGER) ELSE 0::BIGINT END)
        + (256 - COUNT(*)) * (1::BIGINT << 40))::BIGINT AS harm_s40
FROM rr GROUP BY lang
"""


def _cms_counts(spark, sf):
    """Count-min sketch (operators/sketches.py): per-user event
    frequency estimated from d=4 × w=256 counters — the distinct-user
    set shares 256 buckets, so bucket collisions (the overcount
    semantics) are exercised, not just the happy path. The oracle
    re-derives the
    registers AND the min-over-rows estimates entirely in SQL from the
    same row-salted md5 hash contract."""
    from tilegrab_spark.operators.sketches import cms_estimate, cms_sketch

    ev = _t(spark, sf, "events")
    regs = cms_sketch(ev, key_col="user_id", d=4, w=256)
    return cms_estimate(regs, ev, key_col="user_id", d=4, w=256)


_CMS_SQL = """
WITH regs AS (
  SELECT i AS ri,
         (('0x' || substr(md5(CAST(user_id AS VARCHAR) || chr(31) || CAST(i AS VARCHAR)), 1, 15))::BIGINT & 255) AS bucket,
         COUNT(*)::BIGINT AS cnt
  FROM events, range(0, 4) t(i)
  GROUP BY 1, 2
),
pp AS (
  SELECT user_id, i AS ri,
         (('0x' || substr(md5(CAST(user_id AS VARCHAR) || chr(31) || CAST(i AS VARCHAR)), 1, 15))::BIGINT & 255) AS bucket
  FROM (SELECT DISTINCT user_id FROM events), range(0, 4) t(i)
)
SELECT p.user_id, MIN(COALESCE(r.cnt, 0))::BIGINT AS est_cnt
FROM pp p LEFT JOIN regs r ON p.ri = r.ri AND p.bucket = r.bucket
GROUP BY p.user_id
"""


def _kmv_sketch_ops(spark, sf):
    """The whole KMV surface in ONE contract row (driver window
    economy): per-event-type bottom-k sketches (the state IS the output:
    the k smallest md5-low-15-hex hashes with ranks — pinning the hash
    contract, distinct, per-group bottom-k ranking, AND the salted
    skew-bounding pre-top-k rewrite via prefilter_buckets=8) union-tagged
    with the set-operation path (kmv_merge + kmv_set_estimates): overlap
    evidence between the sketched viewer and clicker user sets, encoded
    as one extra row (event_type='overlap:view,click', pos=n_merged,
    h=n_both). Round 4 adds the BLOOM FILTER variants on the same
    (variant, pos, h) shape: 'bloom:view' rows ARE the register table
    over viewer user_ids (pos=word_idx, h=the int64 word — pinning the
    k-position md5 contract and the bit_or build end-to-end), and
    'bloom_probe:click' is the probe summary (pos=#maybe-present
    distinct clickers, h=#definitely-absent) — pinning the full probe
    path incl. the no-false-negative guarantee relationally. Everything
    integer, re-derived in SQL end-to-end; float estimates are
    pytest-covered per the float policy."""
    from tilegrab_spark.operators.bloom import bloom_build, bloom_probe
    from tilegrab_spark.operators.sketches import kmv_set_estimates, kmv_sketch

    ev = _t(spark, sf, "events")
    sk = kmv_sketch(
        ev, key_col="user_id", group_cols=["event_type"], k=16, prefilter_buckets=8
    ).select("event_type", F.col("pos").cast("int").alias("pos"), "h")
    a = kmv_sketch(
        ev.filter(F.col("event_type") == "view"), key_col="user_id", k=16
    )
    b = kmv_sketch(
        ev.filter(F.col("event_type") == "click"), key_col="user_id", k=16
    )
    ov = kmv_set_estimates(a, b, k=16).select(
        F.lit("overlap:view,click").alias("event_type"),
        F.col("n_merged").cast("int").alias("pos"),
        F.col("n_both").cast("long").alias("h"),
    )
    views = ev.filter(F.col("event_type") == "view")
    sketch = bloom_build(views, "user_id", m_bits=512, k_hashes=3)
    bl = sketch.select(
        F.lit("bloom:view").alias("event_type"),
        F.col("word_idx").cast("int").alias("pos"),
        F.col("bits").alias("h"),
    )
    clickers = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id")
        .distinct()
    )
    pr = (
        bloom_probe(clickers, sketch, "user_id", m_bits=512, k_hashes=3)
        .agg(
            F.sum(F.col("maybe_present").cast("int")).cast("int").alias("pos"),
            F.sum((~F.col("maybe_present")).cast("int")).cast("long").alias("h"),
        )
        .select(F.lit("bloom_probe:click").alias("event_type"), "pos", "h")
    )
    return sk.unionByName(ov).unionByName(bl).unionByName(pr)


_KMV_OPS_SQL = """
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
),
r AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS pos
  FROM h
),
ha AS (
  SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE event_type = 'view'
),
hb AS (
  SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE event_type = 'click'
),
sa AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM ha) WHERE rn <= 16),
sb AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM hb) WHERE rn <= 16),
m AS (
  SELECT h FROM (
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
    FROM (SELECT h FROM sa UNION SELECT h FROM sb)
  ) WHERE rn <= 16
)
SELECT event_type, pos::INTEGER AS pos, h FROM r WHERE pos <= 16
UNION ALL
SELECT 'overlap:view,click' AS event_type,
       COUNT(*)::INTEGER AS pos,
       SUM(CASE WHEN m.h IN (SELECT h FROM sa) AND m.h IN (SELECT h FROM sb)
           THEN 1 ELSE 0 END)::BIGINT AS h
FROM m
UNION ALL
SELECT 'bloom:view' AS event_type, (bp >> 6)::INTEGER AS pos,
       bit_or(CASE WHEN bp % 64 = 63 THEN -9223372036854775807 - 1
                   ELSE 1::BIGINT << (bp % 64)::INTEGER END) AS h
FROM (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR) || 'bloom' || j::VARCHAR), 1, 15))::BIGINT % 512 AS bp
  FROM events, unnest([0, 1, 2]) AS t(j)
  WHERE event_type = 'view'
)
GROUP BY 1, 2
UNION ALL
SELECT 'bloom_probe:click' AS event_type,
       SUM(maybe)::INTEGER AS pos, SUM(1 - maybe)::BIGINT AS h
FROM (
  SELECT u, MIN(CASE WHEN (COALESCE(regs.bits, 0)
             & (CASE WHEN pp.bp % 64 = 63 THEN -9223372036854775807 - 1
                     ELSE 1::BIGINT << (pp.bp % 64)::INTEGER END)) <> 0
             THEN 1 ELSE 0 END) AS maybe
  FROM (
    SELECT u, ('0x' || substr(md5(CAST(u AS VARCHAR) || 'bloom' || j::VARCHAR), 1, 15))::BIGINT % 512 AS bp
    FROM (SELECT DISTINCT user_id AS u FROM events WHERE event_type = 'click'),
         unnest([0, 1, 2]) AS t(j)
  ) pp
  LEFT JOIN (
    SELECT (bp >> 6) AS w,
           bit_or(CASE WHEN bp % 64 = 63 THEN -9223372036854775807 - 1
                       ELSE 1::BIGINT << (bp % 64)::INTEGER END) AS bits
    FROM (
      SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR) || 'bloom' || j::VARCHAR), 1, 15))::BIGINT % 512 AS bp
      FROM events, unnest([0, 1, 2]) AS t(j)
      WHERE event_type = 'view'
    )
    GROUP BY 1
  ) regs ON regs.w = pp.bp >> 6
  GROUP BY u
)
"""


def _asof_events(spark, sf):
    """As-of join (operators/asof.py): for every purchase, the latest
    click of the same user at or before it (unmatched → NULLs). The
    oracle is DuckDB's NATIVE ``ASOF LEFT JOIN`` — an independent
    implementation of the semantics, not a re-derivation — with the
    same (user, ts) right-dedup contract (greatest payload struct =
    ``ORDER BY click_id DESC``)."""
    from tilegrab_spark.operators.asof import asof_join

    ev = _t(spark, sf, "events")
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts", "value"
    )
    j = asof_join(
        buys, clicks, on="user_id", ts_col="ts", right_cols=["click_id", "value"]
    )
    # unmatched rows stay in the output (left-join semantics) with -1
    # sentinels so every column is exact-typed for the value hash
    return j.select(
        "buy_id",
        "user_id",
        F.coalesce(F.col("click_id"), F.lit(-1).cast("long")).alias("click_id"),
        F.coalesce(F.col("value"), F.lit(-1.0)).alias("click_value"),
        F.coalesce(
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("ts_r").cast("timestamp")),
            F.lit(-1).cast("long"),
        ).alias("lag_us"),
    )


_ASOF_SQL = """
WITH buys AS (
  SELECT event_id AS buy_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT click_id, user_id, ts, value FROM (
    SELECT event_id AS click_id, user_id, ts, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'click'
  ) WHERE rn = 1
)
SELECT b.buy_id, b.user_id,
       COALESCE(c.click_id, -1)::BIGINT AS click_id,
       COALESCE(c.value, -1.0)::DOUBLE AS click_value,
       COALESCE(epoch_us(b.ts) - epoch_us(c.ts), -1)::BIGINT AS lag_us
FROM buys b ASOF LEFT JOIN clicks c
  ON b.user_id = c.user_id AND c.ts <= b.ts
"""


def _mosaic_plan(spark, sf):
    """Metadata-only W1 pipeline, FULLY oracled: bbox cell enumeration,
    J1 join against a generated image table, pre-shuffle group keys,
    extent aggregation and per-group tile counts are all re-derived
    independently in the DuckDB SQL below (nothing hardcoded). Pixels —
    the only non-SQL-expressible part — are covered by mosaic_pipeline
    (rows-only) plus the pixel-oracle tests."""
    import tempfile

    from tilegrab_spark.operators.image_join import join_images
    from tilegrab_spark.operators.mosaic import mosaic
    from tilegrab_spark.operators.tiles import tiles_for
    from tilegrab_spark.sources.geometries import geometry_from_geojson
    from tilegrab_spark.sources.images import (
        read_image_table,
        write_synthetic_image_table,
    )

    geom = geometry_from_geojson("/root/reference/tests/data/T.geojson", "T")
    tiles = tiles_for(spark, geom, 16, by="bbox")
    path = tempfile.mkdtemp() + "/images"
    cells = [(16, x, y, 0) for x in range(47439, 47443) for y in range(31441, 31445)]
    write_synthetic_image_table(spark, path, cells, n_buckets=4)
    joined = join_images(tiles, read_image_table(spark, path).drop("cell_id"))
    return mosaic(joined, group_w=2, group_h=2, full_groups_only=False).select(
        "geom_id", "z", "gx", "gy", "tminx", "tminy", "w", "h", "n_tiles"
    )


_MOSAIC_PLAN_SQL = f"""
WITH corners AS (
  SELECT
    CAST(floor(({T_BBOX[0]} / 360.0 + 0.5 + {EPS}) * 65536.0) AS BIGINT) AS x0,
    CAST(floor((({T_BBOX[2]} - {LL_EPS}) / 360.0 + 0.5 + {EPS}) * 65536.0) AS BIGINT) AS x1,
    CAST(floor((0.5 - 0.25 * ln((1.0 + sin(radians({T_BBOX[3]}))) / (1.0 - sin(radians({T_BBOX[3]})))) / pi() + {EPS}) * 65536.0) AS BIGINT) AS y0,
    CAST(floor((0.5 - 0.25 * ln((1.0 + sin(radians({T_BBOX[1]} + {LL_EPS}))) / (1.0 - sin(radians({T_BBOX[1]} + {LL_EPS})))) / pi() + {EPS}) * 65536.0) AS BIGINT) AS y1
),
tiles AS (
  SELECT x0 + dxs.generate_series AS x, y0 + dys.generate_series AS y
  FROM corners, generate_series(0, 255) dxs, generate_series(0, 255) dys
  WHERE x0 + dxs.generate_series <= x1 AND y0 + dys.generate_series <= y1
),
ext AS (SELECT MIN(x) AS ax, MIN(y) AS ay FROM tiles),
g AS (
  SELECT CAST(floor((x - ax) / 2.0) AS INT) AS gx,
         CAST(floor((y - ay) / 2.0) AS INT) AS gy,
         MIN(ax) AS ax, MIN(ay) AS ay, COUNT(*) AS n
  FROM tiles, ext GROUP BY 1, 2
)
SELECT 'T' AS geom_id, 16 AS z, gx, gy,
       ax + gx * 2 AS tminx, ay + gy * 2 AS tminy,
       512 AS w, 512 AS h, CAST(n AS INT) AS n_tiles
FROM g
"""


def _zonal_stats_t(spark, sf):
    """Exact zonal statistics (operators/zonal.py): per-band pixel
    count/sum/min/max/mean of the T zone over the deterministic 4×4 z16
    raster.  Interior/boundary classification keeps per-pixel masking off
    fully-inside tiles; per-tile partials are algebraic so only tiny
    stat rows shuffle.  FULLY oracled: per-tile masked leaf stats are
    re-derived at oracle-build time from the fixture pixel formula
    (kernels/png.py::synth_tile_pixels, FIXTURES.md §2) + an independent
    textbook ray cast; DuckDB re-derives the zone combine + mean."""
    import tempfile

    from tilegrab_spark.operators.image_join import join_images
    from tilegrab_spark.operators.tiles import enumerate_tiles
    from tilegrab_spark.operators.zonal import zonal_stats
    from tilegrab_spark.sources.geometries import geometry_from_geojson
    from tilegrab_spark.sources.images import (
        read_image_table,
        write_synthetic_image_table,
    )

    geom = geometry_from_geojson("/root/reference/tests/data/T.geojson", "T")
    tiles = enumerate_tiles(spark, geom, 16)
    path = tempfile.mkdtemp() + "/images"
    cells = [(16, x, y, 0) for x in range(47439, 47443) for y in range(31441, 31445)]
    write_synthetic_image_table(spark, path, cells, n_buckets=4)
    joined = join_images(tiles, read_image_table(spark, path).drop("cell_id"))
    return zonal_stats(joined, geom, exact=True)


def _zonal_sql() -> str:
    """Leaf (per-tile, per-band) masked stats computed here with numpy +
    an even-odd ray cast written inline (independent of kernels.geo and
    operators.zonal); the zone-level combine — the relational part — is
    DuckDB's own GROUP BY."""
    import numpy as np

    from tilegrab_spark.kernels.png import synth_tile_pixels
    from tilegrab_spark.sources.geometries import geometry_from_geojson

    geom = geometry_from_geojson("/root/reference/tests/data/T.geojson", "T")
    rings = []
    for poly in geom.polygons:
        for r in poly:
            r = np.asarray(r, np.float64)
            if not (r[0] == r[-1]).all():
                r = np.vstack([r, r[:1]])
            rings.append(r)
    n = float(1 << 16)
    leaves = []
    for x in range(47439, 47443):
        for y in range(31441, 31445):
            lon = ((x + (np.arange(256) + 0.5) / 256.0) / n) * 360.0 - 180.0
            py = (y + (np.arange(256) + 0.5) / 256.0) / n
            lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * py))))
            lo = np.repeat(lon[None, :], 256, axis=0).ravel()
            la = np.repeat(lat[:, None], 256, axis=1).ravel()
            inside = np.zeros(lo.shape, dtype=bool)
            for ring in rings:
                x1, y1, x2, y2 = ring[:-1, 0], ring[:-1, 1], ring[1:, 0], ring[1:, 1]
                for i in range(len(x1)):
                    cond = (y1[i] > la) != (y2[i] > la)
                    if not cond.any():
                        continue
                    with np.errstate(divide="ignore", invalid="ignore"):
                        xi = x1[i] + (la - y1[i]) * (x2[i] - x1[i]) / (y2[i] - y1[i])
                    inside ^= cond & (lo < xi)
            if not inside.any():
                continue
            sel = synth_tile_pixels(x, y, 16, 0).reshape(-1, 3)[inside]
            for b in range(3):
                leaves.append(
                    f"({b}, {sel.shape[0]}, {int(sel[:, b].sum(dtype=np.int64))},"
                    f" {int(sel[:, b].min())}, {int(sel[:, b].max())})"
                )
    vals = ", ".join(leaves)
    return f"""
WITH leaf(band, n, s, mn, mx) AS (VALUES {vals})
SELECT 'T' AS geom_id, band, SUM(n)::BIGINT AS n_px, SUM(s)::BIGINT AS sum_v,
       MIN(mn)::INTEGER AS min_v, MAX(mx)::INTEGER AS max_v,
       SUM(s)::DOUBLE / SUM(n)::DOUBLE AS mean_v
FROM leaf GROUP BY band
"""


# ---------------------------------------------------------------------------
# Round-4 contract rows: union-tagged folds (driver window economy) + the
# round-4 operator suite (span dedup, exact heavy hitters, table profiling).


def _semi_anti_joins(spark, sf):
    """J2 semi + J3 anti in ONE union-tagged row (driver window economy;
    both were individually green in CORRECTNESS_r03). Variant columns:
    ``val_s`` carries the semi row's mktsegment, ``val_d`` the anti
    row's acctbal; the unused slot is NULL."""
    c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    big = o.filter(F.col("o_totalprice") > 100000)
    semi = c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey",
        "c_name",
        F.col("c_mktsegment").alias("val_s"),
        F.lit(None).cast("double").alias("val_d"),
        F.lit("semi").alias("variant"),
    )
    big3 = o.filter(F.col("o_totalprice") > 300000)
    anti = c.join(big3, c.c_custkey == big3.o_custkey, "left_anti").select(
        "c_custkey",
        "c_name",
        F.lit(None).cast("string").alias("val_s"),
        F.col("c_acctbal").cast("double").alias("val_d"),
        F.lit("anti").alias("variant"),
    )
    return semi.unionByName(anti)


_SEMI_ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment AS val_s,
       CAST(NULL AS DOUBLE) AS val_d, 'semi' AS variant
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
UNION ALL
SELECT c_custkey, c_name, CAST(NULL AS VARCHAR) AS val_s,
       c_acctbal::DOUBLE AS val_d, 'anti' AS variant
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
"""


def _hll_sketch_rows(spark, sf):
    """Both HLL surfaces in ONE union-tagged row: the one-shot grouped
    sketch (operators/sketches.py, orders/o_custkey registers) and the
    snapshot-backed incremental store folded across two ingest batches
    (streaming/sketch_stream.py, documents/doc_id). Register-level
    equality with the SQL re-derivation pins hash, bucket split, rank,
    per-bucket MAX and the fold path — see the per-variant docstrings
    on ``_hll_sketch`` / ``_incremental_hll``."""
    a = _hll_sketch(spark, sf).select(
        F.col("o_orderpriority").alias("grp"),
        "zeros",
        "sum_rho",
        "harm_s40",
        F.lit("grouped").alias("variant"),
    )
    b = _incremental_hll(spark, sf).select(
        F.col("lang").alias("grp"),
        "zeros",
        "sum_rho",
        "harm_s40",
        F.lit("incremental").alias("variant"),
    )
    return a.unionByName(b)


def _hll_sketch_rows_sql() -> str:
    return f"""
SELECT o_orderpriority AS grp, zeros, sum_rho, harm_s40, 'grouped' AS variant
FROM ({_HLL_SQL})
UNION ALL
SELECT lang AS grp, zeros, sum_rho, harm_s40, 'incremental' AS variant
FROM ({_INCR_HLL_SQL})
"""


def _jaccard_lsh_pairs(spark, sf):
    """Both text near-dup pair generators in ONE union-tagged row:
    exact word-Jaccard via the inverted-index blocked join and
    MinHash-LSH banding verified by exact Jaccard (same threshold
    machinery, fully re-derived by the oracle — see ``_word_jaccard`` /
    ``_minhash_pairs``)."""
    a = _word_jaccard(spark, sf).withColumn("variant", F.lit("word"))
    b = _minhash_pairs(spark, sf).withColumn("variant", F.lit("lsh"))
    return a.unionByName(b)


def _jaccard_lsh_sql() -> str:
    return f"""
SELECT id_a, id_b, jaccard, 'word' AS variant FROM ({_JACCARD_SQL})
UNION ALL
SELECT id_a, id_b, jaccard, 'lsh' AS variant FROM ({_minhash_lsh_sql()})
"""


def _span_dedup(spark, sf):
    """Duplicated-span detection (operators/spans.py::duplicate_spans,
    the ExactSubstr-style pass): maximal token intervals covered by
    20-grams that occur >= 2 times corpus-wide in >= 2 distinct
    documents. The oracle re-derives grams as STRINGS (the engine's
    64-bit rolling hash equality == string equality, collision-free at
    any test SF) and replays the same gaps-and-islands merge in SQL
    window functions — positions, interval bounds and gram counts all
    pinned exactly."""
    from tilegrab_spark.operators.spans import duplicate_spans

    d = _t(spark, sf, "documents")
    return duplicate_spans(d, k=20, min_count=2, min_docs=2)


_SPAN_SQL = r"""
WITH dt AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents WHERE length(trim(text)) > 0
),
g AS (
  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 20 + 1)) AS i
  FROM dt WHERE len(toks) >= 20
),
grams AS (
  SELECT doc_id, (i - 1)::INTEGER AS pos,
         array_to_string(toks[i : i + 19], ' ') AS gram
  FROM g
),
dup AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING count(*) >= 2 AND count(DISTINCT doc_id) >= 2
),
marked AS (SELECT doc_id, pos FROM grams JOIN dup USING (gram)),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 20
              THEN 1 ELSE 0 END AS newf
  FROM marked WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
isl AS (
  SELECT doc_id, pos,
         sum(newf) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged
)
SELECT doc_id, min(pos) AS start_tok, (max(pos) + 20)::INTEGER AS end_tok,
       count(*)::BIGINT AS n_grams
FROM isl GROUP BY doc_id, grp
"""


def _heavy_hitters(spark, sf):
    """Exact corpus-wide heavy hitters over word tokens
    (operators/heavyhitters.py): per-partition Misra-Gries summaries ->
    candidate set -> broadcast-semi-join exact verify, identical to
    GROUP BY w HAVING count >= ceil(min_frac * N) without ever
    shuffling the full key space. The oracle IS that GROUP BY."""
    from tilegrab_spark.operators.heavyhitters import heavy_hitters

    d = _t(spark, sf, "documents")
    toks = d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    return heavy_hitters(toks, "w", min_frac=0.034)


_HH_SQL = r"""
WITH w AS (
  SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
t AS (SELECT CAST(CEIL(0.034 * count(*)) AS BIGINT) AS thr FROM w)
SELECT w, count(*)::BIGINT AS cnt FROM w GROUP BY w
HAVING count(*) >= (SELECT thr FROM t)
"""


def _profile_table(spark, sf):
    """One-pass table profiling (operators/profile.py): per-column row/
    null/exact-distinct counts, stringified min/max, avg string length —
    the scan-planning stats a 100 TB ingest wants before choosing
    partition keys. ``exact=True`` so the oracle can re-derive every
    number with plain aggregates."""
    from tilegrab_spark.operators.profile import profile_table

    return profile_table(
        _t(spark, sf, "documents"),
        ["doc_id", "lang", "source", "n_chars", "text"],
        exact=True,
    )


_PROFILE_SQL = """
SELECT 'doc_id' AS "column", 'bigint' AS dtype, count(*)::BIGINT AS n_rows,
       (count(*) - count(doc_id))::BIGINT AS n_null,
       count(DISTINCT doc_id)::BIGINT AS n_distinct,
       CAST(min(doc_id) AS VARCHAR) AS min_value,
       CAST(max(doc_id) AS VARCHAR) AS max_value,
       CAST(NULL AS DOUBLE) AS avg_str_len
FROM documents
UNION ALL
SELECT 'lang', 'string', count(*)::BIGINT, (count(*) - count(lang))::BIGINT,
       count(DISTINCT lang)::BIGINT, min(lang), max(lang),
       avg(length(lang))::DOUBLE
FROM documents
UNION ALL
SELECT 'source', 'string', count(*)::BIGINT, (count(*) - count(source))::BIGINT,
       count(DISTINCT source)::BIGINT, min(source), max(source),
       avg(length(source))::DOUBLE
FROM documents
UNION ALL
SELECT 'n_chars', 'bigint', count(*)::BIGINT, (count(*) - count(n_chars))::BIGINT,
       count(DISTINCT n_chars)::BIGINT,
       CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR),
       CAST(NULL AS DOUBLE)
FROM documents
UNION ALL
SELECT 'text', 'string', count(*)::BIGINT, (count(*) - count(text))::BIGINT,
       count(DISTINCT text)::BIGINT, min(text), max(text),
       avg(length(text))::DOUBLE
FROM documents
"""




# ---------------------------------------------------------------------------
# distance_pairs: within-distance spatial join (operators/distancejoin.py)
# over deterministic lineitem-derived city-scale points; the oracle is a
# BRUTE-FORCE haversine cross join written with the exact expression tree
# of trajectory.haversine_m (same op order, same a>1 clamp), so the blocked
# join's candidate disk is proven exhaustive by the driver. Coordinates are
# quantized to 1e-4 deg (~11 m), so no pair sits near the 500 m boundary
# and the set compare is float-robust.
# ---------------------------------------------------------------------------

_DIST_D_M = 500.0


def _distance_points(spark, sf):
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    return li.filter((F.col("l_orderkey") % 97) == 0).select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long").alias("id"),
        (F.lit(11.0) + ((F.col("l_orderkey") * 7) % 2000) / F.lit(10000.0)).alias("lon"),
        (F.lit(48.0) + ((F.col("l_partkey") * 13) % 2000) / F.lit(10000.0)).alias("lat"),
    )


def _distance_pairs(spark, sf):
    from tilegrab_spark.operators.distancejoin import within_distance_pairs

    return within_distance_pairs(_distance_points(spark, sf), _DIST_D_M).select(
        "id_a", "id_b"
    )


_HAV_A = (
    "(sin((radians(b.lat) - radians(a.lat)) / 2) * sin((radians(b.lat) - radians(a.lat)) / 2) "
    "+ cos(radians(a.lat)) * cos(radians(b.lat)) "
    "* sin((radians(b.lon) - radians(a.lon)) / 2) * sin((radians(b.lon) - radians(a.lon)) / 2))"
)

_DISTANCE_PAIRS_SQL = f"""
WITH pts AS (
  SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS id,
         11.0 + ((l_orderkey * 7) % 2000) / 10000.0 AS lon,
         48.0 + ((l_partkey * 13) % 2000) / 10000.0 AS lat
  FROM lineitem WHERE l_orderkey % 97 = 0
)
SELECT a.id AS id_a, b.id AS id_b
FROM pts a JOIN pts b ON a.id < b.id
WHERE 2.0 * 6371008.8 * asin(sqrt(
  CASE WHEN {_HAV_A} > 1.0 THEN 1.0 ELSE {_HAV_A} END)) <= {_DIST_D_M}
"""


# ---------------------------------------------------------------------------
# funnel_steps: greedy-earliest ordered-step funnel (operators/funnel.py)
# over the events table; the oracle re-derives the chained min() FILTER
# gates at microsecond precision. All-long columns + one double that both
# engines compute as the same exact-integer division.
# ---------------------------------------------------------------------------

_FUNNEL_STEP_TYPES = ["view", "click", "purchase"]


def _funnel_steps(spark, sf):
    from tilegrab_spark.operators.funnel import funnel_counts

    ev = spark.read.parquet(f"{sf}/events.parquet")
    return funnel_counts(ev, _FUNNEL_STEP_TYPES)


_FUNNEL_SQL = """
WITH f AS (
  SELECT user_id, epoch_us(ts) AS ts, event_type FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
),
u1 AS (SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS t1 FROM f GROUP BY 1),
u2 AS (SELECT f.user_id, min(f.ts) AS t2 FROM f JOIN u1 USING (user_id)
       WHERE f.event_type = 'click' AND f.ts >= u1.t1 GROUP BY 1),
u3 AS (SELECT f.user_id, min(f.ts) AS t3 FROM f JOIN u2 USING (user_id)
       WHERE f.event_type = 'purchase' AND f.ts >= u2.t2 GROUP BY 1),
c AS (SELECT (SELECT count(t1) FROM u1) AS n1,
             (SELECT count(*) FROM u2) AS n2,
             (SELECT count(*) FROM u3) AS n3)
SELECT 1 AS step, 'view' AS event_type, CAST(n1 AS BIGINT) AS n_users,
       CASE WHEN n1 > 0 THEN n1 / CAST(n1 AS DOUBLE) END AS frac_of_step1 FROM c
UNION ALL
SELECT 2, 'click', CAST(n2 AS BIGINT),
       CASE WHEN n1 > 0 THEN n2 / CAST(n1 AS DOUBLE) END FROM c
UNION ALL
SELECT 3, 'purchase', CAST(n3 AS BIGINT),
       CASE WHEN n1 > 0 THEN n3 / CAST(n1 AS DOUBLE) END FROM c
"""


# ---------------------------------------------------------------------------
# Round-5 rotation: four low-information TPC-H/projection rows
# (q1_pricing_summary, q3_shipping_priority, regexp_projection_p6,
# url_render_s4 — green since r1, now pinned in tests/test_rotated_rows.py)
# swapped for composite rows over the round-3/4 operator suite so
# graph / retrieval / trajectory operators earn driver-oracled rows.
# Rotation policy: COVERAGE.md §contract-rows.


def _pagerank_row(spark, sf):
    """PageRank (operators/graph.py::pagerank) over a deterministic
    edge table derived from orders (src = o_custkey % 127, dst =
    o_orderkey % 199 — 199 nodes incl. 72 dangling sinks, ~|orders|
    parallel edges). FULLY oracled: the DuckDB SQL UNROLLS all five
    power-iteration rounds (links/out-degree shares, per-round dangling
    mass redistribution, damping) as chained CTEs — an independent
    re-derivation of the whole iteration, not just a spot check.
    Ranks are emitted as FLOOR(rank*1e9 + 0.5) nano-units (bigint):
    cross-engine float-sum ordering differs at ~1e-18 while the
    nearest value sits 3e-3 nano-units from a rounding boundary
    (measured at sf0.001/sf0.01), so the driver hash is stable."""
    from tilegrab_spark.operators.graph import pagerank

    o = _t(spark, sf, "orders")
    edges = o.select(
        (F.col("o_custkey") % 127).alias("src"),
        (F.col("o_orderkey") % 199).alias("dst"),
    )
    return pagerank(edges, n_iter=5).select(
        "node",
        F.floor(F.col("rank") * 1e9 + F.lit(0.5)).cast("long").alias("rank_n9"),
    )


def _pagerank_sql() -> str:
    parts = [
        "WITH e AS (SELECT o_custkey % 127 AS s, o_orderkey % 199 AS d FROM orders)",
        "nodes AS (SELECT DISTINCT node FROM (SELECT s AS node FROM e UNION ALL SELECT d FROM e))",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "outd AS (SELECT s, CAST(COUNT(*) AS DOUBLE) AS w FROM e GROUP BY s)",
        "links AS (SELECT e.s, e.d, 1.0 / o.w AS share FROM e JOIN outd o ON o.s = e.s)",
        "r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)",
    ]
    prev = "r0"
    for i in range(1, 6):
        parts.append(
            f"dang{i} AS (SELECT COALESCE(SUM(r.rank), 0.0) AS m FROM {prev} r "
            "LEFT JOIN outd o ON o.s = r.node WHERE o.s IS NULL)"
        )
        parts.append(
            f"c{i} AS (SELECT l.d AS node, SUM(r.rank * l.share) AS c "
            f"FROM {prev} r JOIN links l ON l.s = r.node GROUP BY l.d)"
        )
        parts.append(
            f"r{i} AS (SELECT n.node, (0.15 / nn.n) + 0.85 * "
            f"(COALESCE(c.c, 0.0) + d.m / nn.n) AS rank "
            f"FROM nodes n CROSS JOIN nn CROSS JOIN dang{i} d "
            f"LEFT JOIN c{i} c ON c.node = n.node)"
        )
        prev = f"r{i}"
    return (
        ",\n".join(parts)
        + f"\nSELECT node, CAST(FLOOR(rank * 1e9 + 0.5) AS BIGINT) AS rank_n9 FROM {prev}"
    )


_BM25_QUERIES = [
    (1, "spark join fast table"),
    (2, "window agg merge"),
    (3, "customer query line value"),
]


def _bm25_row(spark, sf):
    """BM25 ranked retrieval (operators/retrieval.py::bm25_search) over
    the documents table for three fixed queries, k=10. FULLY oracled:
    the DuckDB SQL re-derives the whole pipeline — tokenize, tf/df/dl,
    Robertson idf, the k1/b-saturated score, top-k with the ascending-
    doc-id tie-break. Integer projection (query_id, doc_id, rank): the
    min adjacent score gap is ~1e-4 (measured) vs ~1e-15 cross-engine
    float noise, so ranks are hash-stable; exact score ties come from
    identical (tf, dl) pairs and break identically by doc_id."""
    from tilegrab_spark.operators.retrieval import bm25_search

    d = _t(spark, sf, "documents")
    q = spark.createDataFrame(_BM25_QUERIES, "query_id int, text string")
    return bm25_search(d, q, k=10).select(
        "query_id", "doc_id", F.col("rank").cast("int").alias("rank")
    )


def _bm25_sql() -> str:
    qvals = ", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)
    return f"""
WITH qs(query_id, qtext) AS (VALUES {qvals}),
toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
  FROM documents),
dl AS (SELECT doc_id, len(t) AS dl FROM toks),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM toks) GROUP BY 1, 2),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl FROM dl),
qt AS (
  SELECT query_id, unnest(list_distinct(
    list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> ''))) AS term
  FROM qs),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
              * tf.tf * (1.2 + 1)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS score
  FROM qt q
  JOIN tf ON tf.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2)
SELECT CAST(query_id AS INTEGER) AS query_id, doc_id, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
"""


def _track_pairs_row(spark, sf):
    """Trajectory similarity join (operators/tracksim.py::
    track_similarity_join, symmetric Hausdorff ≤ 100 m) over 24
    deterministic 12-fix tracks synthesized from events: six 1.6
    km-separated groups of four near-parallel tracks whose pairwise
    Hausdorff is ≤ ~55 m (jitter-bound), so all 36 within-group pairs
    match with a ≥ 77 m margin to the threshold (measured) — decision-
    stable under cross-engine float noise. FULLY oracled: DuckDB
    re-derives the same fix construction and the full Hausdorff join
    with list lambdas (list_max/list_min over the haversine)."""
    from tilegrab_spark.operators.dedup import release_signature_caches
    from tilegrab_spark.operators.tracksim import track_similarity_join

    ev = _t(spark, sf, "events").filter(F.col("event_id") < 288)
    t = F.col("event_id") % 24
    seq = (F.col("event_id") / 24).cast("long")
    fixes = ev.select(
        t.alias("track_id"),
        seq.cast("double").alias("ts"),
        (
            (t % 6) * F.lit(0.02)
            + seq * F.lit(2e-4)
            + ((t * 2654435761) % 1000) / F.lit(1000.0) * F.lit(4e-4)
        ).alias("lon"),
        (F.lit(45.0) + ((t * 40503) % 1000) / F.lit(1000.0) * F.lit(4e-4)).alias(
            "lat"
        ),
    )
    pairs = track_similarity_join(fixes, 100.0).select("track_a", "track_b")
    out = pairs.localCheckpoint(eager=True)
    release_signature_caches()
    return out


_TRACK_PAIRS_SQL = """
WITH fixes AS (
  SELECT event_id % 24 AS track_id,
         CAST(event_id // 24 AS DOUBLE) AS ts,
         (event_id % 24 % 6) * 0.02 + (event_id // 24) * 2e-4
           + ((event_id % 24 * 2654435761) % 1000) / 1000.0 * 4e-4 AS lon,
         45.0 + ((event_id % 24 * 40503) % 1000) / 1000.0 * 4e-4 AS lat
  FROM events WHERE event_id < 288),
tr AS (
  SELECT track_id, list(struct_pack(lon := lon, lat := lat) ORDER BY ts, lon, lat) pts
  FROM fixes GROUP BY track_id),
pairs AS (
  SELECT a.track_id track_a, b.track_id track_b,
         greatest(
           list_max(list_transform(a.pts, p -> list_min(list_transform(b.pts,
             q -> 2*6371008.8*asin(sqrt(least(1.0, sin(radians(q.lat-p.lat)/2)^2
                  + cos(radians(p.lat))*cos(radians(q.lat))*sin(radians(q.lon-p.lon)/2)^2))))))),
           list_max(list_transform(b.pts, p -> list_min(list_transform(a.pts,
             q -> 2*6371008.8*asin(sqrt(least(1.0, sin(radians(q.lat-p.lat)/2)^2
                  + cos(radians(p.lat))*cos(radians(q.lat))*sin(radians(q.lon-p.lon)/2)^2)))))))
         ) dist_m
  FROM tr a JOIN tr b ON a.track_id < b.track_id)
SELECT track_a, track_b FROM pairs WHERE dist_m <= 100.0
"""


def _triangle_row(spark, sf):
    """Per-node triangle counts (operators/graph.py::triangle_count,
    the degree-ordered wedge-closure formulation) over a deterministic
    211-node graph from orders (u = o_custkey % 211, v = o_orderkey %
    211; parallel edges + self-loops normalized away). FULLY oracled:
    DuckDB counts each triangle once via the a<b<c three-way join and
    credits all corners — an independent algorithm from the engine's
    degree-ordered orientation. All-integer output."""
    from tilegrab_spark.operators.dedup import release_signature_caches
    from tilegrab_spark.operators.graph import triangle_count

    o = _t(spark, sf, "orders")
    edges = o.select(
        (F.col("o_custkey") % 211).alias("src"),
        (F.col("o_orderkey") % 211).alias("dst"),
    )
    out = triangle_count(edges).localCheckpoint(eager=True)
    release_signature_caches()
    return out


_TRIANGLES_SQL = """
WITH e0 AS (
  SELECT DISTINCT least(o_custkey % 211, o_orderkey % 211) AS u,
                  greatest(o_custkey % 211, o_orderkey % 211) AS v
  FROM orders WHERE o_custkey % 211 <> o_orderkey % 211),
nodes AS (SELECT DISTINCT node FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e0 e1 JOIN e0 e2 ON e2.u = e1.v
  JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v),
cnt AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
  SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri) GROUP BY node)
SELECT n.node, COALESCE(c.triangles, 0) AS triangles
FROM nodes n LEFT JOIN cnt c ON c.node = n.node
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pagerank_ranks": _pagerank_row,
        "bm25_topk": _bm25_row,
        "equi_join_j1": _equi_join,
        "semi_anti_joins": _semi_anti_joins,
        "extent_agg_a1": _extent_agg,
        "limit_set_except": _limit_set_except,
        "window_row_number": _window_topn,
        "track_pairs": _track_pairs_row,
        "triangle_counts": _triangle_row,
        "status_routing_a5": _status_routing,
        "resume_anti_f5": _resume_anti,
        "snapshot_time_travel": _snapshot_time_travel,
        "tile_encode_p1": _tile_encode,
        "tile_interop_keys": _tile_interop,
        "bbox_enum_f1": _bbox_enum,
        "dedup_exact": _dedup_exact,
        "jaccard_lsh_pairs": _jaccard_lsh_pairs,
        "text_signals": _text_signals,
        "ann_topk": _ann_topk,
        "knn_cell_ring": _knn_cells,
        "connected_components": _cc_islands,
        "embedding_cosine_pairs": _embedding_pairs,
        "clean_corpus_pipeline": _clean_corpus,
        "incremental_lsh_pairs": _incremental_lsh,
        "sql_surface_tile_math": _sql_surface,
        "distance_pairs": _distance_pairs,
        "cross_modal_pairs": _cross_modal,
        "tile_diff_epochs": _tile_diff,
        "dissolve_regions": _dissolve,
        "band_index_rollup": _band_rollup,
        "focal_box_stats": _focal,
        "shard_pack": _shard_pack,
        "stratified_sampling": _stratified_sampling,
        "export_pipeline": _export_pipeline,
        "text_fingerprints": _text_fingerprints,
        "mosaic_pipeline": _mosaic_meta,
        "mosaic_plan_w1": _mosaic_plan,
        "zonal_stats_t": _zonal_stats_t,
        "hll_sketch_rows": _hll_sketch_rows,
        "funnel_steps": _funnel_steps,
        "asof_join_events": _asof_events,
        "range_join_bands": _range_join_bands,
        "cms_frequencies": _cms_counts,
        "sessionize_events": _sessionize,
        "pii_clean_scrub": _clean_scrub,
        "decontaminate_hits": _decontaminate_hits,
        "mixture_sample": _mixture_sample,
        "span_dedup": _span_dedup,
        "heavy_hitters": _heavy_hitters,
        "profile_table": _profile_table,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pagerank_ranks": _pagerank_sql(),
        "bm25_topk": _bm25_sql(),
        "equi_join_j1": _EQUI_SQL,
        "semi_anti_joins": _SEMI_ANTI_SQL,
        "extent_agg_a1": _EXTENT_SQL,
        "limit_set_except": _LIMIT_SET_SQL,
        "window_row_number": _WINDOW_SQL,
        "track_pairs": _TRACK_PAIRS_SQL,
        "triangle_counts": _TRIANGLES_SQL,
        "status_routing_a5": _STATUS_SQL,
        "resume_anti_f5": _RESUME_SQL,
        "snapshot_time_travel": _SNAPSHOT_SQL,
        "tile_encode_p1": _ENCODE_SQL,
        "tile_interop_keys": _interop_sql(),
        "bbox_enum_f1": _BBOX_SQL,
        "mosaic_plan_w1": _MOSAIC_PLAN_SQL,
        "zonal_stats_t": _zonal_sql(),
        "hll_sketch_rows": _hll_sketch_rows_sql(),
        "funnel_steps": _FUNNEL_SQL,
        "asof_join_events": _ASOF_SQL,
        "range_join_bands": _RANGE_JOIN_SQL,
        "cms_frequencies": _CMS_SQL,
        "distance_pairs": _DISTANCE_PAIRS_SQL,
        "cross_modal_pairs": _cross_modal_sql(),
        "tile_diff_epochs": _tile_diff_sql(),
        "dissolve_regions": _DISSOLVE_SQL,
        "band_index_rollup": _band_rollup_sql(),
        "focal_box_stats": _focal_sql(),
        "shard_pack": _SHARD_PACK_SQL,
        "stratified_sampling": _stratified_sampling_sql(),
        "export_pipeline": _export_pipeline_sql(),
        "sessionize_events": _SESSION_SQL,
        "text_fingerprints": _text_fingerprints_sql(),
        "dedup_exact": _DEDUP_SQL,
        "jaccard_lsh_pairs": _jaccard_lsh_sql(),
        "text_signals": _text_signals_sql(),
        "ann_topk": _ANN_TOPK_SQL,
        "knn_cell_ring": _knn_sql(),
        "connected_components": _CC_SQL,
        "embedding_cosine_pairs": _EMB_PAIRS_SQL,
        "clean_corpus_pipeline": _CLEAN_SQL,
        "incremental_lsh_pairs": _incremental_lsh_sql(),
        "sql_surface_tile_math": _sql_surface_sql(),
        "mosaic_pipeline": _mosaic_pixels_sql(),
        "pii_clean_scrub": _clean_scrub_sql(),
        "decontaminate_hits": _DECON_SQL,
        "mixture_sample": _mixture_sql(),
        "span_dedup": _SPAN_SQL,
        "heavy_hitters": _HH_SQL,
        "profile_table": _PROFILE_SQL,
    }
