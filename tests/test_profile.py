"""Table profiling: DuckDB oracle parity (exact mode), approx-distinct
tolerance, complex-column handling, and the one-scan/one-row contract."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.profile import profile_table

SF = "/root/testdata/sf0.001"


def test_exact_profile_matches_duckdb(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        r["column"]: r
        for r in profile_table(docs, ["doc_id", "lang", "n_chars"], exact=True).collect()
    }
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT count(*) AS n,
               count(doc_id) AS nn_id, count(DISTINCT doc_id) AS nd_id,
               min(doc_id)::VARCHAR AS mn_id, max(doc_id)::VARCHAR AS mx_id,
               count(DISTINCT lang) AS nd_lang, avg(length(lang)) AS al_lang,
               min(n_chars)::VARCHAR AS mn_c, max(n_chars)::VARCHAR AS mx_c
        FROM read_parquet('{SF}/documents.parquet')
        """
    ).fetchone()
    con.close()
    r = got["doc_id"]
    assert (r["n_rows"], r["n_distinct"], r["min_value"], r["max_value"]) == (
        want[0], want[2], want[3], want[4],
    )
    assert r["n_null"] == want[0] - want[1]
    assert got["lang"]["n_distinct"] == want[5]
    assert abs(got["lang"]["avg_str_len"] - want[6]) < 1e-9
    assert (got["n_chars"]["min_value"], got["n_chars"]["max_value"]) == (
        want[7], want[8],
    )


def test_approx_distinct_within_tolerance(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {
        r["column"]: r["n_distinct"]
        for r in profile_table(docs, ["doc_id", "lang"], exact=True).collect()
    }
    approx = {
        r["column"]: r["n_distinct"]
        for r in profile_table(docs, ["doc_id", "lang"]).collect()
    }
    for c in exact:
        assert abs(approx[c] - exact[c]) <= max(2, 0.05 * exact[c])


def test_nulls_and_complex_columns(spark):
    df = spark.createDataFrame(
        [(1, "a", [1, 2]), (2, None, []), (None, "b", None)],
        "id long, s string, arr array<int>",
    )
    got = {r["column"]: r for r in profile_table(df, exact=True).collect()}
    assert got["id"]["n_null"] == 1 and got["s"]["n_null"] == 1
    # complex column: counts only
    assert got["arr"]["n_null"] == 1
    assert got["arr"]["n_distinct"] is None
    assert got["arr"]["min_value"] is None
    assert got["s"]["avg_str_len"] == 1.0
    assert got["id"]["avg_str_len"] is None


def test_single_exchange_plan(spark):
    """The whole profile folds into one aggregation: exactly one
    Exchange (partial -> final agg) in approx mode."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cols = ["doc_id", "lang", "n_chars", "source"]
    aggs_df = docs.agg(
        F.count(F.lit(1)),
        *[F.approx_count_distinct(c) for c in cols],
        *[F.min(c) for c in cols],
    )
    plan = aggs_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_validation(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="not in frame"):
        profile_table(df, ["nope"])
    with pytest.raises(ValueError, match="no columns"):
        profile_table(df.select(), [])
