"""Benchmark decontamination: n-gram overlap semantics pinned against an
independent DuckDB oracle, plus plan-shape and pipeline-form checks."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.decontaminate import contamination_hits, decontaminate

# Deterministic mini-corpus: docs 2/5/9 embed eval n-grams, the rest are
# clean. Eval e2 is shorter than n (whole-sequence gram); doc 9 copies it
# verbatim. Doc 5 contains grams from BOTH eval docs.
EVAL = [
    ("e1", "the quick brown fox jumps over the lazy dog tonight"),
    ("e2", "paris is the capital"),
]
DOCS = [
    ("d1", "completely unrelated text about tile pyramids and mosaics"),
    ("d2", "he said the quick brown fox jumps over the wall again"),
    ("d3", "spark plans shuffle when grouping keys differ from layout"),
    ("d5", "quote: the quick brown fox jumps near paris is the capital region"),
    ("d7", "short clean doc"),
    ("d9", "answer: paris is the capital"),
    ("d10", ""),
]
N = 5


def _oracle(n: int, min_hits: int) -> pd.DataFrame:
    """Independent re-derivation in DuckDB: eval side = min(n, len)-grams;
    corpus side = k-grams for every k the eval set needs (cross join with
    the eval-derived length set ks_v)."""
    con = duckdb.connect()
    con.register("docs_v", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    con.register("eval_v", pd.DataFrame(EVAL, columns=["eval_id", "text"]))
    q = f"""
    WITH ks AS (
      SELECT list(DISTINCT least(len(regexp_split_to_array(lower(trim(text)), '\\s+')), {n})) AS klist
      FROM eval_v
    ),
    dt AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM docs_v
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
      SELECT eval_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM eval_v
    ),
    eg AS (
      SELECT DISTINCT eval_id,
        unnest([array_to_string(toks[i : i + least(len(toks), {n}) - 1], ' ')
                for i in range(1, greatest(len(toks) - least(len(toks), {n}) + 1, 1) + 1)]) AS gram
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
    FROM hits
    GROUP BY doc_id
    HAVING count(DISTINCT gram) >= {min_hits}
    ORDER BY doc_id
    """
    out = con.execute(q).fetch_df()
    con.close()
    return out


def _spark_hits(spark, n: int, min_hits: int) -> pd.DataFrame:
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    ev = spark.createDataFrame(EVAL, ["eval_id", "text"])
    return (
        contamination_hits(docs, ev, n=n, min_hits=min_hits)
        .orderBy("doc_id")
        .toPandas()
    )


@pytest.mark.parametrize("min_hits", [1, 2])
def test_hits_match_duckdb_oracle(spark, min_hits):
    got = _spark_hits(spark, N, min_hits)
    want = _oracle(N, min_hits)
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["n_hits"]) == list(want["n_hits"])
    assert list(got["n_eval_docs"]) == list(want["n_eval_docs"])


def test_expected_flags(spark):
    got = _spark_hits(spark, N, 1)
    assert set(got["doc_id"]) == {"d2", "d5", "d9"}
    by_id = got.set_index("doc_id")
    # d5 overlaps grams from both eval docs
    assert by_id.loc["d5", "n_eval_docs"] == 2
    # d9 is a verbatim copy of the SHORT eval doc (< n tokens -> the
    # whole-sequence gram must still match)
    assert by_id.loc["d9", "n_hits"] == 1
    assert by_id.loc["d9", "n_eval_docs"] == 1


def test_decontaminate_removes_flagged_only(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    ev = spark.createDataFrame(EVAL, ["eval_id", "text"])
    kept = sorted(
        r[0] for r in decontaminate(docs, ev, n=N).select("doc_id").collect()
    )
    assert kept == ["d1", "d10", "d3", "d7"]


def test_clean_corpus_is_untouched(spark):
    docs = spark.createDataFrame(
        [("c1", "nothing here overlaps"), ("c2", "nor here either")],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(EVAL, ["eval_id", "text"])
    assert contamination_hits(docs, ev, n=N).count() == 0
    assert decontaminate(docs, ev, n=N).count() == 2


def test_default_n13_convention(spark):
    contaminated = (
        "preamble words "
        + "the quick brown fox jumps over the lazy dog tonight said nobody ever"
        + " trailing words here"
    )
    ev13 = spark.createDataFrame(
        [
            (
                "e",
                "the quick brown fox jumps over the lazy dog tonight said nobody ever",
            )
        ],
        ["eval_id", "text"],
    )
    docs = spark.createDataFrame(
        [("hot", contaminated), ("cold", "thirteen totally different words " * 4)],
        ["doc_id", "text"],
    )
    got = contamination_hits(docs, ev13).collect()  # default n=13
    assert [r["doc_id"] for r in got] == ["hot"]


def test_eval_side_is_broadcast(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    ev = spark.createDataFrame(EVAL, ["eval_id", "text"])
    plan = contamination_hits(docs, ev, n=N)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_validation(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    ev = spark.createDataFrame(EVAL, ["eval_id", "text"])
    with pytest.raises(ValueError):
        contamination_hits(docs, ev, n=0)
    with pytest.raises(ValueError):
        contamination_hits(docs, ev, min_hits=0)
