"""BM25 retrieval vs a DuckDB SQL oracle that re-derives the full
pipeline (tokenize → tf/df/dl → idf → score → top-k) independently,
plus plan and edge-case checks."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.retrieval import (
    bm25_search,
    bm25_topk,
    build_text_index,
)

_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown dog outpaces a quick fox"),
    (2, "lorem ipsum dolor sit amet consectetur"),
    (3, "the dog sleeps; the fox hunts. FOX!"),
    (4, "brown bread, brown butter, brown sugar"),
    (5, "empty of any query words entirely"),
    (6, ""),
    (7, "fox fox fox fox fox"),
    (8, "Quick-brown FOX: 42 times faster than dog #9"),
]
_QUERIES = [(100, "quick brown fox"), (101, "the dog"), (102, "zzz unseen"), (103, "fox fox")]

_ORACLE_SQL = """
WITH toks AS (
  SELECT id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
  FROM docs
),
dl AS (SELECT id, len(t) AS dl FROM toks),
tf AS (
  SELECT id, term, count(*)::BIGINT AS tf
  FROM (SELECT id, unnest(t) AS term FROM toks) GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl),
qt AS (
  SELECT query_id, unnest(list_distinct(
    list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> ''))) AS term
  FROM queries
),
scored AS (
  SELECT q.query_id, tf.id,
         sum( ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
              * tf.tf * ({k1} + 1)
              / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
  FROM qt q
  JOIN tf ON tf.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.id = tf.id
  CROSS JOIN stats s
  GROUP BY 1, 2
)
SELECT query_id, id, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


def _oracle(docs, queries, k, k1=1.2, b=0.75):
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(id INT, text VARCHAR)")
    con.execute("CREATE TABLE queries(query_id INT, qtext VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", docs)
    con.executemany("INSERT INTO queries VALUES (?, ?)", queries)
    return con.execute(_ORACLE_SQL.format(k=k, k1=k1, b=b)).fetchall()


def _run_spark(spark, docs, queries, k, **kw):
    D = spark.createDataFrame(docs, "doc_id int, text string")
    Q = spark.createDataFrame(queries, "query_id int, text string")
    rows = (
        bm25_search(D, Q, k=k, **kw)
        .orderBy("query_id", "rank")
        .collect()
    )
    return [(r.query_id, r.doc_id, r.score, r.rank) for r in rows]


def test_matches_duckdb_oracle(spark):
    got = _run_spark(spark, _DOCS, _QUERIES, k=5)
    want = _oracle(_DOCS, _QUERIES, k=5)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g[0], g[1], g[3]) == (w[0], w[1], w[3])
        assert g[2] == pytest.approx(w[2], rel=1e-12)


def test_custom_k1_b(spark):
    got = _run_spark(spark, _DOCS, _QUERIES, k=3, k1=0.9, b=0.4)
    want = _oracle(_DOCS, _QUERIES, k=3, k1=0.9, b=0.4)
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], rel=1e-12)


def test_repeated_query_terms_count_once(spark):
    D = spark.createDataFrame(_DOCS, "doc_id int, text string")
    idx = build_text_index(D)
    Q1 = spark.createDataFrame([(0, "fox")], "query_id int, text string")
    Q2 = spark.createDataFrame([(0, "fox fox fox")], "query_id int, text string")
    r1 = [(r.doc_id, r.score) for r in bm25_topk(idx, Q1, k=9).orderBy("rank").collect()]
    r2 = [(r.doc_id, r.score) for r in bm25_topk(idx, Q2, k=9).orderBy("rank").collect()]
    assert r1 == r2


def test_max_df_ratio_prunes_stopwords(spark):
    D = spark.createDataFrame(_DOCS, "doc_id int, text string")
    idx = build_text_index(D, max_df_ratio=0.2)
    # "the" appears in 2/9 docs (ratio 0.22 > 0.2) -> pruned; "lorem" in 1/9 kept
    terms = {r.term for r in idx.dfreq.collect()}
    assert "the" not in terms and "lorem" in terms
    post_terms = {r.term for r in idx.postings.select("term").distinct().collect()}
    assert "the" not in post_terms
    # searching a pruned-only query returns nothing rather than erroring
    Q = spark.createDataFrame([(0, "the")], "query_id int, text string")
    assert bm25_topk(idx, Q, k=3).count() == 0


def test_no_match_and_empty_doc(spark):
    got = _run_spark(spark, _DOCS, [(0, "zzz unseen")], k=5)
    assert got == []  # unseen terms -> no candidates, no rows
    # empty doc (id 6) never appears as a candidate
    all_hits = _run_spark(spark, _DOCS, _QUERIES, k=9)
    assert all(h[1] != 6 for h in all_hits)


def test_validation(spark):
    D = spark.createDataFrame(_DOCS, "doc_id int, text string")
    Q = spark.createDataFrame(_QUERIES, "query_id int, text string")
    with pytest.raises(ValueError):
        bm25_search(D, Q, k=0)
    with pytest.raises(ValueError):
        build_text_index(D, max_df_ratio=1.5)
    empty = spark.createDataFrame([], "doc_id int, text string")
    idx = build_text_index(empty)
    with pytest.raises(ValueError):
        bm25_topk(idx, Q, k=3)


def test_plan_broadcasts_query_side(spark):
    D = spark.createDataFrame(_DOCS, "doc_id int, text string")
    Q = spark.createDataFrame(_QUERIES, "query_id int, text string")
    plan = bm25_search(D, Q, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
