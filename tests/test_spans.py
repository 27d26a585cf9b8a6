"""Duplicated-span detection/scrub: DuckDB oracle parity for the
interval set, maximal-merge semantics, within-doc policy, scrub
round-trip, and partition invariance."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.spans import duplicate_spans, scrub_spans

K = 5
BOILER = "this content is provided as is without warranty of any"  # 10 toks

DOCS = [
    (1, f"alpha beta gamma {BOILER} delta epsilon"),
    (2, f"{BOILER} zeta eta theta iota kappa"),
    (3, "totally unique words that appear nowhere else in corpus one"),
    (4, f"prefix words here {BOILER} and a repeated tail piece"),
    (5, "short doc"),  # < k tokens: never emits grams
    (6, "self repeat self repeat self repeat self repeat self repeat x"),
]


def _oracle(rows, k, min_count, min_docs):
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    q = f"""
    WITH dt AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM t
    ),
    g0 AS (
      SELECT doc_id,
        unnest([{{'pos': i - 1,
                  'gram': array_to_string(toks[i : i + {k} - 1], ' ')}}
                for i in range(1, greatest(len(toks) - {k} + 1, 0) + 1)]) AS u
      FROM dt WHERE len(toks) >= {k}
    ),
    g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM g0),
    dup AS (
      SELECT gram FROM g GROUP BY gram
      HAVING count(*) >= {min_count} AND count(DISTINCT doc_id) >= {min_docs}
    ),
    hits AS (
      SELECT doc_id, pos FROM g JOIN dup USING (gram)
    ),
    isl AS (
      SELECT doc_id, pos,
        CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + {k}
             THEN 1 ELSE 0 END AS new_isl
      FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    grp AS (
      SELECT doc_id, pos,
             sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
      FROM isl
    )
    SELECT doc_id, min(pos) AS start_tok, max(pos) + {k} AS end_tok,
           count(*) AS n_grams
    FROM grp GROUP BY doc_id, gid ORDER BY doc_id, start_tok
    """
    out = con.execute(q).fetch_df()
    con.close()
    return {
        (r.doc_id, r.start_tok, r.end_tok, r.n_grams)
        for r in out.itertuples(index=False)
    }


def _spark_spans(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        (r["doc_id"], r["start_tok"], r["end_tok"], r["n_grams"])
        for r in duplicate_spans(df, k=K, **kw).collect()
    }


@pytest.mark.parametrize("min_docs", [1, 2])
def test_matches_duckdb_oracle(spark, min_docs):
    got = _spark_spans(spark, DOCS, min_docs=min_docs)
    want = _oracle(DOCS, K, 2, min_docs)
    assert got == want and got  # non-trivial


def test_expected_spans_and_maximal_merge(spark):
    got = _spark_spans(spark, DOCS, min_docs=2)
    by_doc = {}
    for d, s, e, n in got:
        by_doc.setdefault(d, []).append((s, e))
    # the 10-token boilerplate is one MAXIMAL interval per doc
    assert by_doc[1] == [(3, 13)]
    assert by_doc[2] == [(0, 10)]
    assert by_doc[4] == [(3, 13)]
    # doc 3 clean; doc 5 too short; doc 6 only self-repeats (min_docs=2)
    assert 3 not in by_doc and 5 not in by_doc and 6 not in by_doc
    # with min_docs=1 the within-doc repeat IS flagged
    got1 = _spark_spans(spark, DOCS, min_docs=1)
    assert any(d == 6 for d, *_ in got1)


def test_scrub_roundtrip(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    spans = duplicate_spans(df, k=K, min_docs=2)
    out = {
        r["doc_id"]: r["scrubbed_text"]
        for r in scrub_spans(df, spans).collect()
    }
    assert out[1] == "alpha beta gamma delta epsilon"
    assert out[2] == "zeta eta theta iota kappa"
    assert out[4] == "prefix words here and a repeated tail piece"
    # untouched docs pass through verbatim (original casing preserved)
    assert out[3] == DOCS[2][1] and out[5] == DOCS[4][1]
    # scrubbed corpus has no remaining duplicated k-grams across docs
    clean = scrub_spans(df, spans).select(
        "doc_id", F.col("scrubbed_text").alias("text")
    )
    assert duplicate_spans(clean, k=K, min_docs=2).count() == 0


def test_partition_invariance(spark):
    df = spark.createDataFrame(DOCS * 3, ["doc_id", "text"])  # dup ids ok: more repeats
    a = {
        tuple(r) for r in duplicate_spans(df.repartition(1), k=K).collect()
    }
    b = {
        tuple(r) for r in duplicate_spans(df.repartition(16), k=K).collect()
    }
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        duplicate_spans(df, k=0)
    with pytest.raises(ValueError):
        duplicate_spans(df, min_count=1)
