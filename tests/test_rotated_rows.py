"""Rows rotated OUT of the 50-row driver contract registry in round 5
(q1_pricing_summary, q3_shipping_priority, regexp_projection_p6,
url_render_s4 — driver-green since round 1) stay pinned here against
the SAME DuckDB oracle SQL, so rotation never loses coverage.
Rotation policy: COVERAGE.md §contract-rows."""

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

ROTATED = [
    ("q1_pricing_summary", entrymod._q1_pricing, entrymod._Q1_SQL),
    ("q3_shipping_priority", entrymod._q3_shipping, entrymod._Q3_SQL),
    ("regexp_projection_p6", entrymod._regexp_proj, entrymod._REGEXP_SQL),
    ("url_render_s4", entrymod._url_render, entrymod._URL_SQL),
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name,fn,sql", ROTATED, ids=[r[0] for r in ROTATED])
def test_rotated_row_still_oracle_exact(spark, con, name, fn, sql):
    got = fn(spark, SF_DIR).toPandas()
    want = con.execute(sql).df()
    got = got[sorted(got.columns)].sort_values(list(sorted(got.columns))).reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(list(sorted(want.columns))).reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        a, b = got[c], want[c]
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
            np.testing.assert_allclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9)
        else:
            assert (a.to_numpy() == b.to_numpy()).all(), f"{name}.{c}"
