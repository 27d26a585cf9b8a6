"""od_matrix and funnel_progress/funnel_counts vs DuckDB oracles —
the OD oracle re-derives first/last-fix selection + cell encode; the
funnel oracle re-derives the greedy chained mins at microsecond
precision (incl. the within_s gate)."""

import datetime

import duckdb
import pytest

from tilegrab_spark.operators.funnel import funnel_counts, funnel_progress
from tilegrab_spark.operators.trajectory import od_matrix

EPS = 1e-14

_OD_ORACLE = """
WITH ranked AS (
  SELECT track_id, lon, lat,
    row_number() OVER (PARTITION BY track_id ORDER BY ts, lon, lat) AS rf,
    row_number() OVER (PARTITION BY track_id ORDER BY ts DESC, lon DESC, lat DESC) AS rl,
    (max(epoch_us(ts)) OVER (PARTITION BY track_id)
     - min(epoch_us(ts)) OVER (PARTITION BY track_id)) / 1e6 AS dur
  FROM fixes
),
trips AS (
  SELECT f.track_id,
    f.lon AS o_lon, f.lat AS o_lat, l.lon AS d_lon, l.lat AS d_lat, f.dur
  FROM ranked f JOIN ranked l USING (track_id)
  WHERE f.rf = 1 AND l.rl = 1
),
enc AS (
  SELECT
    CAST(floor((o_lon / 360.0 + 0.5 + {eps}) * {n}) AS BIGINT) AS o_x,
    CAST(floor(((0.5 - 0.25 * ln((1.0 + sin(radians(o_lat))) / (1.0 - sin(radians(o_lat)))) / pi()) + {eps}) * {n}) AS BIGINT) AS o_y,
    CAST(floor((d_lon / 360.0 + 0.5 + {eps}) * {n}) AS BIGINT) AS d_x,
    CAST(floor(((0.5 - 0.25 * ln((1.0 + sin(radians(d_lat))) / (1.0 - sin(radians(d_lat)))) / pi()) + {eps}) * {n}) AS BIGINT) AS d_y,
    dur
  FROM trips
)
SELECT o_x, o_y, d_x, d_y, count(*)::BIGINT AS n_trips, avg(dur) AS avg_duration_s
FROM enc GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4
"""


def _ts(s):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def _fixes(seed, n_tracks, n_fix):
    out, s = [], seed
    for t in range(n_tracks):
        for i in range(n_fix):
            s = (s * 1103515245 + 12345) % (1 << 31)
            u = s / float(1 << 31)
            s = (s * 1103515245 + 12345) % (1 << 31)
            v = s / float(1 << 31)
            out.append((t, _ts(i * 60 + t), 11.0 + u, 47.5 + v))
    # ts tie inside track 0: ordering falls back to (lon, lat)
    out.append((0, _ts(0), 10.5, 47.2))
    return out


def test_od_matrix_matches_oracle(spark):
    fixes = _fixes(3, 12, 8)
    df = spark.createDataFrame(fixes, "track_id int, ts timestamp, lon double, lat double")
    got = sorted(
        (r.o_x, r.o_y, r.d_x, r.d_y, r.n_trips, round(r.avg_duration_s, 6))
        for r in od_matrix(df, 10).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE fixes(track_id INT, ts TIMESTAMP, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO fixes VALUES (?, ?, ?, ?)", fixes)
    want = [
        (a, b, c, d, n, round(dur, 6))
        for a, b, c, d, n, dur in con.execute(
            _OD_ORACLE.format(eps=EPS, n=1 << 10)
        ).fetchall()
    ]
    assert got == want
    assert sum(r[4] for r in got) == 12  # one trip per track
    with pytest.raises(ValueError):
        od_matrix(df, 99)


_FUNNEL_ORACLE = """
WITH f AS (
  SELECT user_id, epoch_us(ts) AS ts, event_type FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
),
u1 AS (SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS t1 FROM f GROUP BY 1),
u2 AS (
  SELECT f.user_id, min(f.ts) AS t2 FROM f JOIN u1 USING (user_id)
  WHERE f.event_type = 'click' AND f.ts >= u1.t1 {w2} GROUP BY 1
),
u3 AS (
  SELECT f.user_id, min(f.ts) AS t3 FROM f JOIN u2 USING (user_id)
  WHERE f.event_type = 'purchase' AND f.ts >= u2.t2 {w3} GROUP BY 1
)
SELECT u1.user_id, u1.t1, u2.t2, u3.t3
FROM u1 LEFT JOIN u2 USING (user_id) LEFT JOIN u3 USING (user_id)
ORDER BY 1
"""


def _events(spark, sf="/root/testdata/sf0.01"):
    return spark.read.parquet(f"{sf}/events.parquet")


def _oracle_funnel(within_us=None):
    w2 = w3 = ""
    if within_us is not None:
        w2 = f"AND f.ts - u1.t1 <= {within_us}"
        w3 = f"AND f.ts - u2.t2 <= {within_us}"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/events.parquet')"
    )
    return {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(_FUNNEL_ORACLE.format(w2=w2, w3=w3)).fetchall()
    }


STEPS = ["view", "click", "purchase"]


def test_funnel_progress_matches_oracle(spark):
    got = {
        r.user: (r.t_1, r.t_2, r.t_3)
        for r in funnel_progress(_events(spark), STEPS).collect()
    }
    want = _oracle_funnel()
    # oracle rows cover every user with a step-typed event; spark frame too
    assert set(want) <= set(got)
    for u, w in want.items():
        assert got[u] == w, u
    # users present in got but not want had no 'view' event at all
    for u in set(got) - set(want):
        assert got[u] == (None, None, None)


def test_funnel_within_window(spark):
    within = 3600.0
    got = {
        r.user: (r.t_1, r.t_2, r.t_3)
        for r in funnel_progress(_events(spark), STEPS, within_s=within).collect()
    }
    want = _oracle_funnel(within_us=int(within * 1_000_000))
    for u, w in want.items():
        assert got[u] == w, u
    # the window must actually bite vs the unconstrained run
    full = _oracle_funnel()
    assert sum(1 for u in want if want[u][1] is None) > sum(
        1 for u in full if full[u][1] is None
    )


def test_funnel_counts_and_chain_break(spark):
    cnt = {r.step: (r.event_type, r.n_users, r.frac_of_step1)
           for r in funnel_counts(_events(spark), STEPS).collect()}
    want = _oracle_funnel()
    n1 = sum(1 for w in want.values() if w[0] is not None)
    n2 = sum(1 for w in want.values() if w[1] is not None)
    n3 = sum(1 for w in want.values() if w[2] is not None)
    assert cnt[1] == ("view", n1, 1.0)
    assert cnt[2][1] == n2 and cnt[2][2] == pytest.approx(n2 / n1)
    assert cnt[3][1] == n3 and cnt[3][2] == pytest.approx(n3 / n1)
    assert n1 >= n2 >= n3 > 0  # monotone funnel with real conversions
    prog = funnel_progress(_events(spark), STEPS).collect()
    for r in prog:  # chain break: no t_3 without t_2 without t_1
        assert not (r.t_2 is not None and r.t_1 is None)
        assert not (r.t_3 is not None and r.t_2 is None)
        assert r.steps_completed == sum(t is not None for t in (r.t_1, r.t_2, r.t_3))


def test_funnel_validation(spark):
    ev = _events(spark)
    with pytest.raises(ValueError):
        funnel_progress(ev, ["view"])
    with pytest.raises(ValueError):
        funnel_progress(ev, ["view", "view"])
    with pytest.raises(ValueError):
        funnel_progress(ev, STEPS, within_s=0)
