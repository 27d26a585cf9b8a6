"""Sessionization (gaps-and-islands) — hand-computed golden sessions."""

from datetime import datetime, timedelta

from tilegrab_spark.operators.sessions import session_summary, sessionize


def test_sessionize_golden(spark):
    t0 = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: two sessions (gap 40min between 2nd and 3rd event)
        (1, 1, t0, 1.0),
        (2, 1, t0 + timedelta(minutes=10), 2.0),
        (3, 1, t0 + timedelta(minutes=50), 4.0),
        # user 2: one session, events exactly 30min apart (<= gap keeps it)
        (4, 2, t0, 8.0),
        (5, 2, t0 + timedelta(minutes=30), 16.0),
        # user 3: single event
        (6, 3, t0, 32.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    s = {
        r.event_id: r.session_idx
        for r in sessionize(df, gap_minutes=30.0).collect()
    }
    assert s == {1: 0, 2: 0, 3: 1, 4: 0, 5: 0, 6: 0}

    summ = {
        (r.user_id, r.session_idx): (r.n_events, r.sum_value)
        for r in session_summary(df, gap_minutes=30.0).collect()
    }
    assert summ == {
        (1, 0): (2, 3.0),
        (1, 1): (1, 4.0),
        (2, 0): (2, 24.0),
        (3, 0): (1, 32.0),
    }
