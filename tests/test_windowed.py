"""Watermarked windowed aggregation: finalized-window semantics across
incremental drops, late-within-watermark counted, too-late dropped."""

import datetime as dt

from pyspark.sql import functions as F

from tilegrab_spark.streaming.windowed import stream_windowed_counts


def _drop(spark, landing, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.mode("append").parquet(landing)


def _t(h, m=0):
    return dt.datetime(2026, 1, 1, h, m)


def test_windowed_counts_watermark(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    # drop 1: events in hours 1..3 (max ts 03:30 -> watermark 01:30)
    _drop(
        spark,
        landing,
        [
            (1, _t(1, 10), 1, "click", 1.0),
            (2, _t(1, 20), 1, "click", 2.0),
            (3, _t(2, 10), 2, "view", 3.0),
            (4, _t(3, 30), 2, "view", 4.0),
        ],
    )
    q = stream_windowed_counts(spark, landing, ckpt, out)
    q.awaitTermination(120)
    first = spark.read.parquet(out) if _exists(out) else None
    n_first = first.count() if first is not None else 0
    # only windows fully before the 01:30 watermark could finalize -> none
    assert n_first == 0

    # drop 2: a LATE-but-within-watermark row for hour 1, plus hour 6
    # (watermark -> 04:00: hours 1,2,3 finalize)
    _drop(spark, landing, [(5, _t(1, 40), 3, "click", 5.0), (6, _t(6, 0), 3, "view", 6.0)])
    q2 = stream_windowed_counts(spark, landing, ckpt, out)
    q2.awaitTermination(120)
    rows = {
        (r.window_start.hour, r.event_type): (r.n, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    assert rows[(1, "click")] == (3, 8.0)  # late 01:40 row INCLUDED
    assert rows[(2, "view")] == (1, 3.0)
    assert rows[(3, "view")] == (1, 4.0)
    assert not any(h == 6 for h, _ in rows)  # hour 6 not finalized yet

    # drop 3: a TOO-LATE row for hour 1 (behind watermark) is dropped
    _drop(spark, landing, [(7, _t(1, 50), 4, "click", 9.0), (8, _t(9, 0), 4, "view", 1.0)])
    q3 = stream_windowed_counts(spark, landing, ckpt, out)
    q3.awaitTermination(120)
    rows3 = {
        (r.window_start.hour, r.event_type): (r.n, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    # hour-1 window was already finalized; the 01:50 row must NOT re-emit
    assert rows3[(1, "click")] == (3, 8.0)
    assert rows3[(6, "view")] == (1, 6.0)  # now finalized by hour-9 watermark


def _exists(path):
    import glob

    return bool(glob.glob(f"{path}/*.parquet") or glob.glob(f"{path}/_SUCCESS"))
