"""asof_join: brute-force parity, boundary/tie/tolerance/direction
semantics, multi-key, and determinism under repartitioning."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.asof import asof_join

T0 = dt.datetime(2026, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def frames(spark):
    left = _mk(
        spark,
        [
            (1, 10, _ts(5)),
            (2, 10, _ts(10)),
            (3, 10, _ts(2)),
            (4, 20, _ts(7)),
            (5, 30, _ts(1)),  # user 30 has no right rows at all
        ],
        "lid int, user int, ts timestamp",
    )
    right = _mk(
        spark,
        [
            (100, 10, _ts(1), 1.0),
            (101, 10, _ts(5), 2.0),   # equal-ts with lid=1
            (102, 10, _ts(9), 3.0),
            (103, 20, _ts(8), 4.0),   # after user 20's only left row
        ],
        "rid int, user int, ts timestamp, val double",
    )
    return left, right


def test_backward_semantics_with_equal_ts(spark, frames):
    left, right = frames
    out = {
        r["lid"]: (r["rid"], r["ts_r"])
        for r in asof_join(left, right, on="user", ts_col="ts").collect()
    }
    assert out[1] == (101, _ts(5))   # equal ts matches (<=)
    assert out[2] == (102, _ts(9))
    assert out[3] == (100, _ts(1))
    assert out[4] == (None, None)    # only later right rows exist
    assert out[5] == (None, None)    # key absent from right
    assert len(out) == 5             # strictly one output row per left row


def test_forward_direction(spark, frames):
    left, right = frames
    out = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, on="user", ts_col="ts", direction="forward"
        ).collect()
    }
    assert out == {1: 101, 2: None, 3: 101, 4: 103, 5: None}


def test_tolerance_nulls_stale_matches(spark, frames):
    left, right = frames
    out = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, on="user", ts_col="ts", tolerance="2 minutes"
        ).collect()
    }
    # lid=2 at t10 matched t9 (fresh); lid=3 at t2 matched t1 (fresh);
    # lid=4's only candidate is 6 min stale -> nulled
    assert out == {1: 101, 2: 102, 3: 100, 4: None, 5: None}


def test_right_ts_ties_pick_greatest_payload_struct(spark):
    left = _mk(spark, [(1, 7, _ts(6))], "lid int, user int, ts timestamp")
    right = _mk(
        spark,
        [(200, 7, _ts(6), 9.0), (201, 7, _ts(6), 1.0)],
        "rid int, user int, ts timestamp, val double",
    )
    row = asof_join(left, right, on="user", ts_col="ts").collect()[0]
    assert (row["rid"], row["val"]) == (201, 1.0)  # max rid wins, carries its val


def test_bruteforce_parity_random(spark):
    import random

    rnd = random.Random(42)
    lrows = [(i, rnd.randrange(8), _ts(rnd.randrange(500))) for i in range(300)]
    rrows = [
        (1000 + i, rnd.randrange(8), _ts(rnd.randrange(500)), float(i))
        for i in range(400)
    ]
    left = _mk(spark, lrows, "lid int, user int, ts timestamp")
    right = _mk(spark, rrows, "rid int, user int, ts timestamp, val double")
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left.repartition(7), right.repartition(5), on="user", ts_col="ts"
        ).collect()
    }
    # brute force: right deduped per (user, ts) by greatest (rid, val)
    best = {}
    for rid, u, ts, _v in rrows:
        k = (u, ts)
        if k not in best or rid > best[k]:
            best[k] = rid
    for lid, u, lts in lrows:
        cands = [(ts, rid) for (uu, ts), rid in best.items() if uu == u and ts <= lts]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, f"lid={lid}"


def test_multi_key_join(spark):
    left = _mk(
        spark,
        [(1, 5, "a", _ts(3)), (2, 5, "b", _ts(3))],
        "lid int, user int, kind string, ts timestamp",
    )
    right = _mk(
        spark,
        [(300, 5, "a", _ts(1), 1.0), (301, 5, "b", _ts(2), 2.0)],
        "rid int, user int, kind string, ts timestamp, val double",
    )
    out = {
        r["lid"]: r["rid"]
        for r in asof_join(left, right, on=["user", "kind"], ts_col="ts").collect()
    }
    assert out == {1: 300, 2: 301}


def test_validation(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="user", direction="sideways")
    with pytest.raises(ValueError, match="missing"):
        asof_join(left, right, on="nope")
    # tolerance is interpolated into an INTERVAL expr — only strict
    # interval literals pass the whitelist (injection surface otherwise)
    for bad in ("10 fortnights", "1 minute) OR (1=1", "minutes 10", ""):
        with pytest.raises(ValueError, match="interval"):
            asof_join(left, right, on="user", tolerance=bad)
    # the whitelisted forms still work
    asof_join(left, right, on="user", tolerance="10 minutes").collect()
    asof_join(left, right, on="user", tolerance="1 Second").collect()


def test_collision_suffix_and_column_carry(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="user", ts_col="ts", right_cols=["rid", "val"])
    assert set(out.columns) == {"lid", "user", "ts", "ts_r", "rid", "val"}
    l2 = left.withColumn("val", F.lit(0.0))
    out2 = asof_join(l2, right, on="user", ts_col="ts", right_cols=["rid", "val"])
    assert "val_r" in out2.columns and "val" in out2.columns


def test_null_right_ts_and_keys_never_match(spark):
    left = _mk(spark, [(1, 10, _ts(5)), (2, None, _ts(5))], "lid int, user int, ts timestamp")
    right = _mk(
        spark,
        [(100, 10, None, 1.0), (101, None, _ts(1), 2.0)],
        "rid int, user int, ts timestamp, val double",
    )
    for direction in ("backward", "forward"):
        out = {
            r["lid"]: r["rid"]
            for r in asof_join(
                left, right, on="user", ts_col="ts", direction=direction
            ).collect()
        }
        # NULL right ts / NULL keys can satisfy no SQL comparison
        assert out == {1: None, 2: None}, direction


def test_null_left_ts_gets_no_match_either_direction(spark):
    left = _mk(spark, [(1, 10, None)], "lid int, user int, ts timestamp")
    right = _mk(
        spark, [(100, 10, _ts(1), 1.0)], "rid int, user int, ts timestamp, val double"
    )
    for direction in ("backward", "forward"):
        row = asof_join(
            left, right, on="user", ts_col="ts", direction=direction
        ).collect()[0]
        assert row["rid"] is None, direction
