"""epoch_commit: delta commits against the snapshot store.

Oracle: after committing epoch B over epoch A, the table must read
exactly as epoch B (with/without pruning), epoch A must stay readable
via time travel, and the delta classification counts must match the
hand-computed diff."""

import numpy as np
import pandas as pd
import pytest

from tilegrab_spark.plans.epochs import epoch_commit
from tilegrab_spark.plans.snapshots import SnapshotTable


def _epoch(spark, rows):
    pdf = pd.DataFrame(rows, columns=["cell", "bytes", "caption"])
    return spark.createDataFrame(pdf.assign(bytes=pdf["bytes"].map(bytes)))


def _rows(spark, df):
    return {
        r["cell"]: (bytes(r["bytes"]), r["caption"])
        for r in df.select("cell", "bytes", "caption").collect()
    }


def test_delta_commit_counts_read_and_time_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    a = [(i, bytes([i % 256] * 8), f"cap{i}") for i in range(50)]
    r0 = epoch_commit(
        t, _epoch(spark, a), key_cols=("cell",), content_cols=("bytes", "caption"),
        stat_cols=("cell",),
    )
    assert r0["n_new"] == 50 and r0["n_changed"] == 0
    seq_a = r0["seq"]

    # epoch B: 5 changed payloads, 3 changed captions, 4 new, 6 removed
    b = []
    for (c, by, cap) in a:
        if c < 5:
            b.append((c, bytes([99] * 8), cap))  # payload change
        elif c < 8:
            b.append((c, by, cap + "!"))  # caption change
        elif c >= 44:
            continue  # removed
        else:
            b.append((c, by, cap))
    b += [(100 + i, bytes([7] * 8), f"new{i}") for i in range(4)]
    r1 = epoch_commit(
        t, _epoch(spark, b), key_cols=("cell",), content_cols=("bytes", "caption"),
        prune_missing=True, stat_cols=("cell",),
    )
    assert r1["n_new"] == 4
    assert r1["n_changed"] == 8
    assert r1["n_unchanged"] == 50 - 5 - 3 - 6
    assert r1["n_deleted"] == 6

    # table now reads exactly as epoch B
    got = _rows(spark, t.read())
    want = {c: (by, cap) for (c, by, cap) in b}
    assert got == want
    # epoch A still readable via time travel
    got_a = _rows(spark, t.read(as_of=seq_a))
    assert got_a == {c: (by, cap) for (c, by, cap) in a}


def test_unchanged_epoch_writes_nothing(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    a = [(i, bytes([i % 7] * 4), f"c{i}") for i in range(20)]
    epoch_commit(t, _epoch(spark, a), key_cols=("cell",),
                 content_cols=("bytes", "caption"), stat_cols=("cell",))
    seq_before = t.current_seq()
    r = epoch_commit(t, _epoch(spark, a), key_cols=("cell",),
                     content_cols=("bytes", "caption"), prune_missing=True,
                     stat_cols=("cell",))
    assert r["n_unchanged"] == 20
    assert r["n_new"] == r["n_changed"] == r["n_deleted"] == 0
    assert t.current_seq() == seq_before  # no snapshot written at all


def test_missing_kept_without_prune(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    a = [(i, b"x", f"c{i}") for i in range(10)]
    epoch_commit(t, _epoch(spark, a), key_cols=("cell",),
                 content_cols=("bytes",), stat_cols=("cell",))
    b = [(i, b"x", f"c{i}") for i in range(5)]  # half disappear
    r = epoch_commit(t, _epoch(spark, b), key_cols=("cell",),
                     content_cols=("bytes",), stat_cols=("cell",))
    assert r["n_deleted"] == 0
    assert t.read().count() == 10  # missing rows retained


def test_retry_is_idempotent(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    a = [(i, bytes([i]), f"c{i}") for i in range(12)]
    epoch_commit(t, _epoch(spark, a), key_cols=("cell",),
                 content_cols=("bytes", "caption"), stat_cols=("cell",))
    b = [(i, bytes([i + 1]), f"c{i}") for i in range(12)]
    r1 = epoch_commit(t, _epoch(spark, b), key_cols=("cell",),
                      content_cols=("bytes", "caption"), stat_cols=("cell",))
    assert r1["n_changed"] == 12
    # "killed after commit, re-run the same epoch": classifies as clean
    r2 = epoch_commit(t, _epoch(spark, b), key_cols=("cell",),
                      content_cols=("bytes", "caption"), stat_cols=("cell",))
    assert r2["n_changed"] == 0 and r2["n_unchanged"] == 12
    got = _rows(spark, t.read())
    assert got == {c: (by, cap) for (c, by, cap) in b}


def test_validation(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = _epoch(spark, [(1, b"x", "c")])
    with pytest.raises(ValueError, match="key_cols"):
        epoch_commit(t, df, key_cols=(), content_cols=("bytes",))
    with pytest.raises(ValueError, match="content_cols"):
        epoch_commit(t, df, key_cols=("cell",), content_cols=())
