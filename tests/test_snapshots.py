"""Snapshot table layer (plans/snapshots.py): atomic commits, time
travel, crash/resume, concurrency CAS, manifest compaction, expiry, and
stats-based file pruning (the Iceberg-metrics-table leg of the north
rule)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.plans.snapshots import (
    CommitConflict,
    SnapshotMetricsStore,
    SnapshotNotFound,
    SnapshotTable,
)


def _df(spark, ids):
    return spark.createDataFrame([(int(i), f"v{i}") for i in ids], "id long, v string")


def test_append_read_roundtrip_and_history(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    assert t.current_seq() == 0
    s1 = t.append(_df(spark, range(10)))
    s2 = t.append(_df(spark, range(10, 15)))
    assert (s1, s2) == (1, 2)
    assert t.read().count() == 15
    assert sorted(r.id for r in t.read(as_of=1).collect()) == list(range(10))
    hist = t.snapshots()
    assert [h["seq"] for h in hist] == [1, 2]
    assert hist[1]["parent_seq"] == 1
    assert all(h["operation"] == "append" for h in hist)


def test_empty_read_raises_and_schema_pinned(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    with pytest.raises(SnapshotNotFound):
        t.read()
    t.append(_df(spark, [1]))
    assert t.schema() == _df(spark, [1]).schema


def test_schema_mismatch_rejected(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [1]))
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(spark.createDataFrame([(1.5,)], "x double"))


def test_uncommitted_data_invisible_and_crash_resume(spark, tmp_path):
    """The core guarantee: data files written without a snapshot commit
    (= a job killed between the data write and the metadata commit) are
    invisible to readers; a stale/ahead version-hint is repaired."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, range(5)))
    # simulate the kill: data + manifest written, NO snapshot commit
    t._write_data(_df(spark, range(100, 200)), ())
    assert t.read().count() == 5
    assert t.current_seq() == 1
    # hint pointing past the committed history is rolled back+forward
    with open(t._hint_path(), "w") as f:
        f.write("9\n")
    assert t.current_seq() == 1
    assert t.read().count() == 5
    # and a deleted hint recovers by roll-forward from zero
    os.remove(t._hint_path())
    assert t.current_seq() == 1


def test_commit_conflict_cas_and_retry(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [1]))
    # occupy the next sequence number as a concurrent winner would
    s = t._load_snapshot(1)
    blocker = os.path.join(t.meta_dir, "snap-00000002.json")
    with open(blocker, "x") as f:
        json.dump({**s, "seq": 2, "parent_seq": 1, "snapshot_id": "f" * 32}, f)
    # append retries past the conflict onto seq 3 and stays consistent
    assert t.append(_df(spark, [2])) == 3
    # content = snap-1's file (re-listed via the blocker's manifests)
    # plus the new append
    assert sorted(r.id for r in t.read().collect()) == [1, 2]
    # _commit's hard-link CAS itself: a writer with a stale view of the
    # head (another commit landed after it read current_seq) must fail,
    # not overwrite
    t.current_seq = lambda: 2  # stale — seq 3 already exists
    with pytest.raises(FileExistsError):
        t._commit(list(s["manifests"]), s["schema"], "append")


def test_rollback_restores_content_forward(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, range(4)))
    t.append(_df(spark, range(4, 9)))
    seq = t.rollback(1)
    assert seq == 3
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 3]
    # history intact: the rolled-back state is still readable
    assert t.read(as_of=2).count() == 9
    assert t.snapshots()[-1]["operation"] == "rollback"


def test_compact_manifests_equal_content(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    for lo in range(0, 30, 10):
        t.append(_df(spark, range(lo, lo + 10)))
    before = sorted(r.id for r in t.read().collect())
    seq = t.compact_manifests()
    assert len(t._load_snapshot(seq)["manifests"]) == 1
    assert sorted(r.id for r in t.read().collect()) == before


def test_expire_snapshots_gc(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, range(4)))
    t.append(_df(spark, range(4, 8)))
    t.rollback(1)  # strands snap-2's data files once expired
    removed = t.expire_snapshots(keep_last=1)
    assert removed["snapshots"] == 2
    assert removed["data_files"] >= 1  # snap-2's commit files are unreferenced
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 3]
    with pytest.raises(SnapshotNotFound):
        t.read(as_of=2)


def test_scan_pruning_by_key_stats(spark, tmp_path):
    """Per-file min/max stats prune whole files at plan time: disjoint
    key-range commits → a range scan plans only the matching files."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    for lo in (0, 1000, 2000, 3000):
        df = spark.createDataFrame(
            [(lo + i,) for i in range(100)], "morton_key long"
        ).coalesce(1)
        t.append(df, stat_cols=("morton_key",))
    all_files = t.scan_files()
    hit = t.scan_files(key_col="morton_key", key_ranges=[(1040, 1060), (2999, 3001)])
    assert len(all_files) == 4
    # [1040,1060] hits the 1000-1099 file; [2999,3001] straddles the gap
    # and hits only the 3000-3099 file (2000-2099 excluded by stats)
    assert len(hit) == 2
    got = t.read(key_col="morton_key", key_ranges=[(1040, 1060)])
    # pruning is plan-level; correctness still requires the predicate
    got = got.filter(F.col("morton_key").between(1040, 1060))
    assert got.count() == 21
    # no-stats column: conservatively keeps everything
    assert len(t.scan_files(key_col="absent", key_ranges=[(0, 1)])) == 4


def test_snapshot_metrics_store_resume_excludes_uncommitted(spark, tmp_path):
    """North-rule resume: a metrics append that never committed (killed
    job) leaves those cells un-committed, so resume_filter re-emits
    exactly them."""
    from tilegrab_spark.plans.lineage import _stage_metrics

    ms = SnapshotMetricsStore(spark, str(tmp_path / "metrics"))
    work = spark.range(0, 20).select(F.col("id").alias("cell_id"))
    assert ms.resume_filter(work, "fetch").count() == 20  # empty store
    ms.append_stage(work.filter("cell_id < 8"), run_id="r1", stage="fetch")
    # crashed second append: data written, snapshot NOT committed
    m2 = _stage_metrics(work.filter("cell_id >= 15"), run_id="r1", stage="fetch")
    ms.table._write_data(m2, ())
    remaining = sorted(r.cell_id for r in ms.resume_filter(work, "fetch").collect())
    assert remaining == list(range(8, 20))
    # summary/latest run over the snapshot-consistent view
    assert ms.summary().agg(F.sum("cells")).first()[0] == 8
    assert ms.latest().count() == 8
    # time travel over metrics history
    ms.append_stage(work.filter("cell_id >= 8"), run_id="r2", stage="fetch")
    assert ms.read(as_of=1).count() <= ms.read().count()
    assert ms.resume_filter(work, "fetch").count() == 0


def test_engine_metrics_format_snapshot(spark, tmp_path):
    from tilegrab_spark.plans.pipeline import Engine

    eng = Engine(spark, metrics_path=str(tmp_path / "m"), metrics_format="snapshot")
    assert isinstance(eng.metrics, SnapshotMetricsStore)
    with pytest.raises(ValueError, match="metrics_format"):
        Engine(spark, metrics_path=str(tmp_path / "m2"), metrics_format="bogus")


# ---------------------------------------------------------------- merge/delete


def test_merge_upsert_semantics(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "m"))
    t.append(_df(spark, range(10)), stat_cols=("id",))
    upd = spark.createDataFrame(
        [(3, "NEW3"), (7, "NEW7"), (42, "INS42")], "id long, v string"
    )
    seq = t.merge_rows(upd, ("id",), stat_cols=("id",))
    got = {r.id: r.v for r in t.read().collect()}
    want = {i: f"v{i}" for i in range(10)}
    want.update({3: "NEW3", 7: "NEW7", 42: "INS42"})
    assert got == want
    # time travel: pre-merge content intact
    assert {r.id: r.v for r in t.read(as_of=1).collect()} == {
        i: f"v{i}" for i in range(10)
    }
    assert t.snapshots()[-1]["operation"] == "merge"
    assert seq == 2


def test_merge_rewrites_only_overlapping_files(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "p"))
    # three appends with DISJOINT id ranges -> three file sets with stats
    t.append(_df(spark, range(0, 100)).coalesce(1), stat_cols=("id",))
    t.append(_df(spark, range(100, 200)).coalesce(1), stat_cols=("id",))
    t.append(_df(spark, range(200, 300)).coalesce(1), stat_cols=("id",))
    before = {e["path"] for e in t.scan_files()}
    upd = spark.createDataFrame([(150, "X")], "id long, v string")
    t.merge_rows(upd, ("id",), stat_cols=("id",))
    after = t.scan_files()
    after_paths = {e["path"] for e in after}
    # the two disjoint files' entries survive VERBATIM (no rewrite)
    untouched = {p for p in before if "data/" in p}
    kept = before & after_paths
    assert len(kept) == 2, (before, after_paths)
    summary = t.snapshots()[-1]["summary"]
    assert summary["files_kept"] == 2 and summary["files_rewritten"] == 1
    assert {r.v for r in t.read().collect() if r.id == 150} == {"X"}
    assert t.read().count() == 300


def test_delete_rows_and_noop_paths(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "d"))
    t.append(_df(spark, range(0, 50)).coalesce(1), stat_cols=("id",))
    t.append(_df(spark, range(100, 150)).coalesce(1), stat_cols=("id",))
    keys = spark.createDataFrame([(10,), (11,)], "id long")
    t.delete_rows(keys, ("id",), stat_cols=("id",))
    assert t.read().count() == 98
    assert t.snapshots()[-1]["operation"] == "delete"
    assert t.snapshots()[-1]["summary"]["files_kept"] == 1
    # delete of keys disjoint from every file: metadata no-op (same seq)
    head = t.current_seq()
    assert t.delete_rows(
        spark.createDataFrame([(999,)], "id long"), ("id",), stat_cols=("id",)
    ) == head
    # empty updates: no-op
    assert t.merge_rows(
        spark.createDataFrame([], "id long, v string"), ("id",)
    ) == head


def test_merge_on_empty_table_appends(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "e"))
    seq = t.merge_rows(_df(spark, [1, 2]), ("id",), stat_cols=("id",))
    assert seq == 1 and t.read().count() == 2
    with pytest.raises(SnapshotNotFound):
        SnapshotTable(spark, str(tmp_path / "e2")).delete_rows(
            spark.createDataFrame([(1,)], "id long"), ("id",)
        )


def test_merge_cas_conflict(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "c"))
    t.append(_df(spark, range(5)), stat_cols=("id",))
    # simulate a concurrent commit between plan-time and commit-time by
    # monkeypatching current_seq to report a moved head at the CAS check
    upd = spark.createDataFrame([(1, "X")], "id long, v string")
    real = t.current_seq
    calls = {"n": 0}

    def moving_head():
        calls["n"] += 1
        return real() + (1 if calls["n"] > 2 else 0)

    t.current_seq = moving_head
    with pytest.raises(CommitConflict):
        t.merge_rows(upd, ("id",), stat_cols=("id",))


def test_merge_schema_mismatch_rejected(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "s"))
    t.append(_df(spark, [1]))
    with pytest.raises(ValueError, match="schema mismatch"):
        t.merge_rows(spark.createDataFrame([(1.0,)], "x double"), ("x",))


# ------------------------------------------------------------ merge-on-read


def test_mor_delete_read_and_materialize(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "mor"))
    t.append(_df(spark, range(10)), stat_cols=("id",))
    keys = spark.createDataFrame([(3,), (7,)], "id long")
    s = t.delete_rows(keys, ("id",), mode="mor")
    assert t.snapshots()[-1]["operation"] == "delete-mor"
    # tombstones applied at read; data files untouched on disk
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 4, 5, 6, 8, 9]
    # time travel BEFORE the delete sees everything
    assert t.read(as_of=1).count() == 10
    # sequence semantics: re-appending a deleted key makes it visible
    t.append(spark.createDataFrame([(3, "BACK")], "id long, v string"))
    got = {r.id: r.v for r in t.read().collect()}
    assert got[3] == "BACK" and 7 not in got
    # materialize folds the debt; content identical, tombstones gone
    before = {(r.id, r.v) for r in t.read().collect()}
    t.materialize_deletes(stat_cols=("id",))
    assert {(r.id, r.v) for r in t.read().collect()} == before
    assert t.snapshots()[-1]["summary"]["materialized_deletes"] is True
    # after materialization CoW merges are allowed again
    t.merge_rows(
        spark.createDataFrame([(0, "Z")], "id long, v string"),
        ("id",),
        stat_cols=("id",),
    )
    assert {r.v for r in t.read().collect() if r.id == 0} == {"Z"}


def test_mor_blocks_cow_until_materialized(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "mor2"))
    t.append(_df(spark, range(5)), stat_cols=("id",))
    t.delete_rows(spark.createDataFrame([(1,)], "id long"), ("id",), mode="mor")
    with pytest.raises(ValueError, match="materialize_deletes"):
        t.merge_rows(
            spark.createDataFrame([(2, "X")], "id long, v string"),
            ("id",),
            stat_cols=("id",),
        )
    with pytest.raises(ValueError, match="materialize_deletes"):
        # changing the tombstone key set is also blocked
        t.delete_rows(
            spark.createDataFrame([("v1",)], "v string"), ("v",), mode="mor"
        )
    t.materialize_deletes(stat_cols=("id",))
    assert sorted(r.id for r in t.read().collect()) == [0, 2, 3, 4]


def test_mor_tombstones_survive_compaction_and_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "mor3"))
    t.append(_df(spark, range(6)), stat_cols=("id",))
    t.delete_rows(spark.createDataFrame([(0,)], "id long"), ("id",), mode="mor")
    t.append(_df(spark, [100]))
    t.compact_manifests()
    # compaction preserves per-entry seqs: tombstone (seq 2) still only
    # hides seq-1 data; the seq-3 append and the re-read agree
    assert sorted(r.id for r in t.read().collect()) == [1, 2, 3, 4, 5, 100]
    assert sorted(r.id for r in t.read(as_of=2).collect()) == [1, 2, 3, 4, 5]
    # validation paths
    with pytest.raises(ValueError, match="not in table schema"):
        t.delete_rows(
            spark.createDataFrame([(1,)], "nope long"), ("nope",), mode="mor"
        )
    with pytest.raises(ValueError, match="mode"):
        t.delete_rows(
            spark.createDataFrame([(1,)], "id long"), ("id",), mode="bogus"
        )


# ---------------------------------------------------------- schema evolution


def test_widening_schema_evolution(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "ev"))
    t.append(_df(spark, range(3)), stat_cols=("id",))
    wide = spark.createDataFrame(
        [(100, "v100", 0.5)], "id long, v string, score double"
    )
    # rejected without the flag
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(wide)
    t.append(wide, allow_schema_evolution=True)
    cur = t.read()
    assert [f.name for f in cur.schema.fields] == ["id", "v", "score"]
    rows = {r.id: r.score for r in cur.collect()}
    # old rows read as NULL for the added column
    assert rows[100] == 0.5 and rows[0] is None and len(rows) == 4
    # time travel below the evolution shows the OLD shape
    old = t.read(as_of=1)
    assert [f.name for f in old.schema.fields] == ["id", "v"]
    # subsequent appends must use the evolved schema
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(_df(spark, [200]))
    # drops and type changes are rejected even with the flag
    with pytest.raises(ValueError, match="widening"):
        t.append(
            spark.createDataFrame([(1, 2.0)], "id long, score double"),
            allow_schema_evolution=True,
        )
    with pytest.raises(ValueError, match="widening"):
        t.append(
            spark.createDataFrame(
                [(1, "x", 1)], "id long, v string, score long"
            ),
            allow_schema_evolution=True,
        )


def test_merge_pruning_with_zorder_clustered_table(spark, tmp_path):
    """Cross-feature: a Z-order-clustered snapshot table gives merge_rows
    tight per-file morton ranges, so a spatially-local update batch
    rewrites only the files covering its neighborhood."""
    from tilegrab_spark.operators.layout import cluster_by_space, with_morton_key

    t = SnapshotTable(spark, str(tmp_path / "zm"))
    rows = [(5, x, y, f"p{x}_{y}") for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "z int, x long, y long, payload string")
    clustered = cluster_by_space(df, num_partitions=4)
    t.append(clustered, stat_cols=("morton_key",))
    # spatially-local update: one corner tile
    upd = with_morton_key(
        spark.createDataFrame([(5, 0, 0, "NEW")], "z int, x long, y long, payload string")
    ).select(*clustered.columns)
    t.merge_rows(upd, ("morton_key",), stat_cols=("morton_key",))
    s = t.snapshots()[-1]["summary"]
    assert s["files_rewritten"] < 4 and s["files_kept"] >= 1, s
    got = {(r.x, r.y): r.payload for r in t.read().collect()}
    assert got[(0, 0)] == "NEW" and got[(15, 15)] == "p15_15" and len(got) == 256


def test_compact_data_files(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "cd"))
    # many tiny appends -> many tiny files
    for i in range(6):
        t.append(_df(spark, range(i * 10, i * 10 + 10)).coalesce(1), stat_cols=("id",))
    assert len(t.scan_files()) == 6
    before = sorted((r.id, r.v) for r in t.read().collect())
    t.compact_data_files(target_bytes=10**9, stat_cols=("id",), sort_cols=("id",))
    after_entries = t.scan_files()
    assert len(after_entries) == 1
    assert sorted((r.id, r.v) for r in t.read().collect()) == before
    s = t.snapshots()[-1]["summary"]
    assert s["compacted_from_files"] == 6
    # re-clustered: the single file's id stats span the full range
    assert after_entries[0]["stats"]["id"] == [0, 59]
    # idempotent: already-compacted table is a metadata no-op
    head = t.current_seq()
    assert t.compact_data_files(target_bytes=1, stat_cols=("id",)) == head
    # folds MoR tombstones as a side effect
    t.delete_rows(spark.createDataFrame([(5,)], "id long"), ("id",), mode="mor")
    t.compact_data_files(target_bytes=10**9, stat_cols=("id",))
    assert t.read().count() == 59
    assert not SnapshotTable._split_entries(
        t._manifest_entries(t._load_snapshot(t.current_seq()))
    )[1]
