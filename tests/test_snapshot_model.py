"""Model-based randomized test for the snapshot-table core: a scripted
sequence of append / CoW-merge / MoR-delete / materialize / compact /
data-compact / rollback ops runs against both the real SnapshotTable
and a plain python dict model; after EVERY op the table's read() must
equal the model, and at the end every historical snapshot must still
equal the model's recorded history (time travel under churn).

Deterministic seeds — no flakes; failures print the op trace."""

import random

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.plans.snapshots import SnapshotTable


def _df(spark, rows):
    return spark.createDataFrame(
        [(int(k), str(v)) for k, v in rows], "id long, v string"
    )


def _read_state(t):
    return {r.id: r.v for r in t.read().collect()}


@pytest.mark.parametrize("seed", [1, 7])
def test_model_equivalence_under_churn(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = SnapshotTable(spark, str(tmp_path / f"mm{seed}"))
    model: dict = {}
    history: dict = {}  # seq -> model snapshot
    tombstoned = False
    next_val = [0]
    next_key = [0]
    trace = []

    def fresh_rows(n):
        """Appends are append-only (NOT upserts): keys must be globally
        fresh or the table would hold duplicate rows the dict model
        can't represent. Merges overwrite existing keys instead."""
        out = []
        for _ in range(n):
            next_val[0] += 1
            out.append((next_key[0], f"v{next_val[0]}"))
            next_key[0] += 1
        return out

    def merge_rows_gen(n):
        out = {}
        keys = sorted(model) if model else []
        for _ in range(n):
            next_val[0] += 1
            if keys and rng.random() < 0.7:
                out[rng.choice(keys)] = f"v{next_val[0]}"
            else:
                out[next_key[0]] = f"v{next_val[0]}"
                next_key[0] += 1
        return list(out.items())

    # first op must be an append
    rows = fresh_rows(8)
    seq = t.append(_df(spark, rows), stat_cols=("id",))
    model.update(rows)
    history[seq] = dict(model)
    trace.append(("append", rows))

    for step in range(12):
        op = rng.choice(
            ["append", "merge", "delete_mor", "materialize", "compact_meta",
             "compact_data", "rollback"]
        )
        try:
            if op == "append":
                rows = fresh_rows(rng.randrange(1, 6))
                seq = t.append(_df(spark, rows), stat_cols=("id",))
                model.update(rows)
            elif op == "merge":
                if tombstoned:
                    continue  # CoW merge is blocked; skip (tested elsewhere)
                rows = merge_rows_gen(rng.randrange(1, 5))
                seq = t.merge_rows(_df(spark, rows), ("id",), stat_cols=("id",))
                model.update(rows)
            elif op == "delete_mor":
                if not model:
                    continue
                keys = rng.sample(sorted(model), min(3, len(model)))
                kdf = spark.createDataFrame([(int(k),) for k in keys], "id long")
                seq = t.delete_rows(kdf, ("id",), mode="mor")
                for k in keys:
                    model.pop(k, None)
                tombstoned = True
            elif op == "materialize":
                if t.current_seq() == 0:
                    continue
                seq = t.materialize_deletes(stat_cols=("id",))
                tombstoned = False
            elif op == "compact_meta":
                seq = t.compact_manifests()
            elif op == "compact_data":
                seq = t.compact_data_files(
                    target_bytes=10**9, stat_cols=("id",)
                )
                tombstoned = False  # folds tombstones
                if seq in history:  # metadata no-op returned current seq
                    trace.append((op, "noop"))
                    continue
            else:  # rollback to a random historical snapshot
                if len(history) < 2:
                    continue
                target = rng.choice(sorted(history))
                seq = t.rollback(target)
                model = dict(history[target])
                # a rollback can resurrect tombstone manifests
                tombstoned = True  # conservative: skip CoW merges after
        except Exception as e:  # pragma: no cover - debugging aid
            raise AssertionError(f"step {step} op {op} failed: {e}\n{trace}")
        history[seq] = dict(model)
        trace.append((op, seq))
        got = _read_state(t)
        assert got == model, f"divergence after {trace}"

    # time travel: every recorded snapshot still reads as its model state
    for seq, snap_model in history.items():
        got = {r.id: r.v for r in t.read(as_of=seq).collect()}
        assert got == snap_model, f"time travel diverged at seq {seq}\n{trace}"
