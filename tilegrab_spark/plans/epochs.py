"""Incremental epoch commit — the daily tile-refresh pattern at 100 TB.

A live tile/image corpus is re-delivered in EPOCHS (today's imagery,
this week's crawl). Between epochs almost everything is unchanged, so
rewriting the table per epoch is 1000x too much I/O; the production
shape is a DELTA COMMIT against the snapshot store (plans/snapshots.py,
the Iceberg-shaped table):

1. **change classification never touches payload bytes twice** — the
   current table and the new epoch are both projected to
   ``key_cols + xxhash64(content_cols)`` (a few dozen bytes/row); one
   full-outer join on the keys classifies every row as unchanged /
   changed / new / missing. With both sides key-clustered this is one
   co-partitioned scalar join.
2. **only the changed/new slice is written** — ``merge_rows`` rewrites
   only data files whose manifest key stats intersect the update
   envelope (file-pruned copy-on-write); unchanged files keep their
   manifest entries verbatim. With Z-order-clustered files a localized
   daily delta rewrites a handful of files, not the table.
3. **missing keys optionally tombstone** (``prune_missing=True``) via
   ``delete_rows`` — a second atomic commit; both commits are CAS'd and
   idempotent to retry, so a killed job resumes by re-running the same
   epoch (the classification re-derives the same, now-smaller, delta).
4. **history is free** — the previous epoch remains readable via time
   travel (``table.read(as_of=seq)``), which is what makes change
   detection (operators/change.py tile_diff) runnable BETWEEN epochs of
   one store.

Content hashing uses Spark's ``xxhash64`` over the declared content
columns — an exact change detector (the right default for a table of
record; perceptual near-dup policy belongs upstream in the dedup
operators, not in the storage commit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tilegrab_spark.plans.snapshots import SnapshotTable

__all__ = ["epoch_commit"]


def epoch_commit(
    table: SnapshotTable,
    epoch_df: DataFrame,
    *,
    key_cols: tuple,
    content_cols: tuple,
    prune_missing: bool = False,
    stat_cols: tuple = (),
    summary: dict | None = None,
) -> dict:
    """Commit ``epoch_df`` (the FULL new epoch, unique per key — dedupe
    upstream) as a delta against the table's current snapshot. Returns
    ``{"seq", "n_new", "n_changed", "n_unchanged", "n_deleted"}`` where
    ``seq`` is the last snapshot written (the merge commit, or the
    delete commit when ``prune_missing`` removed rows).

    Module docstring for the shape; key properties: unchanged rows cost
    one hash-projection scan and zero writes; the merge rewrites only
    manifest-stat-intersecting files (pass the cluster key in
    ``stat_cols`` on every commit to keep that pruning effective);
    retries are idempotent."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    if not content_cols:
        raise ValueError("content_cols must be non-empty")
    new_h = epoch_df.select(
        *keys, F.xxhash64(*[F.col(c) for c in content_cols]).alias("_h_new")
    )

    if table.current_seq() == 0:
        n = epoch_df.count()
        seq = table.append(epoch_df, stat_cols=stat_cols,
                           summary={"epoch_op": "initial", **(summary or {})})
        return {"seq": seq, "n_new": n, "n_changed": 0,
                "n_unchanged": 0, "n_deleted": 0}

    cur_h = table.read().select(
        *[F.col(k).alias(f"_c_{k}") for k in keys],
        F.xxhash64(*[F.col(c) for c in content_cols]).alias("_h_cur"),
    )
    cond = None
    for k in keys:
        c = F.col(k) == F.col(f"_c_{k}")
        cond = c if cond is None else (cond & c)
    cls = new_h.join(cur_h, on=cond, how="full_outer").select(
        *[F.coalesce(F.col(k), F.col(f"_c_{k}")).alias(k) for k in keys],
        F.when(F.col("_h_cur").isNull(), F.lit("new"))
        .when(F.col("_h_new").isNull(), F.lit("missing"))
        .when(F.col("_h_new") == F.col("_h_cur"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("_cls"),
    ).localCheckpoint()

    counts = {r["_cls"]: r["n"] for r in cls.groupBy("_cls").agg(F.count("*").alias("n")).collect()}
    n_new = int(counts.get("new", 0))
    n_changed = int(counts.get("changed", 0))
    n_unchanged = int(counts.get("unchanged", 0))
    n_missing = int(counts.get("missing", 0))

    seq = table.current_seq()
    if n_new or n_changed:
        upsert_keys = cls.filter(F.col("_cls").isin("new", "changed")).select(*keys)
        updates = epoch_df.join(upsert_keys, on=keys, how="leftsemi")
        seq = table.merge_rows(
            updates, tuple(keys), stat_cols=stat_cols,
            summary={"epoch_op": "delta_merge", "n_new": n_new,
                     "n_changed": n_changed, **(summary or {})},
        )
    n_deleted = 0
    if prune_missing and n_missing:
        gone = cls.filter(F.col("_cls") == "missing").select(*keys)
        seq = table.delete_rows(
            gone, tuple(keys), stat_cols=stat_cols,
            summary={"epoch_op": "delta_prune", "n_deleted": n_missing,
                     **(summary or {})},
        )
        n_deleted = n_missing
    return {"seq": seq, "n_new": n_new, "n_changed": n_changed,
            "n_unchanged": n_unchanged, "n_deleted": n_deleted}
