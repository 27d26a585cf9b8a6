"""Shared plumbing for the parquet-backed incremental streaming stores
(tracksim_stream, fingerprint_stream): parameter pinning and
idempotent per-batch state commits.

Replay contract: foreachBatch is at-least-once — a crashed-then-replayed
batch re-runs with the SAME batch_id. State appends must therefore be
idempotent: :func:`commit_batch` writes each batch into its own
``batch_id=N`` partition directory with overwrite mode, so a replay
rewrites byte-identical files instead of double-appending rows (the
failure a plain ``mode("append")`` has: duplicated state rows silently
double votes / duplicate pairs in every later batch).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def check_params(
    spark: SparkSession, state_path: str, params: dict, *, write: bool
) -> None:
    """Verify ``params`` against the pinned ``_params.json`` if one
    exists (mismatch raises — silently changing blocking/threshold
    parameters mid-stream would miss pairs); with ``write=True`` (the
    commit path) pin them on first use. Dry runs (``commit=False``)
    pass ``write=False`` so they never create state.

    The pin goes through the same Hadoop FileSystem API as
    :func:`load_state`/:func:`commit_batch` — a local ``os.path`` probe
    would never find the pin on ``hdfs://``/``s3a://`` state paths and
    the fail-loudly contract would silently never engage."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(state_path, "_params.json")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(p):
        stream = fs.open(p)
        try:
            raw = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()
        stored = json.loads(raw)
        if stored != params:
            raise ValueError(
                f"incremental state at {state_path} was built with {stored}, "
                f"got {params}; use a fresh state_path to change parameters"
            )
    elif write:
        # overwrite=False: if two writers race past the exists() probe,
        # the loser fails loudly instead of silently re-pinning
        out = fs.create(p, False)
        try:
            out.write(bytearray(json.dumps(params, sort_keys=True).encode("utf-8")))
        finally:
            out.close()


def load_state(spark: SparkSession, path: str) -> DataFrame | None:
    """The accumulated state table (with its ``batch_id`` partition
    column), or None before the first commit."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    return spark.read.parquet(path)


def commit_batch(df: DataFrame, path: str, batch_id: int) -> None:
    """Idempotently persist one batch's state rows: overwrite the
    batch's own ``batch_id=N`` partition directory — an at-least-once
    replay rewrites the identical files, never duplicating rows."""
    df.write.mode("overwrite").parquet(
        os.path.join(path, f"batch_id={int(batch_id)}")
    )
