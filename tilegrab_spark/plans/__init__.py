from tilegrab_spark.plans.lineage import MetricsStore
from tilegrab_spark.plans.pipeline import Engine
from tilegrab_spark.plans.snapshots import (
    CommitConflict,
    SnapshotMetricsStore,
    SnapshotNotFound,
    SnapshotTable,
)

__all__ = [
    "MetricsStore",
    "Engine",
    "SnapshotTable",
    "SnapshotMetricsStore",
    "CommitConflict",
    "SnapshotNotFound",
]
