from tilegrab_spark.plans.lineage import MetricsStore
from tilegrab_spark.plans.pipeline import Engine

__all__ = ["MetricsStore", "Engine"]
