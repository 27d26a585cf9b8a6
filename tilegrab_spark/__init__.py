"""tilegrab_spark — a from-scratch PySpark-native spatial-join + tiling
engine with the query/data-processing capabilities of thiwaK/tilegrab.

Architecture (SURVEY.md §4): declarative DataFrame plans end-to-end;
tile/cell math as pure-Catalyst expressions; geometry refine, image
decode/stitch as Arrow-batched pandas UDFs; every stage commits to a
parquet (Iceberg-style) table so a killed job resumes via anti-join on
committed cell lineage.
"""

from tilegrab_spark.session import get_spark
from tilegrab_spark.plans.pipeline import Engine

__version__ = "0.1.0"
__all__ = ["get_spark", "Engine", "__version__"]
