"""vector2dggs_spark — a PySpark-native DGGS indexing & spatial-join engine.

From-scratch Spark restatement of the semantics of
manaakiwhenua/vector2dggs (read-only reference at /root/reference):
vector geometries → DGGS cell tables with parent-cell partitioning,
compaction, cell-ID spatial joins, kNN via ring expansion, and
raster↔vector tile assignment — over interleaved text+media document
tables, built for multi-executor clusters (tested on local[N]).
"""
from vector2dggs_spark.dggs import available, get_backend
from vector2dggs_spark.plans.pipeline import IndexResult, index, write_partitioned
from vector2dggs_spark.session import get_spark

__all__ = [
    "available",
    "get_backend",
    "get_spark",
    "index",
    "write_partitioned",
    "IndexResult",
]
__version__ = "0.1.0"
