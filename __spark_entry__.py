"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (interleaved documents →
geohash cells → tile assignment) at smoke scale.  ``queries()`` /
``oracle_sql()`` expose the operator inventory from SURVEY.md §2 with
DuckDB oracles wherever the op is SQL-expressible (see
vector2dggs_spark/entrypoints.py for the cross-engine determinism
rules).
"""
from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector2dggs_spark.entrypoints import QUERIES, flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
