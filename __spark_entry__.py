"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over :mod:`fireball_data_processing_spark.queries`, which holds
the operator-by-operator query catalog (one entry per implemented operator
from SURVEY.md section 2) and the matching DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from fireball_data_processing_spark import queries as _catalog

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full heuristics suite as one grouped aggregation
    (the reference's 14-scan workload collapsed into a single job)."""
    return _catalog.get("heuristics_matrix").fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
