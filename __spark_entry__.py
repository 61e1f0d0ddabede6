"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over `iris_pyspark_spark.registry`: every operator from
SURVEY.md §2 is a named query with a Spark implementation and (where
SQL-expressible) a DuckDB oracle. See iris_pyspark_spark/queries/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iris_pyspark_spark.registry import load_all  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    registry = load_all()
    return registry["q1_pricing_summary"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
