"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`wheels_in_motion_analytics_spark`'s query registry —
every implemented operator family from SURVEY.md §2 registers a named query
(Spark callable) and, when SQL-expressible, a DuckDB oracle string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wheels_in_motion_analytics_spark.registry import load_all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = load_all_queries()
    return specs["flagship_rides_by_dim"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for non-SQL-expressible
    ops — driver records a weaker rows-only check for those)."""
    return {
        name: spec.oracle
        for name, spec in load_all_queries().items()
        if spec.oracle is not None
    }
