"""Hive-partitioned derived layout + partition-pruning proof.

The provided testdata tables are single parquet files, so partition pruning
— the dominant scan-cost lever at 100 TB, where a month predicate must turn
into "read 1/84th of the files", not "read everything and filter" — was only
demonstrated on self-written sink outputs (tests/test_sinks.py). This module
makes it a first-class, driver-checked operator: lineitem is re-laid-out
once per sf under ``.derived/`` partitioned by ship month (the engine's
rendition of the reference's monthly landing folders,
proc_0_ingest_to_GCP.dag.py:93-100), and the registered query filters on the
partition column so the scan's ``PartitionFilters`` prune to 3 of ~83 month
directories. ``tests/test_plan_shapes.py`` asserts both the plan shape and
the pruned file set.

The derived layout is content-deterministic (pure function of the sf_dir
lineitem), so the DuckDB oracle runs the equivalent predicate on the
original table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.compat import dsum, oracle_dsum
from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRUNE_MONTHS = ["1996-01", "1996-02", "1996-03"]


def partitioned_lineitem_path(sf_dir: str) -> str:
    """Derived-layout location, keyed by the sf directory name."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_REPO_ROOT, ".derived", sf_name, "lineitem_by_month")


def ensure_partitioned_lineitem(spark: SparkSession, sf_dir: str) -> str:
    """Write lineitem partitioned by ship_month (yyyy-MM) once per sf.

    Idempotent: a completed write leaves Spark's ``_SUCCESS`` marker and is
    never repeated — the lake-build step runs once, every downstream query
    prunes forever after. At scale this is the landing job; here it is a
    lazily-built local fixture.
    """
    path = partitioned_lineitem_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            table(spark, sf_dir, "lineitem")
            .withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
            .write.mode("overwrite")
            .partitionBy("ship_month")
            .parquet(path)
        )
    return path


def pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pruned read itself (used by both the registry query and the
    plan-shape test): month-partition filter on the partition column."""
    path = ensure_partitioned_lineitem(spark, sf_dir)
    return spark.read.parquet(path).where(F.col("ship_month").isin(PRUNE_MONTHS))


@register(
    "partition_pruned_monthly_revenue",
    category="sources",
    doc="Partition-pruning proof: lineitem re-laid-out as a hive-partitioned "
    "lake by ship month; a 3-month predicate on the partition column reaches "
    "the scan as PartitionFilters and reads 3 of ~83 month directories "
    "(asserted in tests/test_plan_shapes.py). The oracle runs the same "
    "predicate on the original single-file table — identical results, "
    "1/28th of the scan.",
    oracle=f"""
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       COUNT(*) AS n_items,
       {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
WHERE strftime(l_shipdate, '%Y-%m') IN ({", ".join(f"'{m}'" for m in PRUNE_MONTHS)})
GROUP BY 1
""",
)
def partition_pruned_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        pruned_scan(spark, sf_dir)
        .groupBy("ship_month")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


DPP_YEAR = 1996
DPP_QUARTER = 2


def month_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-derived pruning dim: the distinct order months of one
    quarter — only known after scanning orders, so static pruning can't
    use it."""
    return (
        table(spark, sf_dir, "orders")
        .where(
            (F.year("o_orderdate") == DPP_YEAR)
            & (F.quarter("o_orderdate") == DPP_QUARTER)
        )
        .select(F.date_format("o_orderdate", "yyyy-MM").alias("ship_month"))
        .distinct()
    )


def dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dynamically-pruned join itself (shared with the plan-shape test):
    partitioned fact ⋈ runtime-derived month dim on the partition column."""
    fact = spark.read.parquet(ensure_partitioned_lineitem(spark, sf_dir))
    return fact.join(month_dim(spark, sf_dir), "ship_month")


@register(
    "dpp_join_pruned_revenue",
    category="sources",
    doc="DYNAMIC partition pruning: the month predicate lives on a runtime-"
    "derived dim (distinct order months of one quarter), not on the fact, "
    "so static pruning can't fire — Catalyst instead injects a dynamic-"
    "pruning subquery into the partitioned scan's PartitionFilters "
    "(broadcast-reuse DPP, asserted in tests/test_plan_shapes.py) and the "
    "fact read still touches 3 of ~83 month directories. This is the scan "
    "lever for star joins at 100 TB where the pruning set is only known at "
    "run time. Oracle: the equivalent month-set semi-join on the original "
    "single-file table.",
    oracle=f"""
WITH months AS (
  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ship_month
  FROM orders
  WHERE year(o_orderdate) = {DPP_YEAR} AND quarter(o_orderdate) = {DPP_QUARTER}
)
SELECT m.ship_month,
       COUNT(*) AS n_items,
       {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem l
JOIN months m ON strftime(l.l_shipdate, '%Y-%m') = m.ship_month
GROUP BY 1
""",
)
def dpp_join_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        dpp_join(spark, sf_dir)
        .groupBy("ship_month")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )
