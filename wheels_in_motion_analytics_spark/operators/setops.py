"""Set operators: INTERSECT / EXCEPT (§2b gap fill — absent in the reference,
whose only set op is the D1 UNION at journey-data-transformation.py:120).

Both compile to hash-based semi/anti aggregation in Spark — one shuffle per
side on the full row; keep the projected key narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table


@register(
    "intersect_keys",
    category="setops",
    doc="INTERSECT: customers with both a finished and an open order.",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    f_keys = orders.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o_keys = orders.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f_keys.intersect(o_keys)


@register(
    "except_keys",
    category="setops",
    doc="EXCEPT (set difference): customers with a finished order but no open order.",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    f_keys = orders.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o_keys = orders.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f_keys.subtract(o_keys)


@register(
    "except_all_bag",
    category="setops",
    doc="EXCEPT ALL (bag difference) — multiplicity-aware variant.",
    oracle="""
SELECT l_orderkey AS orderkey FROM lineitem WHERE l_returnflag = 'N'
EXCEPT ALL
SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
""",
)
def except_all_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "N").select(F.col("l_orderkey").alias("orderkey"))
    b = li.where(F.col("l_linestatus") == "F").select(F.col("l_orderkey").alias("orderkey"))
    return a.exceptAll(b)
