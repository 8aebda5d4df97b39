"""Outer/cross join surface + pattern predicates (§2b basics that the other
modules' pipelines use implicitly, registered explicitly so the inventory is
line-item complete).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table


@register(
    "left_outer_join_missing_dims",
    category="joins",
    doc="LEFT OUTER join preserving unmatched facts: order counts per "
    "customer including order-less customers (NULL-filled side aggregated "
    "with count-of-column semantics).",
    oracle="""
SELECT c_custkey, c_name, COUNT(o_orderkey) AS num_orders
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
""",
)
def left_outer_join_missing_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("num_orders"))
    )


@register(
    "full_outer_join_key_union",
    category="joins",
    doc="FULL OUTER join: union of both key spaces with per-side presence "
    "flags (supplier vs customer nation coverage).",
    oracle="""
WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
     sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
SELECT coalesce(cn.nk, sn.nk) AS nationkey,
       CAST(cn.nk IS NOT NULL AS BOOLEAN) AS has_customers,
       CAST(sn.nk IS NOT NULL AS BOOLEAN) AS has_suppliers
FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
""",
)
def full_outer_join_key_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("c_nk")).distinct()
    sn = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("s_nk")).distinct()
    return cn.join(sn, cn.c_nk == sn.s_nk, "full").select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"),
        F.col("c_nk").isNotNull().alias("has_customers"),
        F.col("s_nk").isNotNull().alias("has_suppliers"),
    )


@register(
    "cross_join_small_dims",
    category="joins",
    doc="Explicit cross join of two small dims (region × order statuses) — "
    "the only sanctioned cartesian: both sides tiny.",
    oracle="""
SELECT r_name, o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
""",
)
def cross_join_small_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region").select("r_name")
    statuses = table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.crossJoin(statuses)


@register(
    "union_all_bag",
    category="setops",
    doc="UNION ALL (bag union, duplicates preserved) — the D1 set-union's "
    "multiplicity-keeping sibling.",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def union_all_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = orders.where(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("custkey"))
    return a.unionAll(b)


@register(
    "pattern_match_suite",
    category="scalars",
    doc="LIKE / ILIKE / rlike / regexp_count predicates and extractors.",
    oracle="""
SELECT p_partkey,
       CAST(p_type LIKE '%STEEL%' AS BOOLEAN) AS like_steel,
       CAST(p_type ILIKE '%standard%' AS BOOLEAN) AS ilike_standard,
       CAST(regexp_matches(p_name, '^[a-z]+ [a-z]+') AS BOOLEAN) AS two_words,
       CAST(len(regexp_extract_all(p_name, 'a')) AS INTEGER) AS a_count
FROM part
""",
)
def pattern_match_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_type").like("%STEEL%").alias("like_steel"),
        F.col("p_type").ilike("%standard%").alias("ilike_standard"),
        F.col("p_name").rlike(r"^[a-z]+ [a-z]+").alias("two_words"),
        F.size(F.regexp_extract_all("p_name", F.lit("a"), 0)).alias("a_count"),
    )
