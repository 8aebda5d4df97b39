"""Deep relational analytics — the TPC-H shapes that stress decorrelation,
scalar subqueries, HAVING-filtered semi-joins, and argmin-per-group:

* Q17 shape — correlated per-group average threshold, decorrelated into a
  single window pass (no per-row subquery execution).
* Q18 shape — HAVING-filtered aggregate driving a fact⋈fact join.
* Q22 shape — global scalar threshold + NOT EXISTS anti-join.
* Q2 shape  — min-cost supplier per part (argmin via deterministic
  row_number; the testdata has no partsupp, so supply links derive from
  observed lineitem shipments).

Physical recipe matches plans/analytics.py: forced broadcast ONLY on
bounded dims (part/supplier, per tables.BROADCASTABLE); orders/customer/
lineitem joins carry no hint — broadcast at test scale, shuffle + AQE at
100 TB. Float aggregates decimal-accumulated (compat.py); every LIMIT has
a total-order tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.compat import dsum, oracle_dsum
from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table


@register(
    "small_qty_revenue_fraction",
    category="plans",
    doc="TPC-H Q17 shape: weekly-averaged revenue from orders whose quantity "
    "is below 30% of the part's average quantity. The correlated AVG "
    "subquery is decorrelated into one window over l_partkey — a single "
    "shuffle, no per-row re-scan. The per-part average is exact on both "
    "engines (integral quantities sum exactly in double), so the threshold "
    "comparison is deterministic.",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_weekly
FROM (
  SELECT l_extendedprice, l_quantity,
         SUM(l_quantity) OVER (PARTITION BY l_partkey)
           / COUNT(l_quantity) OVER (PARTITION BY l_partkey) AS part_avg_qty
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#23'
) t
WHERE l_quantity < 0.3 * part_avg_qty
""",
)
def small_qty_revenue_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = (
        table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    with_avg = joined.withColumn(
        "part_avg_qty",
        F.sum("l_quantity").over(w) / F.count("l_quantity").over(w),
    )
    return with_avg.where(
        F.col("l_quantity") < 0.3 * F.col("part_avg_qty")
    ).agg((dsum("l_extendedprice") / 7.0).alias("avg_weekly"))


@register(
    "large_volume_customers",
    category="plans",
    doc="TPC-H Q18 shape: customers whose single order exceeds 300 units — "
    "a HAVING-filtered aggregate (map-side combinable, groups on the join "
    "key) that then drives orders⋈customer. No broadcast hints on the "
    "fact-scaled sides; the >300 filter shrinks the aggregate output to a "
    "sliver before the joins, so at 100 TB both joins see only the "
    "qualifying orders.",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 300
) big ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""",
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "dormant_high_value_customers",
    category="plans",
    doc="TPC-H Q22 shape: per-segment count and balance of customers whose "
    "account balance beats the segment-pool positive average but who placed "
    "no order since 2000 (every customer in this testdata has SOME order, "
    "so dormancy is date-scoped). Scalar threshold = 1-row aggregate "
    "broadcast into the filter; dormant = left_anti against the date-"
    "filtered orders (filter pushed below the anti-join build side). The "
    "average is decimal-accumulated on both engines, so the > comparison "
    "cannot flake on accumulation order.",
    oracle=f"""
WITH eligible AS (
  SELECT c_custkey, c_acctbal, c_mktsegment
  FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
),
thresh AS (
  SELECT {oracle_dsum('c_acctbal')} / COUNT(c_acctbal) AS avg_bal
  FROM eligible
  WHERE c_acctbal > 0.0
)
SELECT c_mktsegment,
       COUNT(*) AS n_custs,
       {oracle_dsum('c_acctbal')} AS total_bal
FROM eligible, thresh
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
""",
)
def dormant_high_value_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    eligible = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY"))
        .select("c_custkey", "c_acctbal", "c_mktsegment")
    )
    thresh = eligible.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double") / F.count("c_acctbal")).alias("avg_bal")
    )
    recent_orders = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        eligible.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


@register(
    "min_cost_supplier_per_part",
    category="plans",
    doc="TPC-H Q2 shape: for each LARGE small-size part, the cheapest "
    "supplier observed shipping it (no partsupp table in this schema — "
    "supply links are DISTINCT (l_partkey, l_suppkey) pairs from lineitem). "
    "Argmin is row_number over (s_acctbal, s_suppkey) — fully deterministic "
    "ties. One distinct shuffle + one window shuffle; part and supplier are "
    "bounded dims, broadcast.",
    oracle="""
SELECT p_partkey, p_name, s_name, s_acctbal
FROM (
  SELECT p_partkey, p_name, s_name, s_acctbal,
         ROW_NUMBER() OVER (PARTITION BY p_partkey
                            ORDER BY s_acctbal ASC, s_suppkey ASC) AS rn
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) links
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  WHERE p_type = 'LARGE' AND p_size <= 10
) t
WHERE rn = 1
ORDER BY s_acctbal ASC, p_partkey ASC
LIMIT 20
""",
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    links = (
        table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    part = (
        table(spark, sf_dir, "part")
        .where((F.col("p_type") == "LARGE") & (F.col("p_size") <= 10))
        .select("p_partkey", "p_name")
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    w = Window.partitionBy("p_partkey").orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    return (
        links.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("p_partkey", "p_name", "s_name", "s_acctbal")
        .orderBy(F.asc("s_acctbal"), F.asc("p_partkey"))
        .limit(20)
    )
