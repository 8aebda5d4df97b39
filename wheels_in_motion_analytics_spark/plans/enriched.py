"""Enriched star-join plan — the engine's flagship pipeline.

Re-expresses the reference's serving-layer pattern: the materialized
``journeys_enriched`` table (fact joined to every dimension,
/root/reference/README.md:224,321) feeding dashboard aggregations like "Rides
By Station Name" (group-count, sort desc, top-k —
images/analytics_dashboard_2.PNG). Here the star is
lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.

Physical strategy: the fact table is the only large input; every dimension is
broadcast (`F.broadcast`), so the whole star resolves as a chain of broadcast
hash joins with ZERO shuffles before the final aggregation — the plan that
survives a 100 TB fact table, because no dimension ever needs co-partitioning
with the fact. The single shuffle is the partial/final hash aggregation on the
(few) group keys. Verify with ``df.explain('formatted')``: one Exchange, all
joins BroadcastHashJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.compat import dsum
from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table


def enriched_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fact ⋈ all dims — the `journeys_enriched` analogue.

    Kept as a reusable view-producing plan: serving queries compose on top of
    it and Catalyst prunes the unused dimension columns per query.
    """
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")

    return (
        lineitem.join(F.broadcast(orders.select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")),
                      F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )


@register(
    "star_join_enriched",
    category="joins",
    doc="J2 star join + dashboard agg: revenue and ride count per region/nation "
    "(reference README.md:224 journeys_enriched; dashboard A4 pattern).",
    oracle="""
SELECT r_name, n_name,
       COUNT(*) AS num_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def star_join_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = enriched_lineitems(spark, sf_dir)
    return df.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("num_items"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@register(
    "flagship_rides_by_dim",
    category="plans",
    doc="Flagship dashboard query: 'Rides By Station Name' transposed — "
    "count per customer name over the enriched star, top 10 "
    "(images/analytics_dashboard_2.PNG, A4).",
    oracle="""
SELECT c_name, COUNT(*) AS num_rides
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_name
ORDER BY num_rides DESC, c_name ASC
LIMIT 10
""",
)
def flagship_rides_by_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    return (
        lineitem.select("l_orderkey")
        .join(F.broadcast(orders.select("o_orderkey", "o_custkey")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name")
        .agg(F.count(F.lit(1)).alias("num_rides"))
        # Deterministic top-k: tiebreak on the group key (SURVEY.md §4.3).
        .orderBy(F.desc("num_rides"), F.asc("c_name"))
        .limit(10)
    )
