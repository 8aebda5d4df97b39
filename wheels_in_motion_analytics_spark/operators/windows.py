"""Window-function operators (§2b gap fill — the reference has no window
functions; its nearest patterns are the BI share-of-total A5 and top-k A4).

Scale notes: a window partitioned by a real key (customer, user) shuffles once
on that key and streams within the partition — fine at 100 TB if the key has
enough cardinality. Windows with an EMPTY partition spec serialize onto a
single task; they appear here only on top of already-aggregated inputs.
Running sums accumulate in decimal so the emitted doubles are bit-stable
(compat.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table


@register(
    "window_rank_dense",
    category="windows",
    doc="rank / dense_rank / row_number per group over a total order.",
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice,
       rank()       OVER w AS price_rank,
       dense_rank() OVER w AS price_dense_rank,
       row_number() OVER w AS rn
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
QUALIFY rn <= 20
""",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("price_rank"),
            F.dense_rank().over(w).alias("price_dense_rank"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 20)
    )


@register(
    "window_running_sum",
    category="windows",
    doc="Running total per customer (rows UNBOUNDED PRECEDING..CURRENT), "
    "decimal-accumulated for cross-engine bit-stability.",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend
FROM orders
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "window_lag_lead",
    category="windows",
    doc="lag/lead analytic functions: previous/next event value per user.",
    oracle="""
SELECT user_id, event_id, value,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@register(
    "window_ntile_percentiles",
    category="windows",
    doc="ntile / percent_rank / cume_dist distribution functions.",
    oracle="""
SELECT c_custkey, c_acctbal,
       ntile(4)       OVER w AS quartile,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist()    OVER w, 6) AS cume
FROM customer
WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
""",
)
def window_ntile_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Empty partition spec: single-task sort — acceptable here because the
    # customer dim is small; for a fact-sized input, bucket first.
    w = Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "window_range_frame",
    category="windows",
    doc="RANGE frame over a numeric order: count of same-priority orders "
    "within ±50 of each order's total price.",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice,
       COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                      RANGE BETWEEN 50 PRECEDING AND 50 FOLLOWING) AS peers_within_50
FROM orders
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-50, 50)
    )
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("peers_within_50"),
    )


@register(
    "window_first_last",
    category="windows",
    doc="first_value/last_value with explicit frames per group.",
    oracle="""
SELECT user_id, event_id, ts,
       first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS first_event_type,
       last_value(event_type)  OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_event_type
FROM events
""",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    order = [F.asc("ts"), F.asc("event_id")]
    w_first = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_last = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.first("event_type").over(w_first).alias("first_event_type"),
        F.last("event_type").over(w_last).alias("last_event_type"),
    )
