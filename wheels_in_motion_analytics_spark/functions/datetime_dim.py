"""Date/time functions & the datetime-dimension builder (reference F1-F3).

F1 timestamp decomposition into a dim_datetime table:
/root/reference/airflow/dags/scripts/journey-data-transformation.py:156-191
(golden schema: datetime_id TIMESTAMP PK + year/week_day/month/day/hour/
minute/second INT; Spark dayofweek is Sunday=1 — the DuckDB oracle adds +1 to
its Sunday=0 dayofweek, SURVEY.md §7.2).

F2/F3 manifest date parsing/formatting:
proc_0_ingest_to_GCP.dag.py:19,37-44, web_scraper.py:41-46.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table


def decompose_timestamp(ts: Column) -> list[Column]:
    """F1: the seven dim_datetime part columns for a timestamp column."""
    return [
        F.year(ts).alias("year"),
        F.dayofweek(ts).alias("week_day"),  # Sunday=1 (Spark semantics)
        F.month(ts).alias("month"),
        F.dayofmonth(ts).alias("day"),
        F.hour(ts).alias("hour"),
        F.minute(ts).alias("minute"),
        F.second(ts).alias("second"),
    ]


def build_datetime_dim(df: DataFrame, ts_col: str) -> DataFrame:
    """F1 + D3: distinct timestamps decomposed into the datetime dimension.

    distinct() (not dropDuplicates-with-arbitrary-winner) is safe and
    deterministic here because every output column is a pure function of
    datetime_id.
    """
    ts = F.col(ts_col)
    return df.select(ts.alias("datetime_id"), *decompose_timestamp(ts)).distinct()


@register(
    "datetime_dim_explode",
    category="datetime",
    doc="F1 dim_datetime build from order timestamps "
    "(journey-data-transformation.py:156-191).",
    oracle="""
SELECT DISTINCT
       o_orderdate AS datetime_id,
       CAST(year(o_orderdate) AS INTEGER) AS year,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS week_day,
       CAST(month(o_orderdate) AS INTEGER) AS month,
       CAST(day(o_orderdate) AS INTEGER) AS day,
       CAST(hour(o_orderdate) AS INTEGER) AS hour,
       CAST(minute(o_orderdate) AS INTEGER) AS minute,
       CAST(second(o_orderdate) AS INTEGER) AS second
FROM orders
""",
)
def datetime_dim_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_datetime_dim(table(spark, sf_dir, "orders"), "o_orderdate")


@register(
    "date_scalar_suite",
    category="datetime",
    doc="date_trunc / date_add / datediff / last_day / to_date scalar surface "
    "(P4-P6 casts generalized).",
    oracle="""
SELECT event_id,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_day,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ts_hour,
       CAST(ts AS DATE) + INTERVAL 7 DAY AS plus_week,
       CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS INTEGER) AS days_since_epoch_start,
       last_day(CAST(ts AS DATE)) AS month_end
FROM events
""",
)
def date_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NTZ-native truncation: Spark's date_trunc coerces TIMESTAMP_NTZ to
    # an instant (session-TZ re-anchor), and collect() renders instants in
    # the SYSTEM zone — the raw ts_day/ts_hour/plus_week outputs would
    # shift whenever session TZ != system TZ (caught by the r10
    # hostile-session-TZ axis). date casts and date_format over NTZ are
    # wall-clock-pure under every session TZ and match the oracle's naive
    # TIMESTAMP semantics exactly.
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").cast("date").cast("timestamp_ntz").alias("ts_day"),
        F.to_timestamp_ntz(F.date_format("ts", "yyyy-MM-dd HH:00:00")).alias("ts_hour"),
        (F.col("ts").cast("date") + F.expr("INTERVAL 7 DAY")).cast("timestamp_ntz").alias("plus_week"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_start"),
        F.last_day(F.col("ts").cast("date")).alias("month_end"),
    )


@register(
    "manifest_prune_latest",
    category="datetime",
    doc="S7/F2 manifest pruning: latest partition key per group — the "
    "'pick newest manifest entry ≤ logical date' pattern "
    "(proc_0_ingest_to_GCP.dag.py:37-44) as a groupBy-max + semi-join.",
    oracle="""
SELECT o.o_orderpriority, o.o_orderkey, o.o_orderdate
FROM orders o
JOIN (
  SELECT o_orderpriority, MAX(o_orderdate) AS max_date
  FROM orders
  WHERE o_orderdate <= TIMESTAMP '1998-06-30 23:59:59'
  GROUP BY o_orderpriority
) m ON o.o_orderpriority = m.o_orderpriority AND o.o_orderdate = m.max_date
""",
)
def manifest_prune_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").alias("o")
    cutoff = F.lit("1998-06-30 23:59:59").cast("timestamp")
    latest = (
        orders.where(F.col("o_orderdate") <= cutoff)
        .groupBy(F.col("o_orderpriority").alias("prio"))
        .agg(F.max("o_orderdate").alias("max_date"))
    )
    return (
        orders.join(
            F.broadcast(latest),
            (F.col("o.o_orderpriority") == F.col("prio"))
            & (F.col("o.o_orderdate") == F.col("max_date")),
        )
        .select("o.o_orderpriority", "o.o_orderkey", "o.o_orderdate")
    )


@register(
    "date_format_partition_keys",
    category="datetime",
    doc="F3 partition-name formatting (MonYYYY folders, "
    "proc_0_ingest_to_GCP.dag.py:19) + ISO week parts.",
    oracle="""
SELECT DISTINCT
       strftime(o_orderdate, '%b%Y') AS month_partition,
       CAST(isoyear(o_orderdate) AS INTEGER) AS iso_year,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week
FROM orders
""",
)
def date_format_partition_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit English month literals, not date_format('MMMyyyy'):
    # date_format abbreviations follow the JVM default locale, while the
    # DuckDB oracle's strftime('%b') is always English — a non-English
    # driver JVM would break the differential.
    months = F.array(
        *[F.lit(m) for m in
          ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]]
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            F.concat(
                F.element_at(months, F.month("o_orderdate")),
                F.year("o_orderdate").cast("string"),
            ).alias("month_partition"),
            F.expr("extract(yearofweek FROM o_orderdate)").cast("int").alias("iso_year"),
            F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        )
        .distinct()
    )
