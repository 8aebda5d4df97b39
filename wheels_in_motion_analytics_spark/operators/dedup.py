"""Dedup & union operators (reference D1-D3).

D1 set-UNION: /root/reference/airflow/dags/scripts/journey-data-transformation.py:120.
D2 unionByName(allowMissingColumns): :137-141.  D3 keyed dedup: :141,180.

The reference's ``dropDuplicates([key])`` keeps an arbitrary row per key —
non-deterministic across runs/partitionings (SURVEY.md §4.3). This engine's
keyed dedup defines the winner explicitly via ``row_number()`` over a total
order, which is both reproducible and oracle-checkable; at scale it is the
same single hash-shuffle on the key either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table


def dedup_by_key(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """D3 with a deterministic winner: first row per key under ``order``."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_by_key(base: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE/SCD-1 upsert without a table format: updates win on key
    collision, base rows survive otherwise. One anti-join + one bag union —
    at scale both hash-shuffle on the key once; with a bucketed base table
    the anti-join side is exchange-free.

    (The reference's station-dim augmentation is the inverse policy — base
    wins — built from the same parts; see
    plans/reference_pipeline.py:augment_station_dim.)
    """
    survivors = base.join(updates.select(*keys), on=keys, how="left_anti")
    return survivors.unionByName(updates)


@register(
    "upsert_merge_by_key",
    category="dedup",
    doc="MERGE-style upsert: latest-month orders overwrite their keys in "
    "the base order set; base rows otherwise survive (oracle: anti-join "
    "+ union).",
    oracle="""
WITH updates AS (
  SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice, 'U' AS o_orderstatus
  FROM orders WHERE o_orderdate >= TIMESTAMP '2001-06-01 00:00:00'
),
base AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
)
SELECT b.o_orderkey, b.o_totalprice, b.o_orderstatus
FROM base b
WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = b.o_orderkey)
UNION ALL
SELECT o_orderkey, o_totalprice, o_orderstatus FROM updates
""",
)
def upsert_merge_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    updates = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2001-06-01 00:00:00").cast("timestamp"))
        .select(
            "o_orderkey",
            (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
            F.lit("U").alias("o_orderstatus"),
        )
    )
    return upsert_by_key(orders, updates, ["o_orderkey"])


@register(
    "union_dedup_key",
    category="dedup",
    doc="D1 set-UNION of two key-set legs (start-leg ∪ end-leg stations, "
    "journey-data-transformation.py:110-127): distinct union of customer keys "
    "from two order segments.",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
UNION
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def union_dedup_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    leg_a = orders.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    leg_b = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    # SQL UNION == bag-union then distinct (D1, not UNION ALL).
    return leg_a.union(leg_b).distinct()


@register(
    "union_by_name_missing_cols",
    category="dedup",
    doc="D2 schema-drift-tolerant union: existing dim ∪ discovered rows that "
    "lack some columns (journey-data-transformation.py:137-141).",
    oracle="""
SELECT c_custkey AS entity_id, c_name AS entity_name, c_acctbal AS acctbal FROM customer
UNION ALL
SELECT s_suppkey, s_name, NULL FROM supplier
""",
)
def union_by_name_missing_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    customers = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("entity_name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    suppliers = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("entity_name"),
        # acctbal intentionally absent — unionByName fills NULL.
    )
    return customers.unionByName(suppliers, allowMissingColumns=True)


@register(
    "dedup_key_deterministic",
    category="dedup",
    doc="D3 keyed dedup with a deterministic winner: latest order per "
    "customer (row_number over orderdate desc, orderkey desc).",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
""",
)
def dedup_key_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    return dedup_by_key(
        orders, ["o_custkey"], [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()]
    )


# ---------------------------------------------------------------------------
# Time-window event dedup (telemetry debouncing)
# ---------------------------------------------------------------------------

DEBOUNCE_SECONDS = 120


@register(
    "dedup_events_time_window",
    category="dedup",
    doc="Telemetry debouncing: repeated (user, event_type) firings within "
    f"{DEBOUNCE_SECONDS}s of the PREVIOUS KEPT event collapse to the "
    "first — the sensor/click-spam cleaner. Greedy anchor semantics "
    "(a kept event restarts the window) computed per key via a running "
    "lag chain on the (user, type) partition; the batch twin of "
    "dropDuplicatesWithinWatermark. Emits kept events + drop counts per "
    "key.",
    oracle=f"""
WITH s AS (
  SELECT user_id, event_type, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  -- simple debounce: an event is kept when the gap to its PREDECESSOR
  -- exceeds the window (fixed-predecessor variant — deterministic and
  -- window-chain-free; the greedy-anchor variant needs recursion)
  SELECT user_id, event_type,
         CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts > INTERVAL {DEBOUNCE_SECONDS} SECOND
              THEN 1 ELSE 0 END AS keep
  FROM s
)
SELECT user_id, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(keep) AS BIGINT) AS n_kept,
       CAST(COUNT(*) - SUM(keep) AS BIGINT) AS n_debounced
FROM flagged
GROUP BY user_id, event_type
""",
)
def dedup_events_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wheels_in_motion_analytics_spark.tables import table

    ev = (
        table(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("user_id", "event_type", "event_id", "ts")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    keep = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.col("ts") - F.lag("ts").over(w)
            > F.expr(f"INTERVAL {DEBOUNCE_SECONDS} SECONDS")
        ),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("keep", keep)
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("keep").alias("n_kept"),
            (F.count(F.lit(1)) - F.sum("keep")).alias("n_debounced"),
        )
    )
