"""Stream-stream and stream-static joins (Structured Streaming surface).

The attribution join — purchases matched to the views that preceded them
within a bounded horizon — is THE canonical stream-stream join: an inner
join on a key plus an event-time range predicate. One definition serves both
modes (the batch-parity contract of streaming/windows.py): batch execution
is the oracle-checked registry query; streaming execution joins two
watermarked streams, where the time-range condition is what lets Spark
evict join state (without it, both sides buffer forever — the stream-join
OOM trap).

Scale: state per key is bounded by watermark + horizon; the join shuffles
both streams on user_id exactly as the batch plan does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table

ATTRIBUTION_HOURS = 6


def split_views_purchases(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    views = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return views, purchases


def attribution_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Purchases joined to every view by the same user in the preceding
    ATTRIBUTION_HOURS. Works identically on batch and watermarked streaming
    inputs — the time-range predicate doubles as the streaming state bound."""
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("purchase_ts") < F.col("view_ts") + F.expr(f"INTERVAL {ATTRIBUTION_HOURS} HOURS"))
    )
    return purchases.join(views, cond).select(
        F.col("p_user").alias("user_id"), "purchase_id", "view_id", "purchase_ts", "view_ts"
    )


@register(
    "stream_join_attribution",
    category="streaming",
    doc="Stream-stream interval join, batch-parity form: each purchase "
    "matched to same-user views in the preceding 6h. The identical "
    "transform runs as a real two-stream watermarked join in "
    "tests/test_streaming.py — the range predicate bounds join state.",
    oracle=f"""
SELECT p.user_id,
       p.event_id AS purchase_id,
       v.event_id AS view_id,
       p.ts AS purchase_ts,
       v.ts AS view_ts
FROM events p
JOIN events v
  ON p.event_type = 'purchase' AND v.event_type = 'view'
 AND p.user_id = v.user_id
 AND v.ts <= p.ts AND p.ts < v.ts + INTERVAL {ATTRIBUTION_HOURS} HOUR
""",
)
def stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # keep ts as TIMESTAMP_NTZ: the output carries raw timestamps, and an
    # NTZ->instant cast re-anchors the wall clock in the SESSION timezone
    # while collect() renders instants in the SYSTEM timezone — green only
    # while the two coincide (caught by the r10 hostile-session-TZ axis).
    # NTZ comparison + interval arithmetic are exactly the oracle's naive
    # TIMESTAMP semantics under every session TZ. The streaming twin casts
    # to instants at its own boundary (watermarks need instants).
    views, purchases = split_views_purchases(table(spark, sf_dir, "events"))
    return attribution_join(views, purchases)


def enrich_events_with_segment(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static enrichment: events left-joined to the customer dim on
    user_id. The same expression runs streaming in
    tests/test_streaming.py::test_stream_static_join_enriches_events, where
    the static side is re-read per micro-batch and broadcast when small."""
    dim = customer.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    return events.join(dim, "user_id", "left")


@register(
    "stream_static_enrich",
    category="streaming",
    doc="Stream-static dim join, batch-parity form: every event enriched "
    "with its user's market segment (left join — unmatched users keep NULL "
    "segment), then rolled up per segment × event type. Streaming execution "
    "of the identical join runs in tests/test_streaming.py; at scale the "
    "dim side broadcasts per micro-batch, so the stream never shuffles.",
    oracle="""
SELECT c_mktsegment, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
LEFT JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment, event_type
""",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wheels_in_motion_analytics_spark.compat import dsum

    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    cust = table(spark, sf_dir, "customer")
    return (
        enrich_events_with_segment(ev, cust)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


def attribution_left_outer(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """LEFT OUTER attribution: every purchase, with NULL view columns when
    no view preceded it in the horizon. On streams, Spark emits the
    unmatched rows only after the watermark passes the join horizon —
    the state-expiry contract this operator exists to demonstrate."""
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("purchase_ts")
            < F.col("view_ts") + F.expr(f"INTERVAL {ATTRIBUTION_HOURS} HOURS")
        )
    )
    return purchases.join(views, cond, "left_outer").select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        "purchase_ts",
    )


@register(
    "stream_attribution_unmatched",
    category="streaming",
    doc="Direct-conversion detection, batch-parity form of the LEFT OUTER "
    "stream-stream join: purchases with NO view by the same user in the "
    f"preceding {ATTRIBUTION_HOURS}h (the rows the streaming join emits "
    "only after watermark expiry — exercised as a real two-stream "
    "left-outer join in tests/test_streaming.py). Counts per user plus "
    "the overall direct-share.",
    oracle=f"""
WITH v AS (
  SELECT user_id AS v_user, ts AS view_ts FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id AS p_user, event_id AS purchase_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
),
j AS (
  SELECT p.p_user, p.purchase_id, v.view_ts
  FROM p LEFT JOIN v
    ON p.p_user = v.v_user
   AND v.view_ts <= p.purchase_ts
   AND p.purchase_ts < v.view_ts + INTERVAL {ATTRIBUTION_HOURS} HOUR
),
per_p AS (
  SELECT p_user, purchase_id, COUNT(view_ts) AS n_views
  FROM j GROUP BY 1, 2
)
SELECT p_user AS user_id,
       COUNT(*) AS purchases,
       COUNT(*) FILTER (WHERE n_views = 0) AS direct_purchases
FROM per_p
GROUP BY p_user
""",
)
def stream_attribution_unmatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NTZ end-to-end for the same session-TZ robustness reason as
    # stream_join_attribution (here only counts surface, but an instant
    # cast would still make the +6h horizon DST-sensitive under a
    # DST-observing session zone; NTZ matches the oracle's naive arithmetic)
    views, purchases = split_views_purchases(table(spark, sf_dir, "events"))
    j = attribution_left_outer(views, purchases)
    per_p = j.groupBy("user_id", "purchase_id").agg(
        F.count("view_id").alias("n_views")
    )
    return per_p.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("purchases"),
        F.count(F.when(F.col("n_views") == 0, 1)).alias("direct_purchases"),
    )
