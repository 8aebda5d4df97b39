"""Structured Streaming surface (§2b — the reference has no streaming; this
is the gap-fill dictated by SURVEY.md §7.3).

Each windowing operator has ONE definition used by both execution modes:
the batch-parity form registered as an oracle-checkable query below, and a
``readStream`` wrapper (see :func:`stream_events`, tests/test_streaming.py)
that applies the identical transformation with a watermark. That equivalence
is Structured Streaming's design contract — the streaming query is the
incremental execution of the same logical plan.

Scale notes: windowed aggregations shuffle on (window, key); watermarks bound
state. Session windows use Spark's native session_window (state merges
adjacent sessions). The DuckDB session oracle is the classic gaps-and-islands
rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.compat import dsum, oracle_dsum
from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table

SESSION_GAP = "5 minutes"


def tumbling_agg(df: DataFrame, ts: str = "ts") -> DataFrame:
    """1-hour tumbling windows: count + value sum per (window, event_type)."""
    return (
        df.groupBy(F.window(ts, "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("num_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "num_events",
            "sum_value",
        )
    )


def sliding_agg(df: DataFrame, ts: str = "ts") -> DataFrame:
    """1-hour windows sliding every 30 minutes."""
    return (
        df.groupBy(F.window(ts, "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("num_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "num_events",
        )
    )


def session_agg(df: DataFrame, ts: str = "ts", gap: str = SESSION_GAP) -> DataFrame:
    """Session windows per user: gap-based session assignment."""
    return (
        df.groupBy(F.session_window(ts, gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("num_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "num_events",
        )
    )


def stream_events(
    spark: SparkSession,
    source_dir: str,
    transform,
    watermark: str = "10 minutes",
    ts: str = "ts",
):
    """File-source streaming wrapper: readStream(parquet) → watermark →
    the SAME batch transformation → streaming DataFrame ready for
    writeStream (used with an in-memory sink in tests)."""
    from wheels_in_motion_analytics_spark.tables import SCHEMAS

    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .parquet(source_dir)
        # watermarks require an instant (TIMESTAMP), not NTZ — anchor the
        # wall clock in the session zone at the stream boundary
        .withColumn(ts, F.col(ts).cast("timestamp"))
        .withWatermark(ts, watermark)
    )
    return transform(stream)


@register(
    "stream_tumbling_window",
    category="streaming",
    doc="Tumbling 1h window agg (batch-parity form of the streaming query; "
    "oracle via time_bucket).",
    oracle=f"""
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS num_events,
       {oracle_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(table(spark, sf_dir, "events"))


@register(
    "stream_sliding_window",
    category="streaming",
    doc="Sliding 1h/30m window agg — each event lands in 2 windows "
    "(oracle: union of the two shifted bucketings).",
    oracle="""
WITH assigned AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS slot_start, ts FROM events
),
expanded AS (
  SELECT slot_start AS window_start FROM assigned
  UNION ALL
  SELECT slot_start - INTERVAL 30 MINUTE FROM assigned
)
SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
       COUNT(*) AS num_events
FROM expanded
GROUP BY 1, 2
""",
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(table(spark, sf_dir, "events"))


@register(
    "stream_session_window",
    category="streaming",
    doc=f"Session windows per user (gap {SESSION_GAP}) — oracle is the "
    "gaps-and-islands rewrite: new session when ts - lag(ts) > gap; "
    "session_end = last ts + gap (Spark session_window semantics).",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 5 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
islands AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 5 MINUTE AS session_end,
       COUNT(*) AS num_events
FROM islands
GROUP BY user_id, session_no
""",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_agg(table(spark, sf_dir, "events"))


@register(
    "stream_dedup_events",
    category="streaming",
    doc="Streaming dedup parity: distinct event ids per (user, type) — the "
    "batch form of dropDuplicatesWithinWatermark.",
    oracle="""
SELECT DISTINCT user_id, event_type, event_id FROM events
""",
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select("user_id", "event_type", "event_id").distinct()


@register(
    "stream_dedup_within_watermark",
    category="streaming",
    doc="dropDuplicatesWithinWatermark run FOR REAL: a duplicated events "
    "slice (the full slice staged twice, plus an intra-file duplicate "
    "half) streams as multiple file micro-batches under trigger "
    "availableNow; duplicates arriving in LATER micro-batches are dropped "
    "because their keys are still inside the watermark-retained state — "
    "the operator's raison d'être vs plain dropDuplicates, whose state "
    "never expires. The 60-day watermark exceeds the corpus span, so "
    "every duplicate is in-state and the emitted append stream equals the "
    "batch DISTINCT — fully oracle-checked. State at 100 TB is bounded by "
    "keys-per-watermark-window, not corpus size.",
    oracle="""
SELECT DISTINCT user_id, event_type, ts,
       CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
FROM events
WHERE user_id % 10 = 0
""",
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import uuid

    base = (
        table(spark, sf_dir, "events")
        .where(F.col("user_id") % 10 == 0)
        .select(
            "user_id",
            "event_type",
            F.col("ts").cast("timestamp").alias("ts"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        )
    )
    stage = tempfile.mkdtemp(prefix="dedup_wm_src_")
    # file 1: the slice + an intra-batch duplicate half; file 2: the whole
    # slice again — with maxFilesPerTrigger=1 the second copy arrives as a
    # separate micro-batch and must be dropped from watermark state
    base.unionAll(base.where(F.col("user_id") % 20 == 0)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(stage, "f1"))
    base.coalesce(1).write.mode("overwrite").parquet(os.path.join(stage, "f2"))

    ckpt = tempfile.mkdtemp(prefix="dedup_wm_ckpt_")
    name = f"dedup_wm_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.schema("user_id BIGINT, event_type STRING, ts TIMESTAMP, cents BIGINT")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(stage, "*"))
        .withWatermark("ts", "60 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "ts", "cents"])
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("availableNow dedup-within-watermark stream did not finish in 300s")
    final = spark.sql(
        f"SELECT user_id, event_type, CAST(ts AS TIMESTAMP_NTZ) AS ts, cents FROM {name}"
    ).localCheckpoint()
    for d in (stage, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    return final


def ohlc_agg(df: DataFrame, ts: str = "ts") -> DataFrame:
    """5-minute OHLC bars per event type — open/close via min_by/max_by on
    an anchored wall-clock microsecond key (mergeable aggregates, so the
    incremental streaming execution produces the same bars as batch)."""
    skey = (
        F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP '2024-01-01 00:00:00', {ts})"
        )
        * F.lit(100000)
        + F.col("event_id")
    )
    return (
        df.groupBy(F.window(ts, "5 minutes").alias("w"), "event_type")
        .agg(
            F.min_by("value", skey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", skey).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("volume"),
        )
        .select(
            F.col("w.start").alias("bar_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "volume",
        )
    )


@register(
    "stream_ohlc_bars",
    category="streaming",
    doc="Streaming OHLC downsampling (batch-parity form): 5-minute bars per "
    "event type with open/close as min_by/max_by over an anchored "
    "wall-clock key — all aggregates mergeable, so watermarked incremental "
    "execution finalizes identical bars (readStream parity in "
    "tests/test_streaming.py).",
    oracle=f"""
SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS bar_start,
       event_type,
       arg_min(value, date_diff('microsecond', TIMESTAMP '2024-01-01 00:00:00', ts)
                      * 100000 + event_id) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, date_diff('microsecond', TIMESTAMP '2024-01-01 00:00:00', ts)
                      * 100000 + event_id) AS close,
       COUNT(*) AS n_events,
       {oracle_dsum('value')} AS volume
FROM events
GROUP BY 1, 2
""",
)
def stream_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ohlc_agg(table(spark, sf_dir, "events"))


def bars_then_hourly(df: DataFrame, ts: str = "ts") -> DataFrame:
    """Two-level windowed rollup: 5-minute count/volume bars, then an
    hourly aggregate OVER THE BARS (window-of-window — chained stateful
    operators in streaming mode, Spark 3.4+). The partial bars make the
    hourly state O(bars), not O(events)."""
    bars = (
        df.groupBy(F.window(ts, "5 minutes").alias("w5"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("vol_dec"),
        )
    )
    return (
        bars.groupBy(F.window(F.col("w5"), "1 hour").alias("w"), "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("vol_dec").cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_hourly_rollup_of_bars",
    category="streaming",
    doc="Chained windowed aggregation (batch-parity form): 5-minute bars "
    "rolled up into hourly totals by windowing OVER the bar window column "
    "— the two-level stateful topology whose hourly state is O(bars). "
    "Oracle: rolling up exact decimal partials equals aggregating the "
    "events directly.",
    oracle=f"""
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS hour_start,
       event_type,
       COUNT(*) AS n_events,
       {oracle_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def stream_hourly_rollup_of_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bars_then_hourly(table(spark, sf_dir, "events"))


@register(
    "stream_complete_mode_totals",
    category="streaming",
    doc="COMPLETE-mode streaming aggregation, run for real: events stage "
    "as a file stream, an unwindowed groupBy(event_type) aggregate runs "
    "under trigger availableNow into a memory sink with outputMode "
    "complete — every trigger REPLACES the result table, so after the "
    "final trigger the sink holds exactly the batch aggregate (the mode's "
    "defining semantics, and why no watermark is needed). State is exact "
    "int64 cents; fully oracle-checked against the batch GROUP BY.",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY event_type
""",
)
def stream_complete_mode_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    stage = tempfile.mkdtemp(prefix="complete_mode_src_")
    table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    ).coalesce(2).write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema("event_type STRING, cents BIGINT").parquet(stage)
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("sum_cents"),
    )
    name = f"complete_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("availableNow complete-mode stream did not finish in 300s")
    import shutil

    shutil.rmtree(stage, ignore_errors=True)  # memory sink already holds the result
    return spark.sql(f"SELECT event_type, n_events, sum_cents FROM {name}")
