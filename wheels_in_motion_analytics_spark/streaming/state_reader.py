"""Batch inspection of Structured Streaming state — the Spark 4 state data
source (``spark.read.format("statestore")``).

A streaming aggregation's state store *is* the operational source of truth
for what the query has seen; at 100 TB the only sane way to audit, debug or
backfill from it is to read the store files directly as a batch DataFrame —
never to replay the input stream. The state source does exactly that: it
scans the per-partition state files under a query's checkpoint (RocksDB or
HDFS-backed alike), presenting ``key`` / ``value`` structs plus the
``partition_id``, with partition-parallel reads (one task per state-store
partition = the query's shuffle partitions).

The registry entry runs a REAL watermark-free ``groupBy(user_id).count()``
stream to completion under ``availableNow``, then reconstructs the per-user
counts FROM THE STATE FILES ALONE and oracle-checks them against the batch
``GROUP BY`` — proving the store round-trips the aggregation buffers
exactly. Counts are integers, so the result is invariant to micro-batch
boundaries and state flush order.

Reference parity: the reference pipeline has no streaming tier at all (its
closest analogue is re-running the whole Airflow DAG); this is part of the
§2b/§2d extension surface.
"""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.types as T

from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table


@register(
    "stream_state_store_read",
    category="streaming",
    doc="State-store BATCH reader: run a real streaming groupBy-count over "
    "the events table to completion (availableNow), then read the query's "
    "own state store with the Spark 4 'statestore' data source and "
    "reconstruct the per-user counts from the state files — the "
    "ops/debugging surface that audits 100 TB streaming state without "
    "replaying the stream. Reads are partition-parallel (one task per "
    "state-store partition). Oracle = the batch GROUP BY the state must "
    "equal.",
    oracle="""
SELECT user_id, COUNT(*) AS n_events
FROM events
GROUP BY user_id
""",
)
def stream_state_store_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    stage = tempfile.mkdtemp(prefix="stateread_src_")
    ckpt = tempfile.mkdtemp(prefix="stateread_ckpt_")
    # stage through tables.table() so the events timestamp variant never
    # leaks into the stream schema (NOTES.md decision #2)
    table(spark, sf_dir, "events").select("user_id").coalesce(2).write.mode(
        "overwrite"
    ).parquet(stage)
    stream = spark.readStream.schema("user_id BIGINT").parquet(stage)
    q = (
        stream.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("availableNow count stream did not finish in 300s")

    # the sibling 'state-metadata' source enumerates the stateful operators
    # behind a checkpoint — use it to locate the aggregation's operatorId
    # instead of assuming 0 (the discovery step a real state audit runs first)
    meta = spark.read.format("state-metadata").load(ckpt)
    op_id = meta.select("operatorId").head()[0]
    state = (
        spark.read.format("statestore")
        .option("operatorId", int(op_id))
        .load(ckpt)
    )
    # key = the grouping columns; value = the aggregation buffer. Resolve the
    # buffer's count field by type, not by its engine-internal name.
    value_fields = state.schema["value"].dataType
    count_field = next(
        f.name for f in value_fields.fields if isinstance(f.dataType, T.LongType)
    )
    result = state.select(
        F.col("key.user_id").alias("user_id"),
        F.col(f"value.`{count_field}`").alias("n_events"),
    )
    # materialize before reclaiming the checkpoint the scan reads from
    result = result.localCheckpoint(eager=True)
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return result
