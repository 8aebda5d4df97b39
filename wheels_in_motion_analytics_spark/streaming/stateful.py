"""Custom stateful streaming operator via applyInPandasWithState.

The §2b gap-fill for "custom stateful operators": a per-user running
aggregate (event count + value sum) maintained in GroupState across
micro-batches, with a processing-time timeout to expire idle users.

Scale notes: state lives in the state store partitioned by the grouping key —
the same shuffle boundary as a streaming groupBy; state size is O(|users|),
bounded by the timeout-based eviction.

Spark 4's successor API, ``transformWithStateInPandas`` (typed ValueState/
ListState/MapState + timers), was probed in this environment and is
unusable: its driver worker imports ``google.protobuf``
(pyspark/sql/streaming/proto/StateMessage_pb2), which is not installed in
the container, so every query fails with
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE. applyInPandasWithState is
the dependency-free stateful surface and remains the implementation here.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from wheels_in_motion_analytics_spark.registry import register

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _update_user_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    state.setTimeoutDuration(60_000)
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "sum_value": [s]})


def stateful_user_counts(stream: DataFrame) -> DataFrame:
    """Running per-user (count, sum) over a stream — emits the updated state
    for each user touched in a micro-batch."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Oracle-checked registry entry: a REAL stateful stream, run to completion
# ---------------------------------------------------------------------------

EXACT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
    ]
)

EXACT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
    ]
)


def _update_user_state_exact(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Integer-cents accumulation: floor(v*100+0.5) per row (identical IEEE
    ops to the Spark/DuckDB quantizers), then exact int64 sums — the state
    is bit-stable under any micro-batch split or row order."""
    (user_id,) = key
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        import numpy as np

        cents += int(np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_cents": [cents]}
    )


def stateful_user_totals_exact(stream: DataFrame) -> DataFrame:
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state_exact,
        outputStructType=EXACT_OUTPUT_SCHEMA,
        stateStructType=EXACT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "stream_stateful_running_totals",
    category="streaming",
    doc="CUSTOM STATEFUL STREAMING, oracle-checked end-to-end: the events "
    "table is staged as a file-stream source, a real applyInPandasWithState "
    "query (per-user GroupState holding count + integer-cents sum) runs to "
    "completion under trigger availableNow, and the final per-user state is "
    "returned. State accumulates in exact int64 cents, so the result is "
    "identical under any micro-batch boundary — which is what lets a "
    "STREAMING operator be value-hash-compared against a batch SQL oracle.",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
         AS sum_value
FROM events
GROUP BY user_id
""",
)
def stream_stateful_running_totals(spark, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    import pyspark.sql.functions as F

    from wheels_in_motion_analytics_spark.tables import table

    stage = tempfile.mkdtemp(prefix="stateful_src_")
    # stage through tables.table() so the physical timestamp variant of the
    # source parquet (nanos vs µs — NOTES.md decision #2) never leaks into
    # the stream schema
    table(spark, sf_dir, "events").select("user_id", "value").coalesce(
        2
    ).write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema("user_id BIGINT, value DOUBLE")
        .parquet(stage)
        .select("user_id", "value")
    )
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        stateful_user_totals_exact(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("availableNow stateful stream did not finish in 300s")
    import shutil

    shutil.rmtree(stage, ignore_errors=True)  # memory sink already holds the result
    emitted = spark.sql(f"SELECT * FROM {name}")
    # final state per user = the row with the largest n_events (emissions
    # are monotone in both fields)
    return (
        emitted.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            (F.max("sum_cents").cast("double") / 100).alias("sum_value"),
        )
    )
