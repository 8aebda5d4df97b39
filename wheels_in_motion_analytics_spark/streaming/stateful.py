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
