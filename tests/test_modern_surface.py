"""Targeted pins for the round-4 modern-surface additions: SQL pipe syntax,
single-pass Observation metrics as a registry query, and the state-store
batch reader."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from wheels_in_motion_analytics_spark.functions.integrity import (
    observe_dq_single_pass,
)
from wheels_in_motion_analytics_spark.functions.sql_surface import (
    sql_pipe_syntax_report,
)
from wheels_in_motion_analytics_spark.streaming.state_reader import (
    stream_state_store_read,
)
from wheels_in_motion_analytics_spark.tables import table


def test_pipe_syntax_compiles_to_same_plan_as_ansi(spark):
    """Pipe operators are parser surface only — the optimized plan must be
    the one the ANSI rendering produces (pushed filter, hash agg, post-agg
    filter), so pushdown/codegen are unaffected by the dialect choice."""
    piped = sql_pipe_syntax_report(spark, SF_SMALL)
    table(spark, SF_SMALL, "lineitem").createOrReplaceTempView("pipe_lineitem")
    ansi = spark.sql("""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(net_cents) AS DOUBLE) / 100.0 AS net_revenue
FROM (
  SELECT *, CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
       AS net_cents
  FROM pipe_lineitem
  WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'
)
GROUP BY l_returnflag, l_linestatus
HAVING COUNT(*) > 100
""")
    assert piped.schema == ansi.schema
    # physical plans match modulo plan ids
    import re

    def canon_plan(df):
        p = df._jdf.queryExecution().executedPlan().toString()
        p = re.sub(r"#\d+L?", "#x", p)
        return re.sub(r"plan_id=\d+", "plan_id=x", p)

    assert canon_plan(piped) == canon_plan(ansi)
    # and the pushed filter reached the scan
    explained = piped._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in explained


def test_observe_metrics_equal_relational_audit(spark):
    got = {r[0]: r for r in [tuple(observe_dq_single_pass(spark, SF_SMALL).collect()[0])]}
    row = next(iter(got.values()))
    orders = table(spark, SF_SMALL, "orders")
    expect = orders.agg(
        F.count(F.lit(1)),
        F.sum(F.col("o_totalprice").isNull().cast("bigint")),
        F.min("o_orderkey"),
        F.max("o_orderkey"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")),
    ).collect()[0]
    assert row == tuple(expect)


def test_state_store_read_equals_batch_groupby(spark):
    state_counts = {
        r["user_id"]: r["n_events"]
        for r in stream_state_store_read(spark, SF_SMALL).collect()
    }
    batch = {
        r["user_id"]: r["n"]
        for r in table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert state_counts == batch
    assert len(state_counts) > 0
