"""Single-pass data-quality metrics via the Observation API: audit counters
ride along the real job instead of paying a second 100 TB scan (the
df.observe rendition of accumulator-based DQ counters)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Observation

from tests.conftest import SF_SMALL
from wheels_in_motion_analytics_spark.tables import table


def test_observe_collects_metrics_in_single_pass(spark):
    obs = Observation("orders_dq")
    df = table(spark, SF_SMALL, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").isNull().cast("int")).alias("null_prices"),
        F.max("o_orderkey").alias("max_key"),
    )
    # one action — the metrics are a byproduct, not a second scan
    df.write.mode("overwrite").format("noop").save()
    m = obs.get
    assert m["n_rows"] == df.count()
    assert m["null_prices"] == 0
    assert m["max_key"] >= 1


def test_observe_on_filtered_write_counts_only_written_rows(spark):
    obs = Observation("written")
    base = table(spark, SF_SMALL, "orders")
    kept = base.where(F.col("o_orderstatus") == "F").observe(
        obs, F.count(F.lit(1)).alias("n_rows")
    )
    kept.write.mode("overwrite").format("noop").save()
    assert obs.get["n_rows"] == base.where(F.col("o_orderstatus") == "F").count()
