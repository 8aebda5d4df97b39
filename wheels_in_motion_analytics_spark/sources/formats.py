"""Columnar-format interop beyond parquet: ORC source/sink round-trip.

The reference's lake is parquet/BigQuery-only; a Spark-native engine also
speaks ORC out of the box (same predicate-pushdown + column-pruning scan
machinery, vectorized reader, zstd). The registered query proves the full
path — write the table AS ORC, read it back, aggregate — and the DuckDB
oracle runs the identical aggregate on the original parquet, so any value
drift introduced by the format hop (type mapping, compression, statistics)
would hash-fail.

Layout mirrors sources/partitioned.py: a content-deterministic derived copy
under ``.derived/<sf>/``, built lazily once (``_SUCCESS``-guarded) and
reused by every later run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.compat import dsum, oracle_dsum
from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def orc_orders_path(sf_dir: str) -> str:
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_REPO_ROOT, ".derived", sf_name, "orders_orc")


def ensure_orc_orders(spark: SparkSession, sf_dir: str) -> str:
    """Write orders as zstd ORC once per sf (idempotent via _SUCCESS)."""
    path = orc_orders_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        table(spark, sf_dir, "orders").write.mode("overwrite").option(
            "compression", "zstd"
        ).orc(path)
    return path


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


@register(
    "orc_roundtrip_agg",
    category="sources",
    doc="ORC source/sink round-trip: orders written as zstd ORC (once, "
    "derived layout), read back through the vectorized ORC scan, and "
    "aggregated per status/priority. The oracle aggregates the original "
    "parquet — the format hop must be value-transparent. Filter pushdown "
    "into the ORC scan is asserted in tests/test_plan_shapes.py.",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice')} AS total_value
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY o_orderstatus, o_orderpriority
""",
)
def orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = ensure_orc_orders(spark, sf_dir)
    return (
        read_orc(spark, path)
        .where(F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_value"),
        )
    )
