"""Parquet sinks (reference K1-K4).

K1 overwrite-idempotent dims (init-data-transformation.py:66-73,118-125),
K2 append fact/datetime (journey-data-transformation.py:196-210),
K3 warehouse load → saveAsTable/temp view, K4 partitioned landing
(proc_0_ingest_to_GCP.dag.py:19,93-100).

Scale notes: the reference sizes output files with repartition(4/10/8/16);
here AQE coalescing plus ``maxRecordsPerFile`` control file sizes without a
hard-coded shuffle — repartition-by-key is reserved for when downstream reads
benefit from layout (partitionBy / bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet_overwrite(
    df: DataFrame, path: str, num_files: int | None = None, max_records_per_file: int | None = None
) -> None:
    """K1: idempotent overwrite (dim tables)."""
    if num_files is not None:
        df = df.coalesce(num_files)
    writer = df.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def write_parquet_append(df: DataFrame, path: str, num_files: int | None = None) -> None:
    """K2: incremental append (fact tables). Reference wart preserved by
    policy doc only — prefer overwrite-by-partition for re-run idempotency
    (SURVEY.md §4.3)."""
    if num_files is not None:
        df = df.coalesce(num_files)
    df.write.mode("append").parquet(path)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite") -> None:
    """K4: hive-layout partitioned landing (monthly folders → partition
    pruning on read, the Spark-native version of the manifest's date
    selection)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def register_serving_view(spark: SparkSession, df: DataFrame, name: str) -> None:
    """K3: serving layer — the BigQuery-table analogue is a (temp) view /
    saved table over parquet (proc_2_GCS_to_BQ_dag.py:81-94)."""
    df.createOrReplaceTempView(name)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table: pre-shuffles once at write time so every
    future equi-join/aggregation on the bucket key is Exchange-free — the
    amortize-the-shuffle play for fact tables that are joined repeatedly
    at 100 TB. Requires a catalog table (saveAsTable), not a bare path."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(name)


import os

import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.compat import dsum, oracle_dsum
from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table


@register(
    "bucketed_join_exchange_free",
    category="sinks",
    doc="Bucketed-table join with the shuffle amortized into the write: "
    "orders and customer are saved as 8-bucket catalog tables bucketed + "
    "sorted on the customer key (the one-time landing cost), then joined "
    "with a MERGE hint — the sort-merge join consumes the bucket layout "
    "directly, no Exchange on either side (pinned in "
    "tests/test_plan_shapes.py). THE layout play for fact tables joined "
    "repeatedly at 100 TB. Oracle computes the same join+agg from the raw "
    "parquet.",
    oracle=f"""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice')} AS total_value
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def bucketed_join_exchange_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    sfx = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    t_orders, t_cust = f"orders_bkt_{sfx}", f"customer_bkt_{sfx}"
    # a FRESH session's catalog doesn't know tables a previous session
    # wrote, but their warehouse locations persist — drop both halves or
    # saveAsTable dies with LOCATION_ALREADY_EXISTS
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    for t in (t_orders, t_cust):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t.lower()), ignore_errors=True)
    write_bucketed_table(
        table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        t_orders,
        ["o_custkey"],
        num_buckets=8,
        sort_cols=["o_custkey"],
    )
    write_bucketed_table(
        table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        t_cust,
        ["c_custkey"],
        num_buckets=8,
        sort_cols=["c_custkey"],
    )
    return (
        spark.table(t_orders)
        .hint("merge")
        .join(spark.table(t_cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_value"),
        )
    )
