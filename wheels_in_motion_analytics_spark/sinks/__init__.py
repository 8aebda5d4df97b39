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
