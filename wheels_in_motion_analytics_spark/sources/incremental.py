"""Incremental file-tracked ingestion — the batch rendition of the
reference's manifest-driven "only fetch what's new" loop
(proc_0_ingest_to_GCP.dag.py:31-51), made idempotent.

The reference appends blindly (re-runs duplicate rows, SURVEY.md §4.3); here
each batch records which source files it consumed (`input_file_name`), and
re-runs skip them — exactly-once per file without a streaming checkpoint.
(The streaming equivalent IS the file-source checkpoint; this is the batch
counterpart for schedulers.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
import pyspark.sql.types as T

LEDGER_SCHEMA = T.StructType([T.StructField("file", T.StringType())])


def ingest_new_files(
    spark: SparkSession,
    source_glob: str,
    ledger_path: str,
    read=None,
) -> DataFrame:
    """Rows from source files NOT yet recorded in the ledger.

    ``read`` defaults to a parquet reader; pass a callable for CSV/JSON.
    Call :func:`commit_ledger` after successfully sinking the batch.
    """
    from wheels_in_motion_analytics_spark.sources.readers import read_parquet_or_empty

    df = (read or (lambda s, p: s.read.parquet(p)))(spark, source_glob)
    df = df.withColumn("__file", F.input_file_name())
    seen = read_parquet_or_empty(spark, ledger_path, LEDGER_SCHEMA)
    return df.join(
        seen.withColumnRenamed("file", "__file"), on="__file", how="left_anti"
    )


def commit_ledger(batch: DataFrame, ledger_path: str) -> None:
    """Record the consumed files of ``batch`` (must still carry __file)."""
    files = batch.select(F.col("__file").alias("file")).distinct().localCheckpoint()
    files.write.mode("append").parquet(ledger_path)
