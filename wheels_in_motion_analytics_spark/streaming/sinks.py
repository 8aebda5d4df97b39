"""Streaming sinks & auxiliary sources (§7.3): foreachBatch for arbitrary
sinks, rate source for synthetic load.

foreachBatch is the production sink shape: each micro-batch arrives as a
normal DataFrame, so the batch operator library (including idempotent
parquet overwrite-by-partition) is reusable verbatim — one code path for
batch and streaming, the core Structured Streaming design win.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic load source: (timestamp, value) at a fixed rate."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def foreach_batch_parquet_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    batch_hook: Callable[[DataFrame, int], None] | None = None,
):
    """writeStream.foreachBatch → append parquet per micro-batch, with an
    optional hook (metrics, dedup, warehouse upsert) over the batch
    DataFrame. Returns the started StreamingQuery."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_hook is not None:
            batch_hook(batch_df, batch_id)
        batch_df.write.mode("append").parquet(path)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
