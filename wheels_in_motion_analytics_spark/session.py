"""SparkSession factory.

Reproduces the reference's session semantics (explicit shuffle parallelism and
resource pinning, see /root/reference/airflow/dags/proc_1_spark_dataproc_dag.py:54-65)
but with the idiomatic-Spark replacements: AQE on (runtime coalescing + skew
join handling instead of a fixed 64 shuffle partitions), Arrow for any
Python<->JVM transfer, and a stable UTC session timezone so results are
deterministic and oracle-comparable.

Scale posture: these configs are the local-mode rendition; on a real cluster
the same builder is used with master/resources supplied externally. AQE +
adaptive coalescing is what makes the same plans survive a 1000-executor,
100 TB deployment without retuning fixed partition counts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "wheels-in-motion-analytics-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults are sized for local[$SPARK_GRAFT_CPUS]; on a cluster pass
    ``master=None`` and let spark-submit own resources.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Adaptive execution: runtime partition coalescing, skew-join
        # splitting, and dynamic join-strategy switches. This is the
        # scale-out replacement for the reference's fixed
        # spark.sql.shuffle.partitions=64.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow-batched transfer for pandas UDFs / toPandas — the only
        # acceptable Python data path in the hot loop.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp semantics for the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Broadcast threshold: dims in this engine are small; let Catalyst
        # broadcast them instead of shuffling the fact table.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Local-rig scan parallelism: the testdata tables are single ~10MB
        # parquet files, so the 128MB default yields one-task scans; 4MB
        # splits keep all cores busy. On a real lake (many 100MB+ files)
        # raise this back via SPARK_GRAFT_MAX_PARTITION_BYTES — smaller
        # splits there would only inflate scheduling overhead.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024)),
        )
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
