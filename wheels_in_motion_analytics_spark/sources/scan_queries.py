"""Oracle-checked registry wrappers for the §2a scan/sink operators that
were previously exercised only by tests (SURVEY.md §2a S2-S6, S8, K1/K2,
P2/P3, T1; round-3 verdict item 7).

Each query drives the REAL operator implementation (sources/readers.py,
sinks/__init__.py, operators/projection.py) over a derived copy of the
driver's parquet tables, and its DuckDB oracle aggregates the ORIGINAL
parquet — so the scan/sink hop itself is what gets differentially verified.

Derived inputs follow the sources/formats.py layout: content-deterministic
copies under ``.derived/<sf>/``, built once (``_SUCCESS``-guarded), reused
across runs. Bounded driver-side staging (the 25-row dim JSON payload, the
64-doc binary fixture) is fixture construction, not a data path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
import pyspark.sql.types as T

from wheels_in_motion_analytics_spark.compat import dsum, oracle_dsum
from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table
from wheels_in_motion_analytics_spark.sources.formats import _derived_path
from wheels_in_motion_analytics_spark.sources.readers import (
    normalize_json_payload,
    read_binary_files,
    read_csv,
    read_parquet_or_empty,
)
from wheels_in_motion_analytics_spark.sinks import (
    write_parquet_append,
    write_parquet_overwrite,
)


# ---------------------------------------------------------------------------
# S1/S2/S3: glob CSV scan over a year-partitioned directory tree
# ---------------------------------------------------------------------------

_CSV_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)


def ensure_orders_csv_tree(spark: SparkSession, sf_dir: str) -> str:
    """Orders written once as a year-partitioned CSV tree
    (``orders_csv/o_year=1997/part-*.csv``) — the journey-data directory
    shape (journey-data-transformation.py:52-57)."""
    path = _derived_path(sf_dir, "orders_csv")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            table(spark, sf_dir, "orders")
            .select(
                "o_orderkey",
                "o_orderstatus",
                "o_totalprice",
                F.year("o_orderdate").alias("o_year"),
            )
            .repartition("o_year")
            .write.mode("overwrite")
            .option("header", "true")
            .partitionBy("o_year")
            .csv(path)
        )
    return path


@register(
    "glob_csv_scan_years",
    category="scan",
    doc="S2/S3 glob CSV scan (sources/readers.py:read_csv): orders staged "
    "once as a year-partitioned CSV tree, scanned back via the glob "
    "pattern '*/*.csv' with a DECLARED schema (no inference pre-pass — "
    "at 100 TB inference is a full extra scan), aggregated per status. "
    "The oracle aggregates the original parquet, so any value drift from "
    "the CSV hop (type mapping, double formatting) hash-fails. Reference: "
    "journey-data-transformation.py:52-57 glob ingest.",
    oracle=f"""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice')} AS total_value
FROM orders
GROUP BY o_orderstatus
""",
)
def glob_csv_scan_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = ensure_orders_csv_tree(spark, sf_dir)
    df = read_csv(spark, os.path.join(root, "*", "*.csv"), schema=_CSV_SCHEMA)
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# S4/S8: dict-root JSON payload normalization
# ---------------------------------------------------------------------------


def ensure_dict_root_json(spark: SparkSession, sf_dir: str) -> str:
    """A dict-root JSON payload whose record array sits under 'days' — the
    weather-payload shape the reference normalizes driver-side
    (init_0_ingestion_to_GCS_dag.py:49-94). Built from the 25-row nation
    dim (bounded), so the oracle can reproduce it relationally."""
    import json

    path = _derived_path(sf_dir, "nation_payload")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(path, exist_ok=True)
        rows = sorted(
            (r.n_nationkey, r.n_name, r.n_regionkey)
            for r in table(spark, sf_dir, "nation").collect()
        )
        payload = {
            "queryCost": len(rows),  # scalar noise fields the normalizer skips
            "days": [
                {"n_nationkey": k, "n_name": n, "n_regionkey": rk}
                for k, n, rk in rows
            ],
        }
        with open(os.path.join(path, "payload.json"), "w") as fh:
            json.dump(payload, fh)
        open(marker, "w").close()
    return os.path.join(path, "payload.json")


@register(
    "json_scan_normalize_payload",
    category="scan",
    doc="S4/S8 semi-structured normalization (sources/readers.py:"
    "normalize_json_payload): a dict-root JSON payload (record array under "
    "'days', scalar noise fields beside it) is read multiLine, the record "
    "array exploded and flattened INSIDE the distributed plan — the "
    "Spark-first replacement for the reference's driver-side dict "
    "normalization (init_0_ingestion_to_GCS_dag.py:49-94) — then joined "
    "to region and counted. Oracle reproduces it from the nation dim.",
    oracle="""
SELECT r_name, COUNT(*) AS n_nations, MIN(n_name) AS first_nation
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def json_scan_normalize_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    payload = ensure_dict_root_json(spark, sf_dir)
    days = normalize_json_payload(spark, payload).select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
    )
    region = table(spark, sf_dir, "region")
    return (
        days.join(F.broadcast(region), days.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_nation"),
        )
    )


# ---------------------------------------------------------------------------
# S5: parquet scan with declared-schema empty fallback
# ---------------------------------------------------------------------------


@register(
    "parquet_empty_fallback_union",
    category="scan",
    doc="S5 first-run fallback (sources/readers.py:read_parquet_or_empty): "
    "the 'dim may not exist yet' pattern (journey-data-transformation.py:"
    "98-105) — a read of a path that does NOT exist yields a typed empty "
    "relation (declared schema, not a crash), unionByName'd with the real "
    "customer scan; per-segment counts prove the union contributed zero "
    "phantom rows.",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
GROUP BY c_mktsegment
""",
)
def parquet_empty_fallback_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    missing = read_parquet_or_empty(
        spark, os.path.join(sf_dir, "customer_prior_run.parquet"), cust.schema
    )
    return (
        cust.unionByName(missing)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# S6: binary-file source over a staged document fixture
# ---------------------------------------------------------------------------

_BIN_DOCS = 64


def ensure_doc_binary_files(spark: SparkSession, sf_dir: str) -> str:
    """First _BIN_DOCS documents staged as individual .txt files (bounded
    fixture construction), plus one decoy .dat the glob must skip."""
    path = _derived_path(sf_dir, "doc_binaries")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(path, exist_ok=True)
        rows = (
            table(spark, sf_dir, "documents")
            .where(F.col("doc_id") < _BIN_DOCS)
            .select("doc_id", "text")
            .collect()
        )
        for r in rows:
            with open(os.path.join(path, f"doc-{r.doc_id:05d}.txt"), "wb") as fh:
                fh.write(r.text.encode("utf-8"))
        with open(os.path.join(path, "ignore-me.dat"), "wb") as fh:
            fh.write(b"\x00" * 16)
        open(marker, "w").close()
    return path


@register(
    "binary_glob_file_stats",
    category="scan",
    doc="S6 binary-file source (sources/readers.py:read_binary_files): the "
    "first 64 documents staged once as real .txt files, scanned through "
    "format('binaryFile') with pathGlobFilter='*.txt' (a decoy .dat file "
    "proves the glob filters), byte lengths aggregated. The distributed "
    "replacement for the reference's driver-side wget staging "
    "(init_0_ingestion_to_GCS_dag.py:132-134). Oracle recomputes byte "
    "lengths from documents.text.",
    oracle=f"""
SELECT COUNT(*) AS n_files,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents
WHERE doc_id < {_BIN_DOCS}
""",
)
def binary_glob_file_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = ensure_doc_binary_files(spark, sf_dir)
    return read_binary_files(spark, path, glob="*.txt").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.max(F.length("content")).alias("max_bytes"),
    )


# ---------------------------------------------------------------------------
# K1/K2: overwrite + append parquet sinks, read-back verified
# ---------------------------------------------------------------------------


@register(
    "parquet_sink_overwrite_append",
    category="sinks",
    doc="K1 overwrite + K2 append run for real (sinks/__init__.py:"
    "write_parquet_overwrite/_append): pre-1996 orders land via mode="
    "overwrite, 1996+ via mode=append into the same path, and the "
    "read-back per-status aggregate must equal the one-shot aggregate of "
    "the source — the sink hop is what's differentially verified. "
    "Reference: init-data-transformation.py:66-73 (overwrite), "
    "journey-data-transformation.py:196-210 (append). localCheckpoint "
    "before cleanup (NOTES.md #6).",
    oracle=f"""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice')} AS total_value
FROM orders
GROUP BY o_orderstatus
""",
)
def parquet_sink_overwrite_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    out = os.path.join(tempfile.mkdtemp(prefix="sink_k1k2_"), "orders")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    cut = F.lit("1996-01-01 00:00:00").cast("timestamp")
    write_parquet_overwrite(orders.where(F.col("o_orderdate") < cut), out)
    write_parquet_append(orders.where(F.col("o_orderdate") >= cut), out)
    result = (
        spark.read.parquet(out)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_value"),
        )
        .localCheckpoint()
    )
    shutil.rmtree(os.path.dirname(out), ignore_errors=True)
    return result


# ---------------------------------------------------------------------------
# P2/P3: conditional rename + guarded drop
# ---------------------------------------------------------------------------


@register(
    "conditional_rename_guarded_drop",
    category="projection",
    doc="P2 conditional rename + P3 guarded drop (operators/projection.py:"
    "rename_columns/drop_if_exists): a rename map containing BOTH a "
    "present source (c_name) and header-variant sources that do not exist "
    "in this table, plus a drop list mixing present (c_acctbal) and "
    "absent columns — the tolerance semantics of journey-data-"
    "transformation.py:63-71 / init-data-transformation.py:82-100, "
    "narrow/shuffle-free plan.",
    oracle="""
SELECT c_custkey, c_name AS customer_name, c_mktsegment
FROM customer
WHERE c_nationkey < 5
""",
)
def conditional_rename_guarded_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wheels_in_motion_analytics_spark.operators.projection import (
        drop_if_exists,
        rename_columns,
    )

    df = table(spark, sf_dir, "customer").where(F.col("c_nationkey") < 5)
    df = rename_columns(
        df,
        {
            "c_name": "customer_name",
            "Customer Name": "customer_name_variant",  # absent: skipped
            "c_phone": "phone",  # absent: skipped
        },
    )
    df = drop_if_exists(df, ["c_acctbal", "c_comment", "c_address"])
    return df.select("c_custkey", "customer_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# T1: backtick / embedded-space identifiers through the SQL surface
# ---------------------------------------------------------------------------


@register(
    "backtick_space_identifiers",
    category="sql",
    doc="T1 identifiers with embedded spaces (the reference's 'Start "
    "station number' contract, journey-data-transformation.py:63-71 / "
    "reference_pipeline.py:103-118): a view whose column names contain "
    "spaces is queried through spark.sql with backtick quoting end to "
    "end — projection, predicate, GROUP BY and aliases all on quoted "
    "identifiers. Oracle uses ANSI double-quoted identifiers for the "
    "same names.",
    oracle="""
SELECT "Market Segment" AS segment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(floor("Account Balance" * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS balance_cents
FROM (
  SELECT c_mktsegment AS "Market Segment", c_acctbal AS "Account Balance"
  FROM customer
) t
GROUP BY "Market Segment"
""",
)
def backtick_space_identifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    view = f"customers_spaced_{uuid.uuid4().hex[:8]}"
    (
        table(spark, sf_dir, "customer")
        .select(
            F.col("c_mktsegment").alias("Market Segment"),
            F.col("c_acctbal").alias("Account Balance"),
        )
        .createOrReplaceTempView(view)
    )
    return spark.sql(
        f"""
        SELECT `Market Segment` AS segment,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(floor(`Account Balance` * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS balance_cents
        FROM {view}
        GROUP BY `Market Segment`
        """
    )


# ---------------------------------------------------------------------------
# Parquet footer-statistics aggregate pushdown (DSv2)
# ---------------------------------------------------------------------------


@register(
    "parquet_agg_pushdown_stats",
    category="scan",
    doc="Parquet aggregate pushdown: MIN/MAX/COUNT answered from row-group "
    "footer statistics instead of scanning data pages — the DSv2 scan "
    "(spark.sql.parquet.aggregatePushdown) plans `PushedAggregation: "
    "[MIN(..), MAX(..), COUNT(*)]` and reads only metadata. At 100 TB this "
    "is the difference between a sub-second stats probe and a full-table "
    "scan for table-profile dashboards. MIN/MAX of stored values are exact "
    "and order-insensitive, so the doubles hash identically across engines. "
    "The pushdown conf is set and restored inside the callable "
    "(vanilla-session safe); the plan shape is pinned in "
    "tests/test_sources.py.",
    oracle="""
SELECT MIN(o_orderkey) AS key_min,
       MAX(o_orderkey) AS key_max,
       MIN(o_totalprice) AS price_min,
       MAX(o_totalprice) AS price_max,
       COUNT(*) AS n_rows
FROM orders
""",
)
def parquet_agg_pushdown_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    prev_push = spark.conf.get("spark.sql.parquet.aggregatePushdown", None)
    prev_v1 = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    # aggregate pushdown exists only in the DSv2 parquet scan; timestamps
    # are excluded from footer-stats pushdown, so the probe sticks to
    # bigint/double columns
    spark.conf.set("spark.sql.sources.useV1SourceList", "avro,csv,json,kafka,orc,text")
    try:
        df = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).agg(
            F.min("o_orderkey").alias("key_min"),
            F.max("o_orderkey").alias("key_max"),
            F.min("o_totalprice").alias("price_min"),
            F.max("o_totalprice").alias("price_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        # materialize the plan under the pushdown confs: localCheckpoint
        # executes eagerly, so restoring the confs afterwards cannot
        # un-push the already-planned scan
        return df.localCheckpoint(eager=True)
    finally:
        for key, prev in (
            ("spark.sql.parquet.aggregatePushdown", prev_push),
            ("spark.sql.sources.useV1SourceList", prev_v1),
        ):
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)


# ---------------------------------------------------------------------------
# K4 end-to-end: write_partitioned -> pruned read-back (r6 verdict item 6)
# ---------------------------------------------------------------------------

_K4_MONTHS = ["1995-01", "1995-02", "1995-03"]


@register(
    "partitioned_sink_pruned_read",
    category="sinks",
    doc="K4 run END-TO-END through the sink API (sinks/__init__.py:"
    "write_partitioned): orders land as a hive layout partitioned by "
    "order month, then the read-back filters on the partition column so "
    "the month predicate prunes directories (PartitionFilters — the same "
    "plan property tests/test_sinks.py pins for this writer) instead of "
    "scanning the table. Completes the §2a K4 mapping with its own "
    "driver row: partition_pruned_monthly_revenue proves the pruned READ "
    "on a prebuilt lake; this proves the WRITE half produces that lake. "
    "Reference: proc_0_ingest_to_GCP.dag.py:93-100 (monthly landing "
    "folders). localCheckpoint before cleanup (NOTES.md #6).",
    oracle=f"""
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice')} AS total_value
FROM orders
WHERE strftime(o_orderdate, '%Y-%m') IN ({", ".join(f"'{m}'" for m in _K4_MONTHS)})
GROUP BY 1
""",
)
def partitioned_sink_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from wheels_in_motion_analytics_spark.sinks import write_partitioned

    # The temp lake is deleted as soon as the eager localCheckpoint has
    # materialized the result blocks — valid in local mode where checkpoint
    # blocks never need recomputation against the deleted path (NOTES.md #6);
    # a clustered driver contract would need the lake kept until collect.
    tmp_root = tempfile.mkdtemp(prefix="sink_k4_")
    try:
        out = os.path.join(tmp_root, "orders_by_month")
        orders = table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        )
        write_partitioned(orders, out, ["order_month"])
        return (
            spark.read.parquet(out)
            .where(F.col("order_month").isin(_K4_MONTHS))
            .groupBy("order_month")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                dsum("o_totalprice").alias("total_value"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp_root, ignore_errors=True)
