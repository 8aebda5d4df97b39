"""Format interop beyond parquet: ORC / CSV / JSON-lines / XML round-trips.

The reference's lake is parquet/BigQuery-only; a Spark-native engine also
speaks ORC, CSV, JSONL and (Spark 4 native) XML out of the box. Each
registered query proves the full path — write the table AS <format>, read
it back (explicit schema for the text formats, so types survive the hop),
aggregate — and the DuckDB oracle runs the identical aggregate on the
original parquet, so any value drift introduced by the format hop (type
mapping, double formatting, compression) would hash-fail. Doubles survive
text serialization because Spark emits the shortest round-trippable
representation (Java ``Double.toString``).

avro is NOT registered: pyspark ships only the core avro jars, not the
``spark-avro`` connector, so ``format("avro")`` raises — probed, not
assumed.

Layout mirrors sources/partitioned.py: content-deterministic derived copies
under ``.derived/<sf>/``, built lazily once (``_SUCCESS``-guarded) and
reused by every later run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.compat import dsum, oracle_dsum
from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import SCHEMAS, table

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _derived_path(sf_dir: str, name: str) -> str:
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_REPO_ROOT, ".derived", sf_name, name)


def orc_orders_path(sf_dir: str) -> str:
    return _derived_path(sf_dir, "orders_orc")


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


@register(
    "csv_roundtrip_agg",
    category="sources",
    doc="CSV source/sink round-trip: customer written as gzip CSV with "
    "header (once, derived layout), read back through the explicit star "
    "schema (no inference — types are the contract), aggregated per market "
    "segment. Oracle aggregates the original parquet, so the text hop must "
    "be value-transparent including double formatting.",
    oracle=f"""
SELECT c_mktsegment,
       COUNT(*) AS n_custs,
       {oracle_dsum('c_acctbal')} AS total_bal
FROM customer
GROUP BY c_mktsegment
""",
)
def csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _derived_path(sf_dir, "customer_csv")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        table(spark, sf_dir, "customer").write.mode("overwrite").option(
            "header", "true"
        ).option("compression", "gzip").csv(path)
    return (
        spark.read.schema(SCHEMAS["customer"])
        .option("header", "true")
        .csv(path)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


@register(
    "jsonl_roundtrip_agg",
    category="sources",
    doc="JSON-lines source/sink round-trip: supplier written as gzip JSONL "
    "(once, derived layout), read back with the explicit schema, aggregated "
    "per nation. Oracle aggregates the original parquet.",
    oracle=f"""
SELECT s_nationkey,
       COUNT(*) AS n_suppliers,
       {oracle_dsum('s_acctbal')} AS total_bal
FROM supplier
GROUP BY s_nationkey
""",
)
def jsonl_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _derived_path(sf_dir, "supplier_jsonl")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        table(spark, sf_dir, "supplier").write.mode("overwrite").option(
            "compression", "gzip"
        ).json(path)
    return (
        spark.read.schema(SCHEMAS["supplier"])
        .json(path)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            dsum("s_acctbal").alias("total_bal"),
        )
    )


@register(
    "xml_roundtrip_agg",
    category="sources",
    doc="XML source/sink round-trip (Spark 4 native XML data source, "
    "SPARK-44265): part written as <part> row-tagged XML (once, derived "
    "layout), read back with the explicit schema, aggregated per p_type. "
    "Oracle aggregates the original parquet.",
    oracle=f"""
SELECT p_type,
       COUNT(*) AS n_parts,
       {oracle_dsum('p_retailprice')} AS total_price
FROM part
GROUP BY p_type
""",
)
def xml_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _derived_path(sf_dir, "part_xml")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        table(spark, sf_dir, "part").write.mode("overwrite").option(
            "rowTag", "part"
        ).xml(path)
    return (
        spark.read.schema(SCHEMAS["part"])
        .option("rowTag", "part")
        .xml(path)
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("p_retailprice").alias("total_price"),
        )
    )


@register(
    "federated_multiformat_join",
    category="sources",
    doc="Federated star across three storage formats in ONE plan: lineitem "
    "from parquet ⋈ orders from zstd ORC ⋈ customer from gzip CSV — "
    "revenue per market segment. Format is an access-path detail; the "
    "logical plan, pushdowns, and results are format-transparent (oracle "
    "aggregates the original parquet tables).",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def federated_multiformat_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = read_orc(spark, ensure_orc_orders(spark, sf_dir)).select(
        "o_orderkey", "o_custkey"
    )
    csv_path = _derived_path(sf_dir, "customer_csv")
    if not os.path.exists(os.path.join(csv_path, "_SUCCESS")):
        table(spark, sf_dir, "customer").write.mode("overwrite").option(
            "header", "true"
        ).option("compression", "gzip").csv(csv_path)
    cust = (
        spark.read.schema(SCHEMAS["customer"])
        .option("header", "true")
        .csv(csv_path)
        .select("c_custkey", "c_mktsegment")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Distributed synthetic data generation (dsdgen-in-SQL)
# ---------------------------------------------------------------------------

SYNTH_ROWS = 100_000


@register(
    "synthetic_generator_audit",
    category="scan",
    doc=f"Distributed synthetic data generation: {SYNTH_ROWS:,} rows built "
    "ENGINE-SIDE from a range scan (spark.range — parallel, no driver "
    "data) with md5-derived keys, categories, dates and amounts; the audit "
    "row carries count, category cardinality, date bounds and an "
    "order-independent checksum. The benchmark-fixture generator as a "
    "relational plan — DuckDB reproduces the identical table from "
    "range(), proving the generation is engine-portable (same trick the "
    "scaled dedup fixtures use).",
    oracle=f"""
WITH g AS (
  SELECT i,
         ('0x' || substr(md5('k:' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 1000
           AS cust,
         'cat' || CAST(('0x' || substr(md5('c:' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 7 AS VARCHAR)
           AS category,
         DATE '2020-01-01' + INTERVAL (('0x' || substr(md5('d:' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 1461) DAY
           AS d,
         ('0x' || substr(md5('a:' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 1000000
           AS amount_cents
  FROM (SELECT unnest(range({SYNTH_ROWS})) AS i)
)
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT category) AS n_categories,
       COUNT(DISTINCT cust) AS n_custs,
       CAST(MIN(d) AS DATE) AS min_date,
       CAST(MAX(d) AS DATE) AS max_date,
       CAST(CAST(SUM(CAST(('0x' || substr(md5(
           CAST(i AS VARCHAR) || '|' || CAST(cust AS VARCHAR) || '|' ||
           category || '|' || strftime(d, '%Y-%m-%d') || '|' ||
           CAST(amount_cents AS VARCHAR)), 1, 15))::BIGINT AS DECIMAL(38,0)))
           AS DECIMAL(38,0)) AS VARCHAR) AS checksum
FROM g
""",
)
def synthetic_generator_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wheels_in_motion_analytics_spark.functions.similarity import hash_hex

    def h(prefix: str) -> F.Column:
        return hash_hex(F.concat(F.lit(prefix), F.col("id").cast("string")))

    g = spark.range(SYNTH_ROWS).select(
        F.col("id").alias("i"),
        (h("k:") % 1000).alias("cust"),
        F.concat(F.lit("cat"), (h("c:") % 7).cast("string")).alias("category"),
        F.date_add(F.lit("2020-01-01").cast("date"), (h("d:") % 1461).cast("int")).alias("d"),
        (h("a:") % 1_000_000).alias("amount_cents"),
    )
    row_repr = F.concat(
        F.col("i").cast("string"),
        F.lit("|"),
        F.col("cust").cast("string"),
        F.lit("|"),
        F.col("category"),
        F.lit("|"),
        F.date_format("d", "yyyy-MM-dd"),
        F.lit("|"),
        F.col("amount_cents").cast("string"),
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("category").alias("n_categories"),
        F.countDistinct("cust").alias("n_custs"),
        F.min("d").alias("min_date"),
        F.max("d").alias("max_date"),
        F.sum(hash_hex(row_repr).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("checksum"),
    )


# ---------------------------------------------------------------------------
# Malformed-input handling: PERMISSIVE corrupt-record capture
# ---------------------------------------------------------------------------

CORRUPT_EVERY = 97  # orderkey % CORRUPT_EVERY == 0 rows are written broken


def corrupt_jsonl_path(sf_dir: str) -> str:
    return _derived_path(sf_dir, "orders_corrupt_jsonl")


def ensure_corrupt_jsonl(spark: SparkSession, sf_dir: str) -> str:
    """Write orders as JSONL where every ``o_orderkey % 97 == 0`` row is a
    deliberately truncated (unparseable) line — the fixture for the
    PERMISSIVE-mode audit. Content-deterministic, _SUCCESS-guarded."""
    path = corrupt_jsonl_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        good = F.to_json(
            F.struct(
                F.col("o_orderkey").alias("order_id"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").alias("total"),
            )
        )
        broken = F.concat(
            F.lit('{"order_id": '),
            F.col("o_orderkey").cast("string"),
            F.lit(', "status": '),
        )
        (
            table(spark, sf_dir, "orders")
            .select(
                F.when(F.col("o_orderkey") % CORRUPT_EVERY == 0, broken)
                .otherwise(good)
                .alias("value")
            )
            .write.mode("overwrite")
            .text(path)
        )
    return path


@register(
    "jsonl_corrupt_records_audit",
    category="sources",
    doc="Malformed-input ingestion: a JSONL feed where every 97th order is "
    "a truncated line, read in PERMISSIVE mode with an explicit schema and "
    "columnNameOfCorruptRecord — broken lines surface as rows with the "
    "raw text in the corrupt column instead of failing the job (the "
    "quarantine half of a production loader; the reference trusts its "
    "inputs, web_scraper.py:18-52). Audit: good/corrupt counts and the "
    "decimal-exact revenue over successfully parsed rows. The oracle "
    "re-derives both from the original table and the writer's corruption "
    "rule.",
    oracle=f"""
SELECT COUNT(*) AS n_total,
       COUNT(*) FILTER (WHERE o_orderkey % {CORRUPT_EVERY} <> 0) AS n_good,
       COUNT(*) FILTER (WHERE o_orderkey % {CORRUPT_EVERY} = 0) AS n_corrupt,
       {oracle_dsum(f'CASE WHEN o_orderkey % {CORRUPT_EVERY} <> 0 THEN o_totalprice END')}
         AS good_revenue
FROM orders
""",
)
def jsonl_corrupt_records_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = ensure_corrupt_jsonl(spark, sf_dir)
    parsed = (
        spark.read.schema(
            "order_id bigint, status string, total double, _corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
        # corrupt-column-only queries on raw JSON are disallowed (Spark
        # requires a materialized parse first) — and the audit reads the
        # parse result twice anyway
        .localCheckpoint()
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.col("total")).alias("n_good"),
        F.count(F.col("_corrupt")).alias("n_corrupt"),
        dsum(F.col("total")).alias("good_revenue"),
    )


# ---------------------------------------------------------------------------
# CSV quarantine: PERMISSIVE corrupt-record audit (typed-parse failures)
# ---------------------------------------------------------------------------

CSV_CORRUPT_EVERY = 89  # orderkey % CSV_CORRUPT_EVERY == 0 rows are poisoned


def corrupt_csv_path(sf_dir: str) -> str:
    return _derived_path(sf_dir, "orders_corrupt_csv")


def ensure_corrupt_csv(spark: SparkSession, sf_dir: str) -> str:
    """Write orders as headerless CSV where every ``o_orderkey % 89 == 0``
    row carries an unparseable total (type poison, not a token-count
    mismatch — Spark's CSV reader pads/truncates token-count drift without
    flagging it; only typed-parse failures reach the corrupt column).
    Content-deterministic, _SUCCESS-guarded."""
    path = corrupt_csv_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        total = F.when(
            F.col("o_orderkey") % CSV_CORRUPT_EVERY == 0, F.lit("##poison##")
        ).otherwise(F.col("o_totalprice").cast("string"))
        line = F.concat_ws(
            ",",
            F.col("o_orderkey").cast("string"),
            F.col("o_orderstatus"),
            total,
        )
        (
            table(spark, sf_dir, "orders")
            .select(line.alias("value"))
            .write.mode("overwrite")
            .text(path)
        )
    return path


@register(
    "csv_corrupt_records_audit",
    category="sources",
    doc="Malformed-CSV ingestion: a headerless CSV feed where every 89th "
    "order carries a type-poisoned price field, read in PERMISSIVE mode "
    "with columnNameOfCorruptRecord — the CSV twin of "
    "jsonl_corrupt_records_audit (CSV needs a TYPED parse failure to "
    "quarantine: Spark pads/truncates token-count drift silently). Audit: "
    "good/corrupt counts + decimal-exact revenue over parsed rows; the "
    "oracle re-derives all three from the original table and the writer's "
    "poison rule.",
    oracle=f"""
SELECT COUNT(*) AS n_total,
       COUNT(*) FILTER (WHERE o_orderkey % {CSV_CORRUPT_EVERY} <> 0) AS n_good,
       COUNT(*) FILTER (WHERE o_orderkey % {CSV_CORRUPT_EVERY} = 0) AS n_corrupt,
       {oracle_dsum(f'CASE WHEN o_orderkey % {CSV_CORRUPT_EVERY} <> 0 THEN o_totalprice END')}
         AS good_revenue
FROM orders
""",
)
def csv_corrupt_records_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = ensure_corrupt_csv(spark, sf_dir)
    parsed = (
        spark.read.schema(
            "order_id bigint, status string, total double, _corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
        # corrupt-column-only queries on a raw scan are disallowed (Spark
        # requires a materialized parse first; same rule as the JSONL twin)
        .localCheckpoint()
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.col("total")).alias("n_good"),
        F.count(F.col("_corrupt")).alias("n_corrupt"),
        dsum(F.col("total")).alias("good_revenue"),
    )


# ---------------------------------------------------------------------------
# Schema evolution on read: mergeSchema across parquet generations
# ---------------------------------------------------------------------------


def evolving_orders_path(sf_dir: str) -> str:
    return _derived_path(sf_dir, "orders_evolving")


def ensure_evolving_orders(spark: SparkSession, sf_dir: str) -> str:
    """Two parquet 'generations' under one root: gen=1 (even order keys)
    predates the status column; gen=2 (odd keys) carries it. Deterministic,
    _SUCCESS-guarded per generation directory."""
    root = evolving_orders_path(sf_dir)
    orders = table(spark, sf_dir, "orders")
    gens = {
        1: orders.where(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_totalprice"
        ),
        2: orders.where(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_totalprice", "o_orderstatus"
        ),
    }
    for gen, df in gens.items():
        path = os.path.join(root, f"gen={gen}")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            df.write.mode("overwrite").parquet(path)
    return root


@register(
    "schema_evolution_merge_read",
    category="sources",
    doc="Schema evolution ON READ: two parquet generations (the older one "
    "written before a column existed) unify under mergeSchema=true — the "
    "old generation's rows surface NULL for the late column, no rewrite of "
    "historical files (the lake counterpart of the conditional-rename "
    "drift tolerance, journey-data-transformation.py:63-71). Audit: row "
    "and revenue totals per status bucket, where the NULL bucket is "
    "exactly the pre-evolution generation.",
    oracle=f"""
SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS status,
       COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice')} AS revenue
FROM orders
GROUP BY 1
""",
)
def schema_evolution_merge_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = ensure_evolving_orders(spark, sf_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(root)
    return merged.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("revenue"),
    )


PARQUET_CODECS = ["snappy", "zstd", "gzip"]


@register(
    "parquet_codec_matrix",
    category="sources",
    doc=f"Parquet compression-codec matrix ({', '.join(PARQUET_CODECS)}): "
    "the same orders projection round-trips through each codec (derived "
    "copies under .derived/, idempotent) and every copy must decode to "
    "the identical relation — per-codec row count plus an exact "
    "content fingerprint (SUM of per-row md5-derived values mod 1e9+7, "
    "order-insensitive) that the oracle computes from the raw table. "
    "Codec choice is a pure storage trade-off; this pins that decode "
    "correctness is codec-independent.",
    oracle=f"""
WITH fp AS (
  SELECT COUNT(*) AS n_rows,
         CAST(SUM(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':' ||
                                      CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)),
                                  1, 14))::BIGINT % 1000000007) AS BIGINT) AS content_fp
  FROM orders
)
SELECT codec, n_rows, content_fp
FROM fp CROSS JOIN (SELECT unnest(['{"', '".join(sorted(PARQUET_CODECS))}']) AS codec)
""",
)
def parquet_codec_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    import functools

    from wheels_in_motion_analytics_spark.functions.similarity import hash_hex

    outs = []
    for codec in sorted(PARQUET_CODECS):
        path = _derived_path(sf_dir, f"orders_parquet_{codec}")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            (
                table(spark, sf_dir, "orders")
                .select("o_orderkey", "o_totalprice")
                .write.mode("overwrite")
                .option("compression", codec)
                .parquet(path)
            )
        df = spark.read.parquet(path)
        # per-row fp reduced mod 1e9+7 so the order-insensitive SUM fits
        # BIGINT at any row count the fixtures reach
        row_fp = hash_hex(
            F.concat_ws(
                ":",
                F.col("o_orderkey").cast("string"),
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                .cast("bigint")
                .cast("string"),
            ),
            14,
        ) % 1000000007
        outs.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(row_fp).alias("content_fp"),
            ).select(F.lit(codec).alias("codec"), "n_rows", "content_fp")
        )
    return functools.reduce(lambda x, y: x.unionByName(y), outs)
