"""Scalar function suites: string / math / JSON / conditional / array / map
(§2b gap fill; reference string ops T1-T3 at
/root/reference/airflow/dags/web_scraper.py:37-46,
proc_0_ingest_to_GCP.dag.py:44).

All expressions are JVM built-ins inside whole-stage codegen — zero Python in
the row path. libm-backed results (ln/sqrt/pow) are rounded before emission so
Spark(JVM Math) and DuckDB(libm) agree bit-wise after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table


@register(
    "string_funcs_suite",
    category="scalars",
    doc="T1-T3 string surface: case, slice, split/element_at, regexp, "
    "startswith/endswith predicates, concat.",
    oracle="""
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       lower(p_type) AS type_lower,
       substr(p_name, 1, 8) AS name_prefix,
       CAST(length(p_name) AS INTEGER) AS name_len,
       split_part(p_type, ' ', -1) AS type_last_word,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
       CAST(starts_with(p_type, 'STANDARD') AS BOOLEAN) AS is_standard,
       CAST(ends_with(p_type, 'STEEL') AS BOOLEAN) AS is_steel,
       concat_ws(':', p_brand, p_type) AS brand_type,
       replace(p_name, ' ', '_') AS name_snake,
       trim(p_name) AS name_trim
FROM part
""",
)
def string_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.element_at(F.split("p_type", " "), -1).alias("type_last_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.col("p_type").startswith("STANDARD").alias("is_standard"),
        F.col("p_type").endswith("STEEL").alias("is_steel"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.trim("p_name").alias("name_trim"),
    )


@register(
    "math_funcs_suite",
    category="scalars",
    doc="Math scalar surface (abs/round/floor/ceil/sqrt/ln/pow/mod), "
    "libm results rounded for cross-engine stability.",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS abs_disc_delta,
       round(l_extendedprice, 1) AS price_round1,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
       round(sqrt(l_extendedprice), 6) AS price_sqrt,
       round(ln(l_extendedprice + 1), 6) AS price_ln,
       round(pow(l_quantity, 2), 6) AS qty_sq,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
FROM lineitem
""",
)
def math_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_delta"),
        F.round("l_extendedprice", 1).alias("price_round1"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
    )


@register(
    "json_funcs_suite",
    category="scalars",
    doc="JSON extraction from the events.props payload (the weather-JSON "
    "normalization S8 generalized to per-row JSON).",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
FROM events
""",
)
def json_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


@register(
    "conditional_funcs_suite",
    category="scalars",
    doc="CASE WHEN / coalesce / nullif / least / greatest.",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END AS price_class,
       coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
       least(o_totalprice, 150000.0) AS price_capped,
       greatest(o_totalprice, 1000.0) AS price_floored
FROM orders
""",
)
def conditional_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("price_class"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias("status_norm"),
        F.least("o_totalprice", F.lit(150000.0)).alias("price_capped"),
        F.greatest("o_totalprice", F.lit(1000.0)).alias("price_floored"),
    )


@register(
    "array_funcs_suite",
    category="scalars",
    doc="Array surface over embedding vectors: size, element_at, slice, and "
    "an order-stable higher-order aggregate (F.aggregate) — the building "
    "block for the similarity ops.",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
       ROUND(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 6) AS head_sum,
       ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_elem
FROM embeddings
""",
)
def array_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = F.col("embedding")
    return table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_elem"),
        F.round(
            F.aggregate(
                F.slice(emb, 1, 8),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double"),
            ),
            6,
        ).alias("head_sum"),
        F.round(F.array_max(emb).cast("double"), 6).alias("max_elem"),
    )


@register(
    "map_struct_funcs",
    category="scalars",
    doc="Map/struct construction + explode back to rows (nested types are "
    "first-class here, unlike the reference's flatten-before-parquet policy "
    "— SURVEY.md §1.2). Oracle checks the exploded flat form.",
    oracle="""
SELECT n_nationkey, 'name' AS attr_key, n_name AS attr_value FROM nation
UNION ALL
SELECT n_nationkey, 'region' AS attr_key, CAST(n_regionkey AS VARCHAR) FROM nation
""",
)
def map_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = table(spark, sf_dir, "nation")
    with_map = nation.select(
        "n_nationkey",
        F.create_map(
            F.lit("name"), F.col("n_name"),
            F.lit("region"), F.col("n_regionkey").cast("string"),
        ).alias("attrs"),
    )
    return with_map.select(
        "n_nationkey", F.explode("attrs").alias("attr_key", "attr_value")
    )
