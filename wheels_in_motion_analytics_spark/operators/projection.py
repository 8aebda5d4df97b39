"""Projection / rename / cast / filter operators (reference P1-P10, S1-S5).

Every operator here compiles to a narrow (shuffle-free) plan; filters and
column selections reach the parquet scan via Catalyst pushdown — at 100 TB
that pushdown IS the optimization (scan 2 columns, not 11; skip row groups on
the predicate). Citations: column renames
/root/reference/airflow/dags/scripts/init-data-transformation.py:49-54,
conditional renames journey-data-transformation.py:63-71, drops
init-data-transformation.py:82-100, casts journey-data-transformation.py:76-101,
null filter :118-126.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P2 conditional rename: apply only mappings whose source column exists
    (header-variant tolerance, journey-data-transformation.py:63-71)."""
    present = {a: b for a, b in mapping.items() if a in df.columns}
    return df.withColumnsRenamed(present) if present else df


def drop_if_exists(df: DataFrame, cols: list[str]) -> DataFrame:
    """P3 existence-guarded drop (init-data-transformation.py:82-100)."""
    return df.drop(*[c for c in cols if c in df.columns])


def cast_columns(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """P4/P5/P7 casts by column name -> Spark type string."""
    return df.withColumns({c: F.col(c).cast(t) for c, t in casts.items() if c in df.columns})


def conform_schema(df: DataFrame, schema, rename_map: dict[str, str] | None = None) -> DataFrame:
    """Schema-drift normalizer (SURVEY.md §7.5): optional renames, then
    project to exactly the target StructType — missing columns become typed
    NULLs, extras are dropped, present columns are cast. The explicit form
    of the reference's scattered P2/P3/D2 tolerance tricks."""
    if rename_map:
        df = rename_columns(df, rename_map)
    cols = []
    for field in schema.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


@register(
    "scan_parquet_project",
    category="scan",
    doc="S1-S5 columnar scan with projection+filter pushdown: 2 columns of "
    "lineitem under a date predicate (verify PushedFilters in explain).",
    oracle="""
SELECT l_orderkey, l_quantity
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
  AND l_quantity > 25
""",
)
def scan_parquet_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= F.lit("1998-06-01 00:00:00").cast("timestamp"))
               & (F.col("l_quantity") > 25))
        .select("l_orderkey", "l_quantity")
    )


@register(
    "project_rename_cast",
    category="projection",
    doc="P1/P4/P7 rename + typed casts (station_id BIGINT policy, "
    "journey-data-transformation.py:88-101): orders re-typed for serving.",
    oracle="""
SELECT o_orderkey AS order_id,
       CAST(o_custkey AS INTEGER) AS customer_id,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
       CAST(o_orderdate AS DATE) AS order_date
FROM orders
""",
)
def project_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = table(spark, sf_dir, "orders")
    df = rename_columns(df, {"o_orderkey": "order_id"})
    return df.select(
        "order_id",
        F.col("o_custkey").cast("int").alias("customer_id"),
        # Decimal cast inside (exact 2-dp quantization), DOUBLE out: raw
        # DECIMAL output canonicalizes differently across engines ("5194.5"
        # vs "5194.50") and flakes the driver's value hash.
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("total_price"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


@register(
    "filter_null_predicate",
    category="filter",
    doc="P9 NULL-rejecting filter + compound predicate "
    "(journey-data-transformation.py:118-126).",
    oracle="""
SELECT l_orderkey, l_linenumber, l_discount
FROM lineitem
WHERE l_discount IS NOT NULL
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_returnflag <> 'A'
""",
)
def filter_null_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .where(
            F.col("l_discount").isNotNull()
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_returnflag") != "A")
        )
        .select("l_orderkey", "l_linenumber", "l_discount")
    )


@register(
    "literal_default_columns",
    category="projection",
    doc="P8 literal/default column fill (0.0 coordinates for discovered "
    "stations, journey-data-transformation.py:129-135).",
    oracle="""
SELECT n_nationkey AS station_id,
       n_name AS station_name,
       CAST(0.0 AS DOUBLE) AS longitude,
       CAST(0.0 AS DOUBLE) AS latitude
FROM nation
""",
)
def literal_default_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("station_id"),
        F.col("n_name").alias("station_name"),
        F.lit(0.0).cast("double").alias("longitude"),
        F.lit(0.0).cast("double").alias("latitude"),
    )


@register(
    "ordered_projection",
    category="projection",
    doc="P10 fixed column order before union/write "
    "(journey-data-transformation.py:139-140).",
    oracle="SELECT c_mktsegment, c_name, c_custkey FROM customer",
)
def ordered_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_name", "c_custkey")


@register(
    "schema_drift_union_conform",
    category="projection",
    doc="Schema-drift ingestion, end-to-end: two generations of the orders "
    "feed — an old one missing o_orderpriority with a legacy column name, "
    "and a new one with an extra column — are conformed to the canonical "
    "schema (conform_schema: rename → cast → typed-NULL fill → drop "
    "extras) and unioned; aggregate proves NULL-fill and cast semantics. "
    "The registered form of the §2a P2/P3/D2 tolerance machinery.",
    oracle="""
WITH old_gen AS (
  SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
         CAST(NULL AS VARCHAR) AS o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 0
),
new_gen AS (
  SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
         o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 1
),
u AS (SELECT * FROM old_gen UNION ALL SELECT * FROM new_gen)
SELECT o_orderstatus,
       COALESCE(o_orderpriority, '<missing>') AS prio,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM u
GROUP BY 1, 2
""",
)
def schema_drift_union_conform(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.types as T

    target = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    )
    orders = table(spark, sf_dir, "orders")
    # old generation: legacy names, no priority column, extra audit column
    old_gen = orders.where(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total_price"),
        F.lit("legacy-batch").alias("ingest_tag"),
    )
    # new generation: canonical names plus an extra column to drop
    new_gen = orders.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
        F.lit(42).alias("ingest_version"),
    )
    conformed = conform_schema(
        old_gen,
        target,
        rename_map={
            "order_id": "o_orderkey",
            "status": "o_orderstatus",
            "total_price": "o_totalprice",
        },
    ).unionByName(conform_schema(new_gen, target))
    return conformed.groupBy(
        "o_orderstatus",
        F.coalesce("o_orderpriority", F.lit("<missing>")).alias("prio"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("total"),
    )
