"""Python UDF surface (§2b gap fill — the reference registers zero UDFs).

Demonstrates every UDF tier with its cost posture:

* pandas_udf (scalar)      — Arrow-vectorized, the ONLY acceptable Python
                             scalar path in a hot loop;
* pandas_udf (grouped agg) — Arrow-vectorized UDAF;
* applyInPandas            — grouped-map transform (UDAF returning rows);
* udf (row-at-a-time)      — registered deliberately as the ANTI-PATTERN
                             exhibit: ~10-100× slower than the pandas tiers;
                             always prefer the built-in shown in its oracle;
* udtf                     — table function expanding one row to many.

Every op here is deterministic, so each has a DuckDB oracle despite running
through Python — the correctness contract doesn't care which tier executes.
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table


@register(
    "pandas_udf_scalar_normalize",
    category="udf",
    doc="Scalar pandas UDF: vectorized text normalization — Arrow batches, "
    "no per-row Python.",
    oracle="""
SELECT doc_id,
       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_text
FROM documents
""",
)
def pandas_udf_scalar_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # defined lazily: pandas_udf type parsing needs an active session
    @pandas_udf("string")
    def normalize_text(s: pd.Series) -> pd.Series:
        return s.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()

    return table(spark, sf_dir, "documents").select(
        "doc_id", normalize_text("text").alias("norm_text")
    )


@register(
    "pandas_udaf_weighted_mean",
    category="udf",
    doc="Grouped-aggregate pandas UDF (UDAF): quantity-weighted mean price "
    "per return flag (rounded — numpy pairwise sum vs sequential).",
    oracle="""
SELECT l_returnflag,
       ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS weighted_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def pandas_udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def weighted_mean_price(price: pd.Series, qty: pd.Series) -> float:
        return round(float((price * qty).sum() / qty.sum()), 4)

    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(weighted_mean_price("l_extendedprice", "l_quantity").alias("weighted_price"))
    )


@register(
    "grouped_map_demean",
    category="udf",
    doc="applyInPandas grouped-map: per-user event values demeaned within "
    "the group (whole-group transform that built-ins can't stream).",
    oracle="""
WITH q AS (
  SELECT event_id, user_id,
         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vq,
         SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT)) OVER (PARTITION BY user_id) AS sq,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
)
SELECT event_id, user_id,
       CAST(vq * n - sq AS DOUBLE) / (n * 10000.0) AS value_demeaned
FROM q
""",
)
def grouped_map_demean(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value_demeaned", T.DoubleType()),
        ]
    )

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # quantize to int64 so the group sum is exact — the demeaned value
        # (vq*n - sum)/(n*scale) is then a deterministic double in any
        # engine, immune to float summation order. floor(x+0.5), not
        # .round(): pandas rounds half-to-even, DuckDB half-away-from-zero —
        # an exact .5 would quantize differently and break the differential.
        vq = np.floor(pdf["value"] * 10000 + 0.5).astype("int64")
        n = len(vq)
        s = int(vq.sum())
        out = pdf[["event_id", "user_id"]].copy()
        out["value_demeaned"] = (vq * n - s).astype("float64") / (n * 10000.0)
        return out

    return (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        # pin a 32-way hash layout on the grouping key: it satisfies the
        # grouped-map's ClusteredDistribution (no second exchange) and stops
        # AQE coalescing the Python stage down to 1-2 tasks on small input
        .repartition(32, "user_id")
        .groupBy("user_id")
        .applyInPandas(demean, schema)
    )


@register(
    "python_udf_row_at_a_time",
    category="udf",
    doc="Row-at-a-time Python UDF — THE ANTI-PATTERN EXHIBIT. Semantically "
    "identical to the CASE expression in its oracle; benchmark the two to "
    "see the ~10-100× serialization tax. Never in a 100 TB hot path.",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 50000 THEN 'mid'
            ELSE 'low' END AS bucket
FROM orders
""",
)
def python_udf_row_at_a_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf("string")
    def bucket(price: float) -> str:
        if price > 200000:
            return "high"
        if price > 50000:
            return "mid"
        return "low"

    return table(spark, sf_dir, "orders").select(
        "o_orderkey", bucket("o_totalprice").alias("bucket")
    )


@register(
    "udtf_expand_installments",
    category="udf",
    doc="Python UDTF: expand each urgent order into 3 installment rows "
    "(one row → many rows through a table function).",
    oracle="""
SELECT o_orderkey,
       CAST(n AS INTEGER) AS installment,
       ROUND(o_totalprice / 3, 4) AS amount
FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'),
     (SELECT unnest(range(1, 4)) AS n)
""",
)
def udtf_expand_installments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey: bigint, installment: int, amount: double")
    class Installments:
        def eval(self, o_orderkey: int, o_totalprice: float):
            for n in range(1, 4):
                yield o_orderkey, n, round(o_totalprice / 3, 4)

    orders = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    orders.createOrReplaceTempView("urgent_orders_for_udtf")
    spark.udtf.register("installments_udtf", Installments)
    return spark.sql(
        """
        SELECT i.o_orderkey, i.installment, i.amount
        FROM urgent_orders_for_udtf o,
             LATERAL installments_udtf(o.o_orderkey, o.o_totalprice) i
        """
    )


@register(
    "arrow_python_udf_bucket",
    category="udf",
    doc="Arrow-OPTIMIZED scalar Python UDF (@udf(useArrow=True), Spark "
    "3.5+): the same bucketing logic as the row-at-a-time anti-pattern "
    "exhibit, but serialized as Arrow batches instead of pickled rows — "
    "the drop-in mitigation tier between a row UDF and a pandas UDF "
    "(completes the Python-UDF tier matrix: row / arrow-scalar / "
    "pandas-scalar / pandas-agg / grouped-map / mapInArrow / "
    "applyInArrow / UDTF). Same oracle as the row exhibit — benchmark "
    "the pair to see the serialization tax in isolation.",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 50000 THEN 'mid'
            ELSE 'low' END AS bucket
FROM orders
""",
)
def arrow_python_udf_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf("string", useArrow=True)
    def bucket(price: float) -> str:
        if price > 200000:
            return "high"
        if price > 50000:
            return "mid"
        return "low"

    return table(spark, sf_dir, "orders").select(
        "o_orderkey", bucket("o_totalprice").alias("bucket")
    )


@register(
    "cogrouped_map_customer_orders",
    category="udf",
    doc="COGROUPED pandas map (df1.groupBy(...).cogroup(df2.groupBy(...))"
    ".applyInPandas): the two-sided custom-merge tier of the UDF matrix "
    "(asof/merge logic that doesn't fit a join goes here). Cogroups on a "
    "COARSE bucket key (pmod(custkey, 256)) — one Python invocation per "
    "bucket, with the per-customer merge fully vectorized inside the "
    "kernel (pandas groupby + merge), NOT one invocation per customer: "
    "per-key cogroup measured 30-40s at sf0.1 (15k 1-row frames) vs ~1s "
    "bucketed. Both sides repartition(32, bucket) so the Python exchange "
    "satisfies the cogroup's ClusteredDistribution with real parallelism "
    "instead of an AQE-coalesced 2-task stage. Exact integer cents inside "
    "the kernel; oracle is the equivalent relational join+agg.",
    oracle="""
SELECT c_custkey,
       COUNT(o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)), 0) AS BIGINT)
         AS order_cents,
       CAST(floor(ANY_VALUE(c_acctbal) * 100 + 0.5) AS BIGINT) AS acctbal_cents
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
""",
)
def cogrouped_map_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.types as T

    buckets, parts = 256, 32
    cust = (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .withColumn("bucket", F.pmod("c_custkey", F.lit(buckets)))
        .repartition(parts, "bucket")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("bucket", F.pmod("o_custkey", F.lit(buckets)))
        .repartition(parts, "bucket")
    )

    def merge(cdf, odf):
        import numpy as np
        import pandas as pd

        if not len(cdf):
            # orders whose customers are all absent from the dim — not in
            # the LEFT-join oracle relation, emit nothing
            return pd.DataFrame(
                {"c_custkey": [], "n_orders": [], "order_cents": [], "acctbal_cents": []}
            )
        if len(odf):
            # np.floor (not astype(int): truncation ≠ floor for negatives)
            cents = np.floor(odf["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
            per_cust = (
                pd.DataFrame({"o_custkey": odf["o_custkey"].to_numpy(), "cents": cents})
                .groupby("o_custkey", sort=False)
                .agg(n_orders=("cents", "size"), order_cents=("cents", "sum"))
            )
        else:
            per_cust = pd.DataFrame(
                {"n_orders": [], "order_cents": []},
                index=pd.Index([], name="o_custkey"),
            )
        out = cdf[["c_custkey"]].merge(
            per_cust, left_on="c_custkey", right_index=True, how="left"
        )
        out["n_orders"] = out["n_orders"].fillna(0).astype("int64")
        out["order_cents"] = out["order_cents"].fillna(0).astype("int64")
        out["acctbal_cents"] = np.floor(
            cdf["c_acctbal"].to_numpy() * 100 + 0.5
        ).astype("int64")
        return out

    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("n_orders", T.LongType()),
            T.StructField("order_cents", T.LongType()),
            T.StructField("acctbal_cents", T.LongType()),
        ]
    )
    return (
        cust.groupBy("bucket")
        .cogroup(orders.groupBy("bucket"))
        .applyInPandas(merge, schema)
    )
