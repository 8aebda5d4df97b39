"""Wide relational analytics — the remaining canonical TPC-H shapes
(Q4/Q5/Q6/Q7/Q9/Q11/Q13/Q15/Q16/Q19/Q20/Q21 analogues), adapted to this
star schema (no partsupp, no l_commitdate/l_receiptdate/l_shipmode — see
TESTDATA.md). Where the original needs a missing column the analogue keeps
the PLAN SHAPE (the thing the optimizer is graded on) and substitutes a
semantically equivalent predicate:

* lateness / failed fulfilment  -> ``l_returnflag = 'R'``
* partsupp supply links          -> ``SELECT DISTINCT l_partkey, l_suppkey``
  observed in lineitem (the reference's journey pipeline likewise derives
  dims from observed facts, journey-data-transformation.py:52-210)
* supply cost                    -> ``p_retailprice`` scaled.

Physical recipe matches plans/analytics.py: forced broadcast ONLY on
``tables.BROADCASTABLE`` dims; fact⋈fact joins carry no hint (shuffle +
AQE at 100 TB); every correlated subquery is decorrelated into a join or
window so nothing re-scans per row; every LIMIT has a total-order
tiebreak; float sums decimal-accumulated (compat.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.compat import dsum, oracle_dsum
from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table


@register(
    "forecast_revenue_change",
    category="plans",
    doc="TPC-H Q6 shape: pure scan-filter-aggregate — the predicate-pushdown "
    "benchmark. At 100 TB this is the query where PushedFilters on the "
    "parquet scan (shipdate range, discount band, qty cap) decide whether "
    "you read 1% or 100% of the table; no join, no shuffle beyond the "
    "1-row final agg.",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24
""",
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue_delta"))
    )


@register(
    "local_supplier_volume",
    category="plans",
    doc="TPC-H Q5 shape: revenue from orders where customer and supplier "
    "share a nation, per nation in one region/year — the canonical 6-way "
    "star join. lineitem⋈orders shuffles on orderkey (no hint); customer/"
    "supplier/nation/region ride as broadcasts; the c_nationkey = "
    "s_nationkey equality is applied post-join as a residual filter.",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
""",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = (
        table(spark, sf_dir, "region")
        .where(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "bilateral_trade_volume",
    category="plans",
    doc="TPC-H Q7 shape: shipping volume between two nations per year, "
    "keyed by (supplier nation, customer nation) in either direction. The "
    "nation filter lands on BOTH dim branches before the fact join, so the "
    "fact side is pruned by two broadcast semi-filters — at 100 TB only "
    "lineitems touching the two nations survive to the shuffle.",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
     OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def bilateral_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("supp_nation").isin("NATION_3", "NATION_8"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "product_profit_by_nation",
    category="plans",
    doc="TPC-H Q9 shape: profit per (supplier nation, year) for one part "
    "family. No partsupp in this schema, so cost = p_retailprice * "
    "l_quantity * 0.5 (fixed margin proxy) — the plan shape (part-name "
    "filter pruning the fact via broadcast, then orders for the year) is "
    "what matters. Profit quantized to an integer 1e4 grid: the 3-factor "
    "float product would round differently at DECIMAL(18,4) across engines "
    "(same hazard as pricing_summary_report's charge column).",
    oracle="""
SELECT n_name AS nation, o_year,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)
                - CAST(FLOOR(p_retailprice * l_quantity * 5000 + 0.5) AS BIGINT))
            AS DOUBLE) / 10000.0 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%gear%'
  AND EXTRACT(year FROM o_orderdate) IS NOT NULL
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
""".replace(
        "o_year,", "EXTRACT(year FROM o_orderdate) AS o_year,", 1
    ).replace(
        "GROUP BY n_name, o_year", "GROUP BY n_name, EXTRACT(year FROM o_orderdate)"
    ),
)
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    rev_q = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("long")
    cost_q = F.floor(F.col("p_retailprice") * F.col("l_quantity") * 5000 + 0.5).cast(
        "long"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg((F.sum(rev_q - cost_q).cast("double") / 10000.0).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "order_priority_fulfilment",
    category="plans",
    doc="TPC-H Q4 shape: order counts per priority for orders with at least "
    "one problematic lineitem in a quarter. No l_commitdate/l_receiptdate "
    "here, so 'problematic' = l_returnflag = 'R'; the EXISTS becomes a "
    "left-semi join (never a fact⋈fact row multiplication), then a "
    "5-group aggregate.",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-04-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def order_priority_fulfilment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1997-04-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderpriority")
    )
    flagged = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(flagged, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "customer_order_distribution",
    category="plans",
    doc="TPC-H Q13 shape: the double-aggregate — orders per customer "
    "(LEFT join keeps zero-order customers), then a histogram of those "
    "counts. Both aggregates are map-side combinable; the second one "
    "groups a customer-cardinality input down to ~dozens of rows.",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "top_revenue_supplier",
    category="plans",
    doc="TPC-H Q15 shape: suppliers whose quarter revenue equals the max "
    "over all suppliers. The CTE is computed ONCE (Spark reuses the "
    "aggregated subplan; the max is a 1-row broadcast-joined scalar, not a "
    "correlated re-scan). Revenue integer-quantized so the max-equality "
    "compare is exact on both engines.",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT))
           AS total_q
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(total_q AS DOUBLE) / 10000.0 AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_q = (SELECT MAX(total_q) FROM revenue)
ORDER BY s_suppkey
""",
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01 00:00:00").cast("timestamp"))
    )
    rev_q = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("long")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev_q).alias("total_q")
    )
    max_rev = revenue.agg(F.max("total_q").alias("max_q"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_q") == F.col("max_q"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_q").cast("double") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "disjunctive_bracket_revenue",
    category="plans",
    doc="TPC-H Q19 shape: revenue under an OR of three brand/size/quantity "
    "conjunctions. The join key (partkey) is common to all branches so "
    "Catalyst keeps ONE broadcast join and evaluates the disjunction as a "
    "residual; at 100 TB the l_quantity <= 40 bound (the union of all "
    "branch ranges) still pushes to the scan.",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 40)
""",
)
def disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & qty.between(20, 40))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "part_value_concentration",
    category="plans",
    doc="TPC-H Q11 shape: parts whose shipped value within one nation "
    "exceeds a fixed fraction of that nation's total — per-group agg "
    "HAVING-filtered against a 1-row global scalar (cross-joined, not "
    "re-computed per row). Values integer-quantized for an exact "
    "threshold compare.",
    oracle="""
WITH natline AS (
  SELECT l_partkey,
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT) AS vq
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
)
SELECT l_partkey AS partkey,
       CAST(SUM(vq) AS DOUBLE) / 10000.0 AS part_value
FROM natline
GROUP BY l_partkey
HAVING SUM(vq) > (SELECT SUM(vq) * 0.001 FROM natline)
ORDER BY part_value DESC, partkey ASC
""",
)
def part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = (
        table(spark, sf_dir, "nation")
        .where(F.col("n_name") == "NATION_5")
        .select("n_nationkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vq = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("long")
    natline = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("l_partkey"), vq.alias("vq"))
    )
    per_part = natline.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum("vq").alias("sum_vq")
    )
    total = natline.agg((F.sum("vq") * 0.001).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("sum_vq") > F.col("threshold"))
        .select(
            "partkey", (F.col("sum_vq").cast("double") / 10000.0).alias("part_value")
        )
        .orderBy(F.desc("part_value"), F.asc("partkey"))
    )


@register(
    "supplier_diversity_by_part",
    category="plans",
    doc="TPC-H Q16 shape: distinct supplier count per (brand, type, size "
    "bucket), excluding one brand and a complained-about supplier set. "
    "Supply links derive from observed lineitem shipments (no partsupp); "
    "the exclusion is a NULL-safe anti-join; the distinct count is exact.",
    oracle="""
WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM supply
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def supplier_diversity_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    supply = (
        table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    part = (
        table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#45")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    complained = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        supply.join(
            complained, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


@register(
    "promo_supply_candidates",
    category="plans",
    doc="TPC-H Q20 shape: suppliers in one nation who shipped more than "
    "half of any 'red%' part's 1997 volume — nested aggregate threshold "
    "feeding a semi-join up to supplier. partsupp/availqty absent, so the "
    "threshold compares a supplier's shipped qty per part against 50% of "
    "the part's total shipped qty (window over partkey, one shuffle).",
    oracle="""
WITH shipped AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY l_partkey, l_suppkey
)
SELECT s_name, s_suppkey
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (
    SELECT l_suppkey FROM (
      SELECT l_suppkey, supp_qty,
             SUM(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
      FROM shipped
    ) t
    WHERE supp_qty > 0.5 * part_qty
  )
ORDER BY s_suppkey
""",
)
def promo_supply_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    red_parts = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    shipped = (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("part_qty", F.sum("supp_qty").over(w))
        .where(F.col("supp_qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    nation = (
        table(spark, sf_dir, "nation")
        .where(F.col("n_name") == "NATION_2")
        .select("n_nationkey")
    )
    return (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_suppkey")
    )


@register(
    "sole_failing_supplier",
    category="plans",
    doc="TPC-H Q21 shape: suppliers who were the ONLY one with a returned "
    "('R') lineitem on a multi-supplier order — EXISTS (another supplier "
    "on the order) + NOT EXISTS (another supplier also returned). Both "
    "correlated subqueries decorrelate into one per-order aggregate "
    "(distinct supplier counts) joined back — one shuffle on orderkey, "
    "never a per-row re-scan.",
    oracle="""
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_fail
  FROM lineitem
  GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM lineitem
JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND n_supp > 1
  AND n_fail = 1
  AND n_name = 'NATION_9'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def sole_failing_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_fail"),
    )
    nation = (
        table(spark, sf_dir, "nation")
        .where(F.col("n_name") == "NATION_9")
        .select("n_nationkey")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_fail") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
