"""Multi-dimensional data layout: Z-order (Morton) interleaving.

At 100 TB the dominant cost of a selective two-column predicate is how many
files the scan must open. Sorting by ONE column gives perfect min/max
pruning on that column and none on the other; interleaving the bits of both
keys (the Z-order curve — the same layout Delta/Iceberg `OPTIMIZE ZORDER BY`
uses) clusters files in BOTH dimensions, so parquet footer min/max ranges
become small boxes and a 2-D predicate skips most files.

The z-value is pure JVM-side integer arithmetic (shift/mask magic-number bit
spreading — Morton encoding), identical in DuckDB, so the key computation is
oracle-checked; the pruning benefit itself is asserted in
tests/test_layout.py by counting predicate-box/file-stats overlaps via
parquet footers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table

_SPREAD_STEPS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def spread16(x: Column) -> Column:
    """Spread a 16-bit value's bits to even positions (Morton half-encode)."""
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """32-bit Z-order (Morton) interleave of two 16-bit keys. The inputs
    must already be scaled to comparable bit widths — interleaving raw keys
    of very different cardinality leaves the curve ordered by the wider
    key's high bits alone (see :func:`scale16`)."""
    a16 = a.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    b16 = b.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    return spread16(a16).bitwiseOR(F.shiftleft(spread16(b16), 1))


def scale16(x: Column, xmin: Column, xmax: Column) -> Column:
    """Min-max scale a key to the full 16-bit domain so both dimensions
    contribute equally to the curve's high bits (what Delta's OPTIMIZE
    ZORDER achieves with per-column range ids). Exact in double: the
    numerator is ≤ 2^32."""
    rng = F.greatest(xmax - xmin, F.lit(1))
    return F.floor((x - xmin).cast("double") * 65535.0 / rng.cast("double")).cast(
        "bigint"
    )


def _oracle_spread(expr: str) -> str:
    for shift, mask in _SPREAD_STEPS:
        expr = f"(({expr} | ({expr} << {shift})) & {mask})"
    return expr


def _oracle_zorder(a: str, b: str) -> str:
    sa = _oracle_spread(f"({a} & 65535)")
    sb = _oracle_spread(f"({b} & 65535)")
    return f"({sa} | ({sb} << 1))"


def zorder_layout(df: DataFrame, a: str, b: str, n_files: int) -> DataFrame:
    """Cluster ``df`` for 2-D pruning on (a, b): min-max scale both keys to
    16 bits, range-partition by the interleaved z-value into ``n_files``
    splits and sort within each — one stats pass + one shuffle, no global
    sort, ready for a partitioned parquet write."""
    stats = df.agg(
        F.min(a).alias("__amin"),
        F.max(a).alias("__amax"),
        F.min(b).alias("__bmin"),
        F.max(b).alias("__bmax"),
    )
    with_z = df.crossJoin(F.broadcast(stats)).withColumn(
        "__z",
        zorder_key(
            scale16(F.col(a), F.col("__amin"), F.col("__amax")),
            scale16(F.col(b), F.col("__bmin"), F.col("__bmax")),
        ),
    )
    return (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "__amin", "__amax", "__bmin", "__bmax")
    )


_ORACLE_SCALE_A = (
    "CAST(floor(CAST(l_partkey - pmin AS DOUBLE) * 65535.0"
    " / CAST(greatest(pmax - pmin, 1) AS DOUBLE)) AS BIGINT)"
)
_ORACLE_SCALE_B = (
    "CAST(floor(CAST(l_suppkey - smin AS DOUBLE) * 65535.0"
    " / CAST(greatest(smax - smin, 1) AS DOUBLE)) AS BIGINT)"
)


ZONE_ROWS = 512
ZONE_LO = "1995-01-01 00:00:00"
ZONE_HI = "1995-04-01 00:00:00"


@register(
    "zone_map_skipping_audit",
    category="layout",
    doc=f"Zone-map (min/max file-statistics) skipping audit: group orders "
    f"into {ZONE_ROWS}-row zones under two layouts — natural key order "
    "(o_orderkey, the insert order) vs date-clustered (o_orderdate with a "
    "unique tiebreak) — record each zone's [min,max] o_orderdate, and count "
    "how many zones a one-quarter date predicate must open plus the rows "
    "those zones scan. This is the arithmetic behind parquet footer pruning "
    "at 100 TB: the clustered layout confines the predicate to contiguous "
    "zones while the natural layout opens nearly all of them. Both global "
    "row numbers use the two-phase range-partitioned rank (no single-task "
    "window); the rest is two tiny zone-level aggs.",
    oracle=f"""
WITH natural_rn AS (
  SELECT o_orderdate,
         (row_number() OVER (ORDER BY o_orderkey) - 1) // {ZONE_ROWS} AS zone
  FROM orders
),
clustered_rn AS (
  SELECT o_orderdate,
         (row_number() OVER (ORDER BY o_orderdate, o_orderkey) - 1) // {ZONE_ROWS} AS zone
  FROM orders
),
zones AS (
  SELECT 'natural' AS layout, zone, MIN(o_orderdate) AS dmin,
         MAX(o_orderdate) AS dmax, COUNT(*) AS zone_rows
  FROM natural_rn GROUP BY zone
  UNION ALL
  SELECT 'date_clustered', zone, MIN(o_orderdate), MAX(o_orderdate), COUNT(*)
  FROM clustered_rn GROUP BY zone
)
SELECT layout,
       COUNT(*) AS n_zones,
       CAST(SUM(CASE WHEN dmax >= TIMESTAMP '{ZONE_LO}'
                      AND dmin < TIMESTAMP '{ZONE_HI}' THEN 1 ELSE 0 END)
            AS BIGINT) AS zones_opened,
       CAST(SUM(CASE WHEN dmax >= TIMESTAMP '{ZONE_LO}'
                      AND dmin < TIMESTAMP '{ZONE_HI}' THEN zone_rows ELSE 0 END)
            AS BIGINT) AS rows_scanned
FROM zones
GROUP BY layout
""",
)
def zone_map_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wheels_in_motion_analytics_spark.operators.windows import global_row_number

    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lo, hi = F.lit(ZONE_LO).cast("timestamp"), F.lit(ZONE_HI).cast("timestamp")

    def zones(df: DataFrame, order_cols: list, layout: str) -> DataFrame:
        ranked = global_row_number(df, order_cols, rn_name="__rn")
        return (
            ranked.withColumn("zone", ((F.col("__rn") - 1) / ZONE_ROWS).cast("bigint"))
            .groupBy("zone")
            .agg(
                F.min("o_orderdate").alias("dmin"),
                F.max("o_orderdate").alias("dmax"),
                F.count(F.lit(1)).alias("zone_rows"),
            )
            .withColumn("layout", F.lit(layout))
        )

    both = zones(orders, [F.asc("o_orderkey")], "natural").unionByName(
        zones(orders, [F.asc("o_orderdate"), F.asc("o_orderkey")], "date_clustered")
    )
    opened = (F.col("dmax") >= lo) & (F.col("dmin") < hi)
    return both.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_zones"),
        F.sum(F.when(opened, 1).otherwise(0)).alias("zones_opened"),
        F.sum(F.when(opened, F.col("zone_rows")).otherwise(0)).alias("rows_scanned"),
    )


@register(
    "zorder_interleave_keys",
    category="layout",
    doc="Morton/Z-order key for (l_partkey, l_suppkey), each min-max scaled "
    "to the 16-bit domain first so both dimensions drive the curve's high "
    "bits — the clustering key behind 2-D min/max file pruning "
    "(Delta/Iceberg OPTIMIZE ZORDER analogue). One stats pass + shift/mask "
    "integer arithmetic, one codegen stage; layout efficacy (files skipped "
    "under a 2-D predicate box) is asserted against parquet footers in "
    "tests/test_layout.py.",
    oracle=f"""
WITH stats AS (
  SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
         MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       {_oracle_zorder(_ORACLE_SCALE_A, _ORACLE_SCALE_B)} AS zval
FROM lineitem, stats
""",
)
def zorder_interleave_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.min("l_partkey").alias("pmin"),
        F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
    )
    return li.crossJoin(F.broadcast(stats)).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        zorder_key(
            scale16(F.col("l_partkey"), F.col("pmin"), F.col("pmax")),
            scale16(F.col("l_suppkey"), F.col("smin"), F.col("smax")),
        ).alias("zval"),
    )
