"""Spatial radius join via grid bucketing — the distributed point-proximity
operator (geofencing, station-catchment, pickup-matching workloads).

The testdata carries no coordinates, so each entity gets a SYNTHETIC but
deterministic position: md5-derived integers on a 1,000,000×1,000,000 grid
(documented convention, both engines derive the identical points). All
geometry is INTEGER — squared euclidean distance in int64 — so the operator
is exactly oracle-checkable with zero float discipline needed.

Scale shape (the point of the operator): never the all-pairs cross join.
Each point buckets into a cell of side = radius; a candidate pair can only
live in the probe point's 3×3 cell neighborhood, so the join is an
equi-join on cell id (one shuffle, skew-bounded by cell occupancy) with the
exact distance predicate applied AFTER candidate generation. The oracle
does the quadratic cross join — tractable at oracle scale, and the result
sets must be identical (grid candidate generation is lossless for r ≤ cell
side: |Δcell| ≤ 1 in each axis).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.functions.similarity import (
    _oracle_hash,
    hash_hex,
)
from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table

GRID = 1_000_000  # coordinate space side
RADIUS = 60_000  # join radius; cell side == RADIUS
_R2 = RADIUS * RADIUS


def _coord(prefix: str, key: Column) -> Column:
    """Deterministic synthetic coordinate in [0, GRID)."""
    return hash_hex(F.concat(F.lit(prefix), key.cast("string")), 12) % GRID


def _oracle_coord(prefix: str, expr: str) -> str:
    inner = f"'{prefix}' || CAST({expr} AS VARCHAR)"
    return f"{_oracle_hash(inner, 12)} % {GRID}"


@register(
    "spatial_radius_join",
    category="spatial",
    doc=f"Radius join (r={RADIUS} on a {GRID}² integer grid): customers and "
    "suppliers get md5-derived synthetic coordinates; pairs within r are "
    "found by bucketing into r-sided cells and equi-joining each supplier "
    "cell against the customer's 3×3 cell neighborhood (candidate join on "
    "cell id — one shuffle, no cross join), then the exact int64 squared-"
    "distance predicate. Lossless vs the oracle's quadratic formulation "
    "because r ≤ cell side. Emits pairs + distance squared, all integers.",
    oracle=f"""
WITH c AS (
  SELECT c_custkey,
         {_oracle_coord('sx|', 'c_custkey')} AS x,
         {_oracle_coord('sy|', 'c_custkey')} AS y
  FROM customer
),
s AS (
  SELECT s_suppkey,
         {_oracle_coord('sx|', 's_suppkey + 9000000')} AS x,
         {_oracle_coord('sy|', 's_suppkey + 9000000')} AS y
  FROM supplier
)
SELECT c.c_custkey, s.s_suppkey,
       (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS dist_sq
FROM c CROSS JOIN s
WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= {_R2}
""",
)
def spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        _coord("sx|", F.col("c_custkey")).alias("x"),
        _coord("sy|", F.col("c_custkey")).alias("y"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _coord("sx|", F.col("s_suppkey") + 9_000_000).alias("x"),
        _coord("sy|", F.col("s_suppkey") + 9_000_000).alias("y"),
    )
    # suppliers land in their own cell; customers replicate into the 3×3
    # neighborhood so every within-r pair shares a cell key exactly once
    s_cells = supp.select(
        "s_suppkey",
        F.col("x").alias("sx"),
        F.col("y").alias("sy"),
        (F.col("x") - F.col("x") % RADIUS).alias("cx"),
        (F.col("y") - F.col("y") % RADIUS).alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    c_cells = (
        cust.select(
            "c_custkey",
            F.col("x").alias("px"),
            F.col("y").alias("py"),
            F.explode(offsets).alias("o"),
        )
        .select(
            "c_custkey",
            "px",
            "py",
            (F.col("px") - F.col("px") % RADIUS + F.col("o.dx") * RADIUS).alias("cx"),
            (F.col("py") - F.col("py") % RADIUS + F.col("o.dy") * RADIUS).alias("cy"),
        )
    )
    d2 = (F.col("px") - F.col("sx")) * (F.col("px") - F.col("sx")) + (
        F.col("py") - F.col("sy")
    ) * (F.col("py") - F.col("sy"))
    return (
        c_cells.join(s_cells, ["cx", "cy"])
        .where(d2 <= _R2)
        .select("c_custkey", "s_suppkey", d2.alias("dist_sq"))
    )


# ---------------------------------------------------------------------------
# Nearest-neighbor (1-NN) join
# ---------------------------------------------------------------------------


@register(
    "spatial_nearest_supplier",
    category="spatial",
    doc="1-NN join: each customer's nearest supplier by exact int64 squared "
    "distance. Phase 1 answers customers with any supplier inside their "
    "3×3 grid ring (the radius-join candidate machinery); phase 2 "
    "brute-forces ONLY the unmatched remainder against the (broadcastable) "
    "supplier relation — the standard two-phase distributed kNN: the ring "
    "bounds candidate volume, the fallback bounds worst-case correctness. "
    "Ties break on the smaller supplier key (min_by on (d2, key)).",
    oracle=f"""
WITH c AS (
  SELECT c_custkey,
         {_oracle_coord('sx|', 'c_custkey')} AS x,
         {_oracle_coord('sy|', 'c_custkey')} AS y
  FROM customer
),
s AS (
  SELECT s_suppkey,
         {_oracle_coord('sx|', 's_suppkey + 9000000')} AS x,
         {_oracle_coord('sy|', 's_suppkey + 9000000')} AS y
  FROM supplier
),
d AS (
  SELECT c.c_custkey, s.s_suppkey,
         (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS d2
  FROM c CROSS JOIN s
)
SELECT c_custkey, s_suppkey AS nearest_supplier, d2 AS dist_sq
FROM (
  SELECT c_custkey, s_suppkey, d2,
         row_number() OVER (PARTITION BY c_custkey
                            ORDER BY d2, s_suppkey) AS rn
  FROM d
)
WHERE rn = 1
""",
)
def spatial_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        _coord("sx|", F.col("c_custkey")).alias("px"),
        _coord("sy|", F.col("c_custkey")).alias("py"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _coord("sx|", F.col("s_suppkey") + 9_000_000).alias("sx"),
        _coord("sy|", F.col("s_suppkey") + 9_000_000).alias("sy"),
    )
    d2 = (F.col("px") - F.col("sx")) * (F.col("px") - F.col("sx")) + (
        F.col("py") - F.col("sy")
    ) * (F.col("py") - F.col("sy"))

    def argmin(pairs: DataFrame) -> DataFrame:
        return pairs.groupBy("c_custkey").agg(
            F.min_by(
                F.col("s_suppkey"), F.struct(F.col("d2"), F.col("s_suppkey"))
            ).alias("nearest_supplier"),
            F.min("d2").alias("dist_sq"),
        )

    # phase 1: ring candidates via the shared grid machinery
    s_cells = supp.select(
        "s_suppkey",
        "sx",
        "sy",
        (F.col("sx") - F.col("sx") % RADIUS).alias("cx"),
        (F.col("sy") - F.col("sy") % RADIUS).alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    c_cells = cust.select(
        "c_custkey", "px", "py", F.explode(offsets).alias("o")
    ).select(
        "c_custkey",
        "px",
        "py",
        (F.col("px") - F.col("px") % RADIUS + F.col("o.dx") * RADIUS).alias("cx"),
        (F.col("py") - F.col("py") % RADIUS + F.col("o.dy") * RADIUS).alias("cy"),
    )
    ring = c_cells.join(s_cells, ["cx", "cy"]).select(
        "c_custkey", "s_suppkey", d2.alias("d2")
    )
    # a ring candidate within RADIUS is provably the true 1-NN ONLY if its
    # distance ≤ RADIUS (anything outside the ring is > RADIUS away)
    ring_best = argmin(ring.where(F.col("d2") <= RADIUS * RADIUS))
    # phase 2: brute-force the unmatched remainder (rare at real densities)
    rest = cust.join(ring_best.select("c_custkey"), "c_custkey", "left_anti")
    rest_best = argmin(
        rest.crossJoin(F.broadcast(supp)).select(
            "c_custkey", "s_suppkey", d2.alias("d2")
        )
    )
    return ring_best.unionByName(rest_best)
