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


# ---------------------------------------------------------------------------
# DBSCAN point classification — core / border / noise by eps-neighborhoods
# ---------------------------------------------------------------------------

DBSCAN_EPS = 30_000
DBSCAN_MIN_PTS = 4  # neighborhood size INCLUDING the point itself
_DB_E2 = DBSCAN_EPS * DBSCAN_EPS


@register(
    "dbscan_core_border_noise",
    category="spatial",
    doc=f"DBSCAN density classification (eps={DBSCAN_EPS}, minPts="
    f"{DBSCAN_MIN_PTS}) of the md5-derived customer points: core = "
    ">= minPts points (incl. self) within eps, border = non-core with a "
    "core neighbor, noise = the rest. SCALE SHAPE: the eps-pair relation "
    "comes from the SAME lossless grid-cell candidate join as "
    "spatial_radius_join (cell side = eps, 3x3 neighborhood equi-join — "
    "never the quadratic self-join; that is the oracle's job), is "
    "checkpointed once, and feeds BOTH the neighbor count and the "
    "core-neighbor existence check. All geometry in exact int64; emits "
    "the per-class census.",
    oracle=f"""
WITH pts AS (
  SELECT c_custkey AS k,
         {_oracle_coord('dbx|', 'c_custkey')} AS x,
         {_oracle_coord('dby|', 'c_custkey')} AS y
  FROM customer
),
pairs AS (
  SELECT a.k AS ka, b.k AS kb
  FROM pts a JOIN pts b
    ON a.k <> b.k
   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_DB_E2}
),
nbrs AS (
  SELECT p.k, 1 + COALESCE(cnt, 0) AS n_nbrs
  FROM pts p LEFT JOIN (SELECT ka, COUNT(*) AS cnt FROM pairs GROUP BY ka) c
    ON c.ka = p.k
),
flag AS (
  SELECT k, n_nbrs, n_nbrs >= {DBSCAN_MIN_PTS} AS is_core FROM nbrs
),
cls AS (
  SELECT f.k, f.n_nbrs,
         CASE WHEN f.is_core THEN 'core'
              WHEN EXISTS (SELECT 1 FROM pairs p JOIN flag g ON g.k = p.kb
                           WHERE p.ka = f.k AND g.is_core) THEN 'border'
              ELSE 'noise' END AS cls
  FROM flag f
)
SELECT cls AS point_class,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(MIN(n_nbrs) AS BIGINT) AS min_neighbors,
       CAST(MAX(n_nbrs) AS BIGINT) AS max_neighbors
FROM cls GROUP BY cls
""",
)
def dbscan_core_border_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = F.col
    pts = table(spark, sf_dir, "customer").select(
        c("c_custkey").alias("k"),
        _coord("dbx|", c("c_custkey")).alias("x"),
        _coord("dby|", c("c_custkey")).alias("y"),
    )
    t = pts.select(
        c("k").alias("kb"),
        c("x").alias("bx"),
        c("y").alias("by"),
        (c("x") - c("x") % DBSCAN_EPS).alias("cx"),
        (c("y") - c("y") % DBSCAN_EPS).alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    p = pts.select(
        c("k").alias("ka"),
        c("x").alias("ax"),
        c("y").alias("ay"),
        F.explode(offsets).alias("o"),
    ).select(
        "ka",
        "ax",
        "ay",
        (c("ax") - c("ax") % DBSCAN_EPS + c("o.dx") * DBSCAN_EPS).alias("cx"),
        (c("ay") - c("ay") % DBSCAN_EPS + c("o.dy") * DBSCAN_EPS).alias("cy"),
    )
    d2 = (c("ax") - c("bx")) * (c("ax") - c("bx")) + (c("ay") - c("by")) * (
        c("ay") - c("by")
    )
    pairs = (
        p.join(t, ["cx", "cy"])
        .where((c("ka") != c("kb")) & (d2 <= _DB_E2))
        .select("ka", "kb")
        .localCheckpoint()  # feeds neighbor counts AND core-neighbor check
    )
    nbrs = pts.join(
        pairs.groupBy("ka").agg(F.count(F.lit(1)).alias("cnt")),
        pts.k == c("ka"),
        "left",
    ).select("k", (F.coalesce(c("cnt"), F.lit(0)) + 1).alias("n_nbrs"))
    flag = nbrs.withColumn("is_core", c("n_nbrs") >= DBSCAN_MIN_PTS)
    has_core = (
        pairs.join(
            flag.select(c("k").alias("kb"), c("is_core").alias("core_b")), "kb"
        )
        .groupBy("ka")
        .agg(F.max("core_b").alias("has_core_nbr"))
    )
    cls = flag.join(has_core, flag.k == has_core.ka, "left").select(
        flag.k,
        "n_nbrs",
        F.when(c("is_core"), F.lit("core"))
        .when(F.coalesce(c("has_core_nbr"), F.lit(False)), F.lit("border"))
        .otherwise(F.lit("noise"))
        .alias("point_class"),
    )
    return cls.groupBy("point_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.min("n_nbrs").cast("bigint").alias("min_neighbors"),
        F.max("n_nbrs").cast("bigint").alias("max_neighbors"),
    )
