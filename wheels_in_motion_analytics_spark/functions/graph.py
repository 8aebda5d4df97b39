"""Graph analytics as relational plans: PageRank over the part↔supplier
bipartite graph observed in lineitem.

Each PageRank iteration is one join + one aggregate (contributions flow
along edges, sum per target) — the textbook distributed formulation; at
100 TB the edge table shuffles on src/dst and the rank state is
node-cardinality. Iterations are UNROLLED (fixed count) both in the Spark
plan and as chained CTEs in the DuckDB oracle, and every per-node
contribution is quantized to an exact 1e-9 integer grid before summation,
so accumulation order can never flake the cross-engine hash — an
oracle-checked iterative algorithm, not a rows-only one.

(The other iterative op, connected components, lives in
functions/similarity.py with a recursive-CTE oracle; PageRank needs an
aggregate per iteration, which recursive terms don't allow — hence the
unroll.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table

PR_ITERS = 6
PR_DAMPING = 0.85
PR_GRID = 1_000_000_000  # 1e-9 rank quantization
PR_TOPK = 30
_SUPPLIER_OFFSET = 100_000  # node id space: parts as-is, suppliers offset


def _oracle_pagerank() -> str:
    grid = PR_GRID
    steps = []
    for k in range(PR_ITERS):
        steps.append(
            f"""pr{k + 1} AS (
  SELECT e.dst AS node,
         floor(({1 - PR_DAMPING} + {PR_DAMPING} *
                (SUM(CAST(floor(p.rank / o.d * {grid} + 0.5) AS BIGINT))
                 / {grid}.0)) * {grid} + 0.5) / {grid}.0 AS rank
  FROM pr{k} p
  JOIN edges e ON e.src = p.node
  JOIN outdeg o ON o.src = p.node
  GROUP BY e.dst
)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH links AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
edges AS (
  SELECT p AS src, {_SUPPLIER_OFFSET} + s AS dst FROM links
  UNION ALL
  SELECT {_SUPPLIER_OFFSET} + s, p FROM links
),
outdeg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
pr0 AS (SELECT src AS node, 1.0 AS rank FROM edges GROUP BY src),
{chain}
SELECT node, rank FROM pr{PR_ITERS}
ORDER BY rank DESC, node
LIMIT {PR_TOPK}
"""


def pagerank(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Quantized PageRank over a directed (src, dst) edge DataFrame where
    every node has out-degree ≥ 1 (symmetric graphs satisfy this)."""
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # Fold the out-degree INTO the edge table once — otherwise every
    # iteration pays a second join just to fetch d.
    edges_d = edges.join(outdeg, "src").localCheckpoint()
    ranks = edges.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(1.0).alias("rank")
    )
    for i in range(iters):
        contrib_q = F.floor(
            F.col("rank") / F.col("d") * PR_GRID + 0.5
        ).cast("long")
        ranks = (
            ranks.join(edges_d, F.col("node") == F.col("src"))
            .groupBy(F.col("dst").alias("next_node"))
            .agg(
                (
                    F.floor(
                        (
                            (1 - PR_DAMPING)
                            + PR_DAMPING
                            * (F.sum(contrib_q) / F.lit(float(PR_GRID)))
                        )
                        * PR_GRID
                        + 0.5
                    )
                    / F.lit(float(PR_GRID))
                ).alias("rank")
            )
            .select(F.col("next_node").alias("node"), "rank")
        )
        # Cut lineage every other round — unrolled join+agg plans deepen
        # geometrically (same guard as connected_components).
        if i % 2 == 1:
            ranks = ranks.localCheckpoint()
    return ranks


@register(
    "pagerank_part_supplier",
    category="graph",
    doc=f"PageRank ({PR_ITERS} unrolled iterations, d={PR_DAMPING}) over "
    "the symmetric part↔supplier graph from observed lineitem links. "
    "Per-edge contributions quantize to a 1e-9 integer grid before the "
    "per-target sum, so the result is exact under any partitioning and "
    f"fully oracle-checked (chained-CTE unroll in DuckDB). Top {PR_TOPK} "
    "nodes; suppliers offset by 100k in the node id space.",
    oracle=_oracle_pagerank(),
)
def pagerank_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    links = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    fwd = links.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + _SUPPLIER_OFFSET).alias("dst"),
    )
    rev = links.select(
        (F.col("l_suppkey") + _SUPPLIER_OFFSET).alias("src"),
        F.col("l_partkey").alias("dst"),
    )
    # Materialize the edge list once: every iteration joins against it, and
    # without the lineage cut each of the 6 iteration plans would re-run
    # the distinct shuffle (and the union) from scratch.
    edges = fwd.unionByName(rev).localCheckpoint()
    return (
        pagerank(edges)
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(PR_TOPK)
    )
