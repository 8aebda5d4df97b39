"""Measured scale-up study for the ML block: the histogram-pass trainers
(decision stump, PR curve) and the two-phase-rank AUC on an orders table
expanded past the reference's entire multi-year load.

Default 800× sf0.1 orders = 120.2M rows (> the reference's 113.9M-row
2021-2025 ELT envelope, BASELINE.md). Prices are RE-SPACED on expansion
(cents*SCALE + rep) so the distinct-score relation scales with the data —
the AUC rank machinery gets genuinely harder, not just wider; the
histogram ops stay O(scan) by construction and the probe proves it.

  stump_histogram   256-bin agg + integer-Gini split argmax (full op)
  pr_curve          10-bin agg + 9 suffix-sum curve points (full op)
  auc_two_phase     tie-corrected rank AUC over ~120M distinct scores

Each probe is a noop write (full materialization, no sink I/O). Results
live in PERFORMANCE.md ("Round-5 session-3 scale-up study"). Run:

  SPARK_GRAFT_DRIVER_MEM=32g python tools/scale_probe_ml.py [SCALE]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import Window

from wheels_in_motion_analytics_spark.session import get_session

STUMP_BINS = 256
PR_BINS = 10


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = os.environ.get("SCALE_DIR", "/tmp/scale_orders")
    spark = get_session("scale-probe-ml", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    base_rows = o.count()
    t0 = time.perf_counter()
    (
        o.select("o_orderkey", "o_totalprice", "o_orderstatus")
        .repartition(64)  # fan-out must run post-exchange, not in scan splits
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(scale - 1))))
        .select(
            (
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
                * scale
                + F.col("rep")
            ).alias("cents"),
            (F.col("o_orderstatus") == "F").cast("int").alias("pos"),
        )
        .write.mode("overwrite")
        .parquet(out)
    )
    expand_s = time.perf_counter() - t0
    src = spark.read.parquet(out)
    n_rows = src.count()
    # warm the page cache so probes measure compute, not cold I/O
    src.write.mode("overwrite").format("noop").save()

    results = {
        "base_rows": base_rows,
        "scale": scale,
        "rows": n_rows,
        "expand_s": round(expand_s, 1),
    }

    def probe(name: str, build) -> None:
        times = []
        for _ in range(3):
            t = time.perf_counter()
            build().write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t)
        best = min(times)
        results[name] = {
            "best_s": round(best, 2),
            "rows_per_s": int(n_rows / best),
        }
        print(name, results[name], flush=True)

    def stump():
        mm = src.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
        hist = (
            src.crossJoin(F.broadcast(mm))
            .groupBy(
                F.expr(f"(cents - lo) * {STUMP_BINS} DIV (hi - lo + 1)").alias("bin")
            )
            .agg(F.count(F.lit(1)).alias("n"), F.sum("pos").alias("p"))
        )
        w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        wall = Window.orderBy("bin").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        cum = hist.select(
            "bin",
            F.sum("n").over(w).cast("decimal(38,0)").alias("nl"),
            F.sum("p").over(w).cast("decimal(38,0)").alias("pl"),
            F.sum("n").over(wall).cast("decimal(38,0)").alias("nt"),
            F.sum("p").over(wall).cast("decimal(38,0)").alias("pt"),
        )
        scored = cum.where(
            (F.col("nl") > 0) & (F.col("nt") - F.col("nl") > 0)
        ).select(
            "bin",
            F.expr(
                "((pl*pl + (nl-pl)*(nl-pl)) * (nt-nl)"
                " + ((pt-pl)*(pt-pl) + ((nt-nl)-(pt-pl))*((nt-nl)-(pt-pl))) * nl)"
                " * 1000000 DIV (nl * (nt - nl))"
            ).alias("score"),
        )
        return scored.withColumn(
            "__rn", F.row_number().over(Window.orderBy(F.desc("score"), F.asc("bin")))
        ).where(F.col("__rn") == 1)

    def pr_curve():
        mm = src.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
        hist = (
            src.crossJoin(F.broadcast(mm))
            .groupBy(
                F.expr(f"(cents - lo) * {PR_BINS} DIV (hi - lo + 1)").alias("bin")
            )
            .agg(
                F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
                F.sum("pos").cast("decimal(38,0)").alias("p"),
            )
        )
        thresholds = spark.range(1, PR_BINS).select(F.col("id").alias("t"))
        return (
            F.broadcast(thresholds)
            .join(hist, F.col("bin") >= F.col("t"))
            .groupBy("t")
            .agg(F.sum("p").alias("tp"), F.sum(F.col("n") - F.col("p")).alias("fp"))
        )

    def auc():
        from wheels_in_motion_analytics_spark.operators.windows import (
            global_prefix_sums,
        )

        vals = src.groupBy(F.col("cents").alias("v")).agg(
            F.count(F.lit(1)).alias("n_tot"), F.sum("pos").alias("n1v")
        )
        cum = global_prefix_sums(vals, ["v"], ["n_tot"]).select(
            "n_tot",
            "n1v",
            (F.col("n_tot_cum") - F.col("n_tot")).alias("cum_before"),
        )
        return cum.agg(
            F.sum("n1v").cast("decimal(38,0)").alias("n1"),
            F.sum("n_tot").cast("decimal(38,0)").alias("n"),
            F.sum(F.col("n1v") * (2 * F.col("cum_before") + F.col("n_tot") + 1))
            .cast("decimal(38,0)")
            .alias("r1_x2"),
        )

    probe("stump_histogram", stump)
    probe("pr_curve", pr_curve)
    probe("auc_two_phase", auc)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
