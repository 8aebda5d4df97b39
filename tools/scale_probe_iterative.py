"""sf1-scale probe of the round-6 ITERATIVE ops (r6 verdict item 5).

The fixpoint ops are the ones whose cost model has a data-dependent knob —
the number of rounds — so "green at sf0.1" does not by itself prove the
round budgets hold at sf1. This probe materializes sf1-sized inputs from
the sf0.1 fixtures and measures rounds-to-fixpoint and wall time for:

  ktruss_cosupply_peel        rounds + time, on TWO 10x lineitem expansions
  hits_hubs_authorities       time (round count is a fixed constant)
  dedup_cluster_representatives  time + CC convergence on a 10x corpus

Expansions (written once under /tmp/sf1probe*):

* ``copies`` — l_partkey/l_suppkey re-spaced per replica (p + rep*20000,
  s + rep*1000): ten node-disjoint copies of the sf0.1 co-supply graph.
  This is the sf1 SHAPE (TPC-H per-node degree is sf-invariant; node count
  grows linearly), so per-component structure — and hence the fixpoint
  round count — is preserved by construction while all relation sizes,
  shuffle volumes, and per-round checkpoint state grow 10x.
* ``mix`` — parts re-spaced but the SAME 1000 suppliers re-used with a
  per-replica rotation ((s + rep*137) % 1000): ten part-disjoint edge sets
  superposed on one supplier set. Support counts add across replicas —
  a denser-than-sf1 adversarial instance bounding the other direction.
* documents 10x with the corpus_scale variant semantics (rep%4 marker
  suffixes): every near-dup cluster gains 10x members, so the exact
  shingle-join pair space on dup clusters grows ~100x — the stress case
  for the CC + representative pick.

Not part of bench.py (runtime is minutes). Results live in PERFORMANCE.md
("Round-7 sf1 probe of the iterative ops"). Run:

  SPARK_GRAFT_DRIVER_MEM=32g python tools/scale_probe_iterative.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.session import get_session
from wheels_in_motion_analytics_spark.functions import graph as G
from wheels_in_motion_analytics_spark.functions.similarity import (
    dedup_cluster_representatives,
)
from wheels_in_motion_analytics_spark.functions.graph import (
    hits_hubs_authorities,
    oriented_triangles,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/sf1probe"
FACTOR = 10


def build_inputs(spark) -> None:
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    reps = spark.range(FACTOR).withColumnRenamed("id", "rep")
    for variant, out in (("copies", ROOT), ("mix", ROOT + "_mix")):
        if os.path.exists(os.path.join(out, "lineitem.parquet")):
            continue
        expanded = li.crossJoin(reps)
        if variant == "copies":
            expanded = expanded.withColumn(
                "l_suppkey", F.col("l_suppkey") + F.col("rep") * 1000
            )
        else:
            expanded = expanded.withColumn(
                "l_suppkey", (F.col("l_suppkey") + F.col("rep") * 137) % 1000
            )
        expanded = (
            expanded.withColumn("l_partkey", F.col("l_partkey") + F.col("rep") * 20000)
            .drop("rep")
            # spread the fan-out across tasks before the write (NOTES: a
            # crossJoin after one small scan otherwise lands on few tasks)
            .repartition(32)
        )
        expanded.write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))
    docs_out = os.path.join(ROOT, "documents.parquet")
    if not os.path.exists(docs_out):
        d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        expanded = (
            d.crossJoin(reps)
            .select(
                (F.col("doc_id") * FACTOR + F.col("rep")).alias("doc_id"),
                F.when(F.col("rep") % 4 == 0, F.col("text"))
                .otherwise(
                    F.concat(
                        F.col("text"),
                        F.lit(" variant marker "),
                        (F.col("rep") % 4).cast("string"),
                    )
                )
                .alias("text"),
                "lang",
                "source",
            )
            .withColumn("n_chars", F.length("text").cast("long"))
            .repartition(32)
        )
        expanded.write.mode("overwrite").parquet(docs_out)


def ktruss_rounds(spark, sf_dir: str) -> dict:
    """Replay ktruss_cosupply_peel's loop, counting rounds to fixpoint."""
    c = F.col
    from wheels_in_motion_analytics_spark.tables import table

    links = (
        table(spark, sf_dir, "lineitem")
        .where(c("l_quantity") >= G.KTRUSS_MIN_QTY)
        .select(c("l_partkey").alias("p"), c("l_suppkey").alias("s"))
        .distinct()
    )
    a = links.select("p", c("s").alias("s1"))
    b = links.select("p", c("s").alias("s2"))
    e = (
        a.join(b, "p")
        .where(c("s1") < c("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(c("shared") >= G.KTRUSS_MIN_SHARED)
        .select("s1", "s2")
        .localCheckpoint()
    )
    n_prev, rounds, converged = e.count(), 0, False
    n0 = n_prev
    while rounds < G.KTRUSS_ROUNDS:
        tri = oriented_triangles(e).localCheckpoint()
        pairs = (
            tri.select(F.least("a", "b").alias("s1"), F.greatest("a", "b").alias("s2"))
            .unionAll(
                tri.select(F.least("a", "c").alias("s1"), F.greatest("a", "c").alias("s2"))
            )
            .unionAll(
                tri.select(F.least("b", "c").alias("s1"), F.greatest("b", "c").alias("s2"))
            )
        )
        sp = pairs.groupBy("s1", "s2").agg(F.count(F.lit(1)).alias("supp"))
        e = (
            e.join(sp, ["s1", "s2"], "left")
            .where(F.coalesce(c("supp"), F.lit(0)) >= G.KTRUSS_K - 2)
            .select("s1", "s2")
            .localCheckpoint()
        )
        rounds += 1
        n_now = e.count()
        if n_now == n_prev:
            converged = True
            break
        n_prev = n_now
    return {
        "edges_initial": n0,
        "edges_final": n_prev,
        "rounds": rounds,
        "converged": converged,
        "budget": G.KTRUSS_ROUNDS,
    }


def main() -> None:
    spark = get_session("sf1-iterative-probe", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    build_inputs(spark)
    results = {}

    for tag, d in (("ktruss_copies10x", ROOT), ("ktruss_mix10x", ROOT + "_mix")):
        t0 = time.perf_counter()
        results[tag] = ktruss_rounds(spark, d)
        results[tag]["sec"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    hits_hubs_authorities(spark, ROOT).write.mode("overwrite").format("noop").save()
    results["hits_copies10x"] = {
        "sec": round(time.perf_counter() - t0, 1),
        "rounds": G.HITS_ROUNDS,
    }

    t0 = time.perf_counter()
    reps = dedup_cluster_representatives(spark, ROOT)
    agg = reps.agg(
        F.count(F.lit(1)).alias("clusters"), F.sum("n_members").alias("docs")
    ).collect()[0]
    results["cluster_reps_docs10x"] = {
        "sec": round(time.perf_counter() - t0, 1),
        "clusters": agg["clusters"],
        "docs": agg["docs"],
    }

    print(json.dumps(results, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
