"""Benchmark runner: every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full computation on
executors, zero driver collect) — the honest way to time a distributed plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wheels_in_motion_analytics_spark.registry import load_all_queries
from wheels_in_motion_analytics_spark.session import get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session("wheels-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all_queries()

    # Warm the JVM/codegen once so per-query numbers measure the plan, not
    # session startup.
    specs["count_total"].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    # ... and the Python/Arrow worker pool, so the alphabetically-first
    # mapInPandas query isn't charged several seconds of worker spawn.
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: (pdf for pdf in it), "x int"
    ).write.mode("overwrite").format("noop").save()

    def release_blocks() -> None:
        """Drop localCheckpoint/cache blocks left by the previous query.

        Checkpoint-heavy queries leave persisted RDD blocks behind; across
        244 queries in one JVM they accumulate into enough memory pressure
        that late-alphabet queries measure 3-6x slower than in a fresh
        session. Safe here because every timing iteration rebuilds its
        DataFrame from scratch — nothing persists across fn() calls.
        """
        import gc

        gc.collect()  # release py4j-held JVM refs first
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in list(jmap.values()):
            jrdd.unpersist(False)

    # min over passes: steady-state per-query cost, robust to GC/JIT noise
    # from neighboring queries in the same JVM. TIME-BOXED: the first full
    # pass always completes (every query gets a number), then extra
    # min-passes run only while the wall budget allows — so a larger
    # registry can never push the run past an external timeout and lose
    # the whole benchmark, it just degrades toward min-of-1.
    max_iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "420"))
    bench_start = time.monotonic()
    timings: dict[str, float] = {}
    for it in range(max_iters):
        for name in sorted(specs):
            # pass 1 always completes; re-measure passes stop mid-pass the
            # moment the budget runs out (those queries keep their pass-1
            # number — min-of-k degrades gracefully, never truncates output)
            if it > 0 and time.monotonic() - bench_start > budget_s:
                break
            release_blocks()
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            timings[name] = round(min(timings.get(name, dt), dt), 3)

    # The driver captures only a bounded tail of stdout; a 105-query JSON
    # line (~5KB) gets truncated mid-line and fails to parse (BENCH_r01).
    # Print ONE compact line: total over all queries + a headline subset.
    # Full per-query timings go to BENCH_FULL.json next to this script.
    headline = [
        "flagship_rides_by_dim",
        "star_join_enriched",
        "regional_market_share",
        "top_unshipped_orders",
        "dedup_minhash_lsh",
        "scaled_dedup_minhash_lsh",
        "scaled_dedup_exact",
        "scaled_ann_lsh",
        "dedup_connected_components",
        "similarity_topk_bruteforce",
        "ann_lsh_bucketed",
        "corpus_quality_pipeline",
        "local_supplier_volume",
        "lm_bigram_perplexity",
        "embedding_random_projection",
        "percentile_exact",
        "salted_skew_join",
        "asof_join_last_signup",
        "window_running_sum",
        "stream_tumbling_window",
    ]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "total_query_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "n_queries": len(timings),
        "queries": timings,
        "sf": sf_val,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"), "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
    compact = dict(full)
    compact["queries"] = {q: timings[q] for q in headline if q in timings}
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
