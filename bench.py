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

    # min over iterations: steady-state per-query cost, robust to GC/JIT
    # noise from neighboring queries in the same JVM.
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2"))
    timings: dict[str, float] = {}
    for name in sorted(specs):
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
