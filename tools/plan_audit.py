"""Registry-wide physical-plan property audit (scale-killer sweep).

EXPLAINS.md documents ~60 curated plans; this sweeps EVERY registry query's
initial physical plan at the given sf and flags the structural anti-patterns
that break at 100 TB:

  cartesian      CartesianProduct / BroadcastNestedLoopJoin without a
                 bounded build side is an all-pairs blowup
  single_part    a SinglePartition Exchange feeding a Window/Sort (global
                 serial stage) — the two-phase family exists to avoid this
  py_row_udf     BatchEvalPython = row-at-a-time Python in the plan
                 (ArrowEvalPython / mapInPandas are the sanctioned tiers)

Flags are EXPECTED for a known, documented set (the tier exhibits and
bounded normalizer crossJoins); the audit prints every hit so a NEW one —
an accidental regression — stands out against the whitelist. Exit code =
number of non-whitelisted hits.

Usage: python tools/plan_audit.py [sf_dir]   (default /root/testdata/sf0.001)

Capturing executedPlan() does not run the job (AQE re-plans at runtime);
streaming/sink queries that must execute to build their relation do run,
at sf0.001 that is cheap.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

# Documented, by-design hits (see PERFORMANCE.md / query docstrings):
# value = substring of the reason recorded where the pattern is priced.
WHITELIST = {
    # the deliberate row-at-a-time tier exhibit, beside its Arrow twin
    "python_udf_row_at_a_time": {"py_row_udf"},
    # Spark UDTFs always plan as BatchEvalPythonUDTF — the tier exhibit
    "udtf_expand_installments": {"py_row_udf"},
    # bounded crossJoins: 1-row max/total normalizers, centroid/band
    # relations, literal model artifacts — all O(1) or dim-bounded sides
    "hits_hubs_authorities": {"cartesian"},
    "ktruss_cosupply_peel": {"cartesian"},
    "chi_square_independence": {"cartesian"},
    "band_join_price_buckets": {"cartesian"},
    "cross_join_small_dims": {"cartesian"},
    # 2x2 DiD pivot: CartesianProduct of four 1-row aggregate cells
    "did_estimator_regions": {"cartesian"},
}


def flags_of(plan: str) -> set[str]:
    out = set()
    if "CartesianProduct" in plan:
        out.add("cartesian")
    # the Sort/Window OPERATOR after a 1-partition exchange is a global
    # serial stage; "SortAggregate" after one is just a scalar partial-agg
    # merge (the allowed class in tests/test_plan_shapes.py) — match the
    # operator spellings `Sort [` / `Window [` only
    if re.search(r"Exchange SinglePartition[^\n]*\n[^\n]*(Window \[|Sort \[)", plan):
        out.add("single_part")
    if "BatchEvalPython" in plan:
        out.add("py_row_udf")
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from wheels_in_motion_analytics_spark.registry import load_all_queries

    specs = load_all_queries()
    only = [s for s in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if s]
    bad = 0
    counts: dict[str, int] = {}
    for name, spec in specs.items():
        if only and name not in only:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — audit must visit every query
            print(f"  ERR {name}: {type(exc).__name__}: {exc}")
            bad += 1
            continue
        hits = flags_of(plan)
        for h in hits:
            counts[h] = counts.get(h, 0) + 1
        unexpected = hits - WHITELIST.get(name, set())
        if unexpected:
            print(f"  FLAG {name}: {sorted(unexpected)}")
            bad += 1
        elif hits:
            print(f"  ok(whitelisted) {name}: {sorted(hits)}")
    print(f"{len(specs)} queries audited; pattern counts {counts}; "
          f"non-whitelisted: {bad}")
    spark.stop()
    return bad


if __name__ == "__main__":
    raise SystemExit(main())
