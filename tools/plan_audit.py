"""Registry-wide physical-plan property audit (scale-killer sweep).

EXPLAINS.md documents ~60 curated plans; this sweeps EVERY registry query's
initial physical plan at the given sf and flags the structural anti-patterns
that break at 100 TB:

  cartesian      CartesianProduct — an all-pairs blowup
  bnlj_raw_build BroadcastNestedLoopJoin whose IdentityBroadcastMode
                 build side has no bounded-cardinality marker (raw
                 relation replicated into a nested loop)
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
    # 2x2 DiD pivot: CartesianProduct of four 1-row aggregate cells
    "did_estimator_regions": {"cartesian"},
    # deliberate/bounded nested-loop broadcasts the classifier cannot see
    # structurally (audited round 8 by reading each build subtree):
    #   cross_join_small_dims    broadcasts REGION (5-row fixed dim) — the
    #                            small-dim cross exhibit
    #   spatial_nearest_supplier phase-2 kNN fallback broadcasts the
    #                            supplier dim for the ring-unmatched
    #                            remainder (documented in its docstring)
    #   hybrid_rrf_retrieval     broadcasts ONE query vector (vec_id = 0
    #                            unique-key filter -> 1 row)
    #   hard_negative_mining     broadcasts the deterministic 1/37 anchor
    #                            sample (the documented probe set)
    "spatial_nearest_supplier": {"bnlj_raw_build"},
    "hybrid_rrf_retrieval": {"bnlj_raw_build"},
    "hard_negative_mining": {"bnlj_raw_build"},
    # the deliberate PLAIN-window surface exhibit (ntile/percent_rank/
    # cume_dist semantics over one partition, r1 driver-green); its 100 TB
    # twin is the two-phase global_ntile/global_row_number family
    # (operators/windows.py), pinned by tests/test_plan_shapes.py
    "window_ntile_percentiles": {"single_part"},
    # small-dim cross exhibit: also a raw-FileScan broadcast by design
    "cross_join_small_dims": {"cartesian", "bnlj_raw_build"},
}

# BOUNDED-GRAIN single-partition windows: the exchange's input is a
# key-grain AGGREGATE (or driver-built relation) whose cardinality is
# fixed by the key domain, NOT by data volume — calendar days/months,
# histogram bins/deciles/buckets, digit cells, part sizes, bootstrap
# replicates, order statuses, the capped monitored vocabulary. At 100 TB
# these relations stay the same few-hundred-row size, so the serial
# window is O(grain), not O(data). Audited 2026-08-16 (round 8) after
# the detector-direction fix; each verified bounded by reading the plan
# (input = final HashAggregate on the grain key / tiny ExistingRDD).
_BOUNDED_GRAIN_SINGLE_PART = frozenset({
    "anomaly_days_seasonal_mad",        # calendar-day residuals
    "benford_first_digit_audit",        # 9 digit cells
    "bootstrap_ci_revenue_poisson",     # 32 replicate means
    "cumulative_distinct_users_daily",  # calendar-day new-user counts
    "curate_token_budget_allocation",   # per-source rows (few sources)
    "decision_stump_best_split",        # 256 feature bins
    "gbdt_two_round_regression",        # 256 feature bins
    "hierarchy_share_of_parent",        # (region, nation) <= 25 rows
    "isotonic_calibration_pav",         # calibration bins
    "kaplan_meier_ship_latency",        # distinct latency days (bounded domain)
    "lift_curve_deciles",               # 10 deciles
    "pareto_frontier_parts",            # 50 part sizes
    "psi_price_drift",                  # price buckets
    "revenue_mom_growth",               # calendar months
    "rolling_median_weekly_revenue",    # calendar days
    "runs_test_randomness",             # calendar-day sign series
    "share_of_total",                   # 3 order statuses
    "token_length_histogram",           # length buckets
    "vocab_drift_psi",                  # VDRIFT_TOPK+1 = 201 monitored tokens
    "woe_iv_feature_audit",             # 10 WoE buckets
})
for _n in _BOUNDED_GRAIN_SINGLE_PART:
    WHITELIST.setdefault(_n, set()).add("single_part")


# Subtree markers that make a broadcast-nested-loop BUILD side bounded:
# aggregate outputs (cardinality = key domain, the registry's standard
# bounded-grain pattern), driver-built relations, literal ranges, limits,
# and scalar merges. LIMITATION (documented): an aggregate keyed on a
# fact-scaled column (e.g. custkey) also matches — the classifier catches
# the common ACCIDENT (raw relations under a cross/inequality join), not
# every conceivable bad broadcast; no registry site broadcasts a
# fact-keyed aggregate into a nested loop (audited round 8).
_BOUNDED_BUILD_MARKERS = (
    "HashAggregate(keys=",
    "SortAggregate(key=",
    "SortAggregate(keys=",
    "ObjectHashAggregate(keys=",
    "Scan ExistingRDD",
    "LocalTableScan",
    "Range (",
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
    "Exchange SinglePartition",
)


def _depth(line: str) -> int:
    for marker in ("+- ", ":- "):
        k = line.find(marker)
        if k >= 0:
            return k
    return -1  # root / header lines


# Nodes that END the walk down a SinglePartition exchange's child chain:
# aggregates (a final agg here means grain rows, not partial_ merge rows),
# leaf relations, other exchanges, and joins — hitting any of these before
# a ``partial_`` marker means the exchange moves data-volume (or key-grain)
# rows, not per-partition partial-aggregate rows. Anything else (Sort,
# Project, Filter, InputAdapter, Window, ...) is a single-child wrapper the
# walk passes through — the fixed 2-line window this replaces would
# false-positive on exactly those wrappers (ADVICE round 8).
_SINGLE_PART_CHAIN_STOPPERS = (
    "HashAggregate(",
    "SortAggregate(",
    "ObjectHashAggregate(",
    "FileScan",
    "Scan ExistingRDD",
    "LocalTableScan",
    "Range (",
    "ReusedExchange",
    "BroadcastExchange",
    "Exchange ",
    "Join",
    "CartesianProduct",
)


def _single_partition_moves_raw_rows(lines: list[str]) -> bool:
    """True if any ``Exchange SinglePartition`` moves something other than
    per-partition ``partial_*`` aggregate rows.

    Plan toString() prints a CONSUMER above its child exchange, so the
    serial Window/Sort appears ABOVE the exchange and the exchange's INPUT
    below it; a SinglePartition exchange is allowed only as the merge step
    of a scalar aggregate, i.e. its child chain reaches a ``partial_*``
    aggregate. The walk follows the exchange's subtree via _depth (like
    _unbounded_identity_broadcast) rather than a fixed 2-line window, so
    wrappers between the exchange and the partial aggregate (a Sort, an
    InputAdapter) don't false-positive; ``ReusedExchange`` hits are leaf
    references whose following lines belong to a SIBLING subtree, so they
    are skipped and classified where the original exchange appears.
    """
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        if "ReusedExchange" in line:
            continue  # leaf reference — original exchange classified at its site
        d = _depth(line)
        bounded = False
        for nxt in lines[i + 1 :]:
            nd = _depth(nxt)
            if nd == -1 or nd <= d:
                # left the exchange's subtree — a depth -1 line is a root/
                # header (e.g. a printed Subquery section) and can never be
                # inside the subtree, so it terminates the walk too
                # (ADVICE round 9: running past it could find a partial_
                # in an unrelated tree — a false negative)
                break
            if "partial_" in nxt:
                bounded = True
                break
            if any(m in nxt for m in _SINGLE_PART_CHAIN_STOPPERS):
                break  # raw/grain rows funneled through one partition
        if not bounded:
            return True
    return False


def _unbounded_identity_broadcast(lines: list[str]) -> bool:
    """True if any IdentityBroadcastMode exchange (the BNLJ build side)
    broadcasts a subtree with no bounded-cardinality marker — i.e. a raw
    relation is being replicated into a nested-loop join."""
    for i, line in enumerate(lines):
        if "BroadcastExchange IdentityBroadcastMode" not in line:
            continue
        if "ReusedExchange" in line:
            continue  # original exchange is classified where it appears
        d = _depth(line)
        subtree: list[str] = []
        for nxt in lines[i + 1 :]:
            nd = _depth(nxt)
            if nd == -1 or nd <= d:
                break  # root/header lines also end the subtree (ADVICE r9)
            subtree.append(nxt)
        body = "\n".join(subtree)
        if not any(m in body for m in _BOUNDED_BUILD_MARKERS):
            return True
    return False


def flags_of(plan: str) -> set[str]:
    out = set()
    if "CartesianProduct" in plan:
        out.add("cartesian")
    # BNLJ itself is fine when the build side is bounded (1-row
    # normalizers, bin/calendar aggregates, literal artifacts); the
    # anti-pattern is a RAW relation on the broadcast side.
    if "BroadcastNestedLoopJoin" in plan and _unbounded_identity_broadcast(
        plan.splitlines()
    ):
        out.add("bnlj_raw_build")
    # A SinglePartition exchange is allowed ONLY as the merge step of a
    # scalar aggregate — anything else funnels raw rows through one
    # partition for a global serial stage (Window/Sort/limit over data),
    # exactly the anti-pattern the two-phase family exists to avoid.
    # Classified by the exchange's INPUT subtree (see helper docstring).
    if _single_partition_moves_raw_rows(plan.splitlines()):
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
    hit_names: set[str] = set()
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
        if hits:
            hit_names.add(name)
        for h in hits:
            counts[h] = counts.get(h, 0) + 1
        unexpected = hits - WHITELIST.get(name, set())
        if unexpected:
            print(f"  FLAG {name}: {sorted(unexpected)}")
            bad += 1
        elif hits:
            print(f"  ok(whitelisted) {name}: {sorted(hits)}")
    if not only:
        # Informational: whitelisted names whose plan no longer flags at
        # this sf — either the plan improved (retire the entry) or it only
        # exhibits the pattern at another sf (e.g. a broadcast threshold
        # crossing); never an error, but drift should be visible.
        stale = sorted(set(WHITELIST) - hit_names - {n for n in WHITELIST if n not in specs})
        if stale:
            print(f"  note: whitelisted but not flagged at this sf: {stale}")
    print(f"{len(specs)} queries audited; pattern counts {counts}; "
          f"non-whitelisted: {bad}")
    spark.stop()
    return bad


if __name__ == "__main__":
    raise SystemExit(main())
