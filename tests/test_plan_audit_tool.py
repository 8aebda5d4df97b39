"""Pin the plan-audit detector's direction (no Spark session needed).

Plan toString() prints a CONSUMER above its child exchange, so the serial
Window/Sort fed by an ``Exchange SinglePartition`` appears on the lines
ABOVE it, and the exchange's INPUT on the lines below. The round-8 fix
made ``tools/plan_audit.py:flags_of`` classify by the INPUT (mirroring
tests/test_plan_shapes.py): a SinglePartition exchange is allowed only
when it moves per-partition ``partial_*`` aggregate rows. These synthetic
plan snippets pin that orientation so the detector can't silently revert
to scanning the wrong side again.
"""

from __future__ import annotations

import importlib.util
import os

_TOOL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "plan_audit.py")
_spec = importlib.util.spec_from_file_location("plan_audit_tool", _TOOL)
plan_audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(plan_audit)
flags_of = plan_audit.flags_of


SERIAL_WINDOW_PLAN = """\
AdaptiveSparkPlan isFinalPlan=false
+- Project [day#1, total#2L]
   +- Window [sum(x#3L) windowspecdefinition(day#1 ASC NULLS FIRST, ...)]
      +- Sort [day#1 ASC NULLS FIRST], false, 0
         +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
            +- Project [day#1, x#3L]
               +- FileScan parquet [day#1,x#3L]
"""

SCALAR_MERGE_PLAN = """\
AdaptiveSparkPlan isFinalPlan=false
+- HashAggregate(keys=[], functions=[sum(x#3L)], output=[total#2L])
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
      +- HashAggregate(keys=[], functions=[partial_sum(x#3L)], output=[sum#9L])
         +- FileScan parquet [x#3L]
"""

SORT_AGG_MERGE_PLAN = """\
AdaptiveSparkPlan isFinalPlan=false
+- ObjectHashAggregate(keys=[], functions=[collect_list(x#3L, 0, 0)])
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
      +- ObjectHashAggregate(keys=[], functions=[partial_collect_list(x#3L, 0, 0)])
         +- FileScan parquet [x#3L]
"""


def test_serial_window_over_raw_rows_is_flagged():
    # The exact shape the old below-scanning detector could never see:
    # the Window/Sort consumers print ABOVE the exchange, the raw-row
    # input below it.
    assert "single_part" in flags_of(SERIAL_WINDOW_PLAN)


def test_scalar_partial_agg_merge_is_allowed():
    assert "single_part" not in flags_of(SCALAR_MERGE_PLAN)


def test_object_hash_partial_merge_is_allowed():
    assert "single_part" not in flags_of(SORT_AGG_MERGE_PLAN)


SORT_WRAPPED_MERGE_PLAN = """\
AdaptiveSparkPlan isFinalPlan=false
+- SortAggregate(key=[], functions=[percentile(x#3L, 0.5, 1, 0, 0)])
   +- Sort [x#3L ASC NULLS FIRST], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
         +- Sort [x#3L ASC NULLS FIRST], false, 0
            +- SortAggregate(key=[], functions=[partial_percentile(x#3L, 0.5, 1, 0, 0)])
               +- FileScan parquet [x#3L]
"""

REUSED_SINGLE_PART_PLAN = """\
AdaptiveSparkPlan isFinalPlan=false
+- BroadcastHashJoin [k#1], [k#5], Inner, BuildRight
   :- HashAggregate(keys=[], functions=[sum(x#3L)], output=[total#2L])
   :  +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
   :     +- HashAggregate(keys=[], functions=[partial_sum(x#3L)], output=[sum#9L])
   :        +- FileScan parquet [x#3L]
   +- BroadcastExchange HashedRelationBroadcastMode, [plan_id=2]
      +- ReusedExchange [total#7L], Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
"""

WRAPPED_RAW_SINGLE_PART_PLAN = """\
AdaptiveSparkPlan isFinalPlan=false
+- Window [row_number() windowspecdefinition(x#3L ASC NULLS FIRST, ...)]
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
      +- Sort [x#3L ASC NULLS FIRST], false, 0
         +- Project [x#3L]
            +- FileScan parquet [x#3L]
"""


def test_sort_wrapper_between_exchange_and_partial_is_allowed():
    # ADVICE round 8: the fixed 2-line window false-positived when a Sort
    # (or any wrapper) sat between the SinglePartition exchange and the
    # partial aggregate — the subtree walk must pass through it.
    assert "single_part" not in flags_of(SORT_WRAPPED_MERGE_PLAN)


def test_reused_single_partition_exchange_is_skipped():
    # ADVICE round 8: a ReusedExchange line mentioning 'Exchange
    # SinglePartition' is a LEAF — the lines below it belong to a sibling
    # subtree, so it must not be classified (the original exchange is).
    assert "single_part" not in flags_of(REUSED_SINGLE_PART_PLAN)


def test_wrapped_raw_rows_through_single_partition_still_flagged():
    # the subtree walk must not turn into 'partial_ anywhere below' — a
    # Sort+Project chain bottoming out at a raw scan is still the serial
    # global stage the detector exists for.
    assert "single_part" in flags_of(WRAPPED_RAW_SINGLE_PART_PLAN)


def test_grain_aggregate_input_still_flagged():
    # a FINAL (non-partial) aggregate feeding the exchange means key-grain
    # rows through one partition — flagged, then whitelisted per-name in
    # _BOUNDED_GRAIN_SINGLE_PART; the walk must stop at the aggregate
    # rather than find a partial_ deeper in ITS subtree.
    plan = """\
AdaptiveSparkPlan isFinalPlan=false
+- Window [sum(total#2L) windowspecdefinition(day#1 ASC NULLS FIRST, ...)]
   +- Sort [day#1 ASC NULLS FIRST], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=2]
         +- HashAggregate(keys=[day#1], functions=[sum(x#3L)], output=[total#2L])
            +- Exchange hashpartitioning(day#1, 32), ENSURE_REQUIREMENTS, [plan_id=1]
               +- HashAggregate(keys=[day#1], functions=[partial_sum(x#3L)], output=[sum#9L])
                  +- FileScan parquet [day#1,x#3L]
"""
    assert "single_part" in flags_of(plan)


def test_cartesian_and_py_udf_flags_still_fire():
    plan = "CartesianProduct\n+- BatchEvalPython [f(x#1)]\n   +- Scan"
    assert flags_of(plan) == {"cartesian", "py_row_udf"}


BNLJ_BOUNDED_PLAN = """\
AdaptiveSparkPlan isFinalPlan=false
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- FileScan parquet [x#1L]
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=1]
      +- HashAggregate(keys=[], functions=[sum(x#1L)], output=[total#2L])
         +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=0]
            +- HashAggregate(keys=[], functions=[partial_sum(x#1L)], output=[sum#9L])
"""

BNLJ_RAW_BUILD_PLAN = """\
AdaptiveSparkPlan isFinalPlan=false
+- BroadcastNestedLoopJoin BuildRight, Inner, (a#1 < b#2)
   :- FileScan parquet [a#1]
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=1]
      +- Project [b#2]
         +- Filter isnotnull(b#2)
            +- FileScan parquet [b#2]
"""


def test_bnlj_with_bounded_build_is_allowed():
    # scalar-aggregate build side (the 1-row normalizer crossJoin pattern)
    assert "bnlj_raw_build" not in flags_of(BNLJ_BOUNDED_PLAN)


def test_bnlj_with_raw_scan_build_is_flagged():
    # a raw relation replicated into a nested loop — the accident the
    # docstring always claimed to catch and the detector now actually does
    assert "bnlj_raw_build" in flags_of(BNLJ_RAW_BUILD_PLAN)


def test_whitelist_covers_only_documented_pattern():
    # every bounded-grain whitelist entry must whitelist single_part ONLY —
    # a cartesian/py_row_udf regression in those queries must still flag.
    for name in plan_audit._BOUNDED_GRAIN_SINGLE_PART:
        assert plan_audit.WHITELIST[name] == {"single_part"}, name
