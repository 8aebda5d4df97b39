"""Physical-plan audits: the scale-critical plan properties asserted as
tests, so a regression in join strategy / pushdown / codegen is caught the
same way a wrong result is. (The `.explain('formatted')` loop, mechanized.)"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from wheels_in_motion_analytics_spark.registry import load_all_queries

SPECS = load_all_queries()


def plan_of(spark, name: str) -> str:
    return SPECS[name].fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()


def test_star_join_all_broadcast(spark):
    """Every dim join in the star must be a broadcast hash join — a
    SortMergeJoin here would shuffle the fact table once per dim."""
    plan = plan_of(spark, "star_join_enriched")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_scan_projection_pushdown(spark):
    """Column pruning must reach the parquet scan: reading 2 columns of an
    11-column table must not materialize the rest."""
    df = SPECS["scan_parquet_project"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema  # pruned
    assert "PushedFilters: [" in plan  # predicate reached the scan


def test_filter_pushdown_to_scan(spark):
    plan = plan_of(spark, "filter_null_predicate")
    assert "PushedFilters" in plan
    # the discount range predicate must appear among pushed filters
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "l_discount" in pushed


def test_aggregate_is_partial_final(spark):
    """groupBy compiles to partial (map-side) + final hash aggregate — the
    shape whose shuffle is O(|groups|), not O(|rows|)."""
    plan = plan_of(spark, "agg_stats_suite")
    assert plan.count("HashAggregate") >= 2


def test_band_join_broadcasts_tiny_side(spark):
    """The inequality-only band join must broadcast the 3-row band table,
    never shuffle-nested-loop or cartesian-partition the big side."""
    plan = plan_of(spark, "band_join_price_buckets")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_anti_semi_join_broadcast(spark):
    for name in ("anti_join_new_keys", "semi_join_active_keys"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert ("LeftAnti" in plan) or ("LeftSemi" in plan), name


def test_asof_join_single_shuffle_no_range_explosion(spark):
    """The as-of join must be window-based: exactly one exchange on the key,
    no join-operator cross product."""
    plan = plan_of(spark, "asof_join_last_signup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_flagship_no_python_in_hot_path(spark):
    """The flagship dashboard query must stay entirely JVM-side."""
    plan = plan_of(spark, "flagship_rides_by_dim")
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


@pytest.mark.parametrize(
    "name",
    [
        "project_rename_cast",
        "string_funcs_suite",
        "math_funcs_suite",
        "text_stats",
    ],
)
def test_scalar_suites_whole_stage_codegen(spark, name):
    """Scalar-function suites are pure narrow plans: no exchange at all and
    fully code-generated."""
    plan = plan_of(spark, name)
    assert "Exchange" not in plan, name
    # whole-stage-codegen stages print as "*(n)" prefixes
    assert "*(1)" in plan, name
