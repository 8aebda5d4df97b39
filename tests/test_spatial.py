"""Spatial grid join: losslessness vs brute force and plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from wheels_in_motion_analytics_spark.operators import spatial
from wheels_in_motion_analytics_spark.registry import load_all_queries
from wheels_in_motion_analytics_spark.tables import table

SPECS = load_all_queries()


def _points(spark):
    cust = table(spark, SF_SMALL, "customer").select(
        "c_custkey",
        spatial._coord("sx|", F.col("c_custkey")).alias("px"),
        spatial._coord("sy|", F.col("c_custkey")).alias("py"),
    )
    supp = table(spark, SF_SMALL, "supplier").select(
        "s_suppkey",
        spatial._coord("sx|", F.col("s_suppkey") + 9_000_000).alias("sx"),
        spatial._coord("sy|", F.col("s_suppkey") + 9_000_000).alias("sy"),
    )
    return cust, supp


def test_grid_join_is_lossless_vs_bruteforce(spark):
    cust, supp = _points(spark)
    d2 = (F.col("px") - F.col("sx")) * (F.col("px") - F.col("sx")) + (
        F.col("py") - F.col("sy")
    ) * (F.col("py") - F.col("sy"))
    brute = {
        (r.c_custkey, r.s_suppkey, r.dist_sq)
        for r in cust.crossJoin(supp)
        .where(d2 <= spatial._R2)
        .select("c_custkey", "s_suppkey", d2.alias("dist_sq"))
        .collect()
    }
    grid = {
        (r.c_custkey, r.s_suppkey, r.dist_sq)
        for r in SPECS["spatial_radius_join"].fn(spark, SF_SMALL).collect()
    }
    assert grid == brute
    assert grid  # non-degenerate


def test_grid_join_plan_has_no_cartesian_product(spark):
    df = SPECS["spatial_radius_join"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_all_distances_within_radius(spark):
    rows = SPECS["spatial_radius_join"].fn(spark, SF_SMALL).collect()
    assert all(0 <= r.dist_sq <= spatial._R2 for r in rows)
    # each (customer, supplier) pair appears exactly once
    keys = [(r.c_custkey, r.s_suppkey) for r in rows]
    assert len(keys) == len(set(keys))


def test_nearest_supplier_matches_bruteforce(spark):
    cust, supp = _points(spark)
    d2 = (F.col("px") - F.col("sx")) * (F.col("px") - F.col("sx")) + (
        F.col("py") - F.col("sy")
    ) * (F.col("py") - F.col("sy"))
    brute = {}
    for r in (
        cust.crossJoin(supp)
        .select("c_custkey", "s_suppkey", d2.alias("d2"))
        .collect()
    ):
        cur = brute.get(r.c_custkey)
        if cur is None or (r.d2, r.s_suppkey) < cur:
            brute[r.c_custkey] = (r.d2, r.s_suppkey)
    out = {
        r.c_custkey: (r.dist_sq, r.nearest_supplier)
        for r in SPECS["spatial_nearest_supplier"].fn(spark, SF_SMALL).collect()
    }
    assert out == brute


def test_dbscan_python_recompute(spark):
    """Brute-force neighborhood classification must match exactly."""
    from wheels_in_motion_analytics_spark.operators.spatial import (
        DBSCAN_EPS,
        DBSCAN_MIN_PTS,
        _coord,
    )

    rows = {
        r["point_class"]: r
        for r in SPECS["dbscan_core_border_noise"].fn(spark, SF_SMALL).collect()
    }
    pts = [
        (r["k"], r["x"], r["y"])
        for r in table(spark, SF_SMALL, "customer")
        .select(
            F.col("c_custkey").alias("k"),
            _coord("dbx|", F.col("c_custkey")).alias("x"),
            _coord("dby|", F.col("c_custkey")).alias("y"),
        )
        .collect()
    ]
    e2 = DBSCAN_EPS * DBSCAN_EPS
    nbrs, core = {}, {}
    for k, x, y in pts:
        n = sum(1 for k2, x2, y2 in pts if (x - x2) ** 2 + (y - y2) ** 2 <= e2)
        nbrs[k] = n
        core[k] = n >= DBSCAN_MIN_PTS
    cls = {}
    for k, x, y in pts:
        if core[k]:
            cls[k] = "core"
        elif any(
            core[k2]
            for k2, x2, y2 in pts
            if k2 != k and (x - x2) ** 2 + (y - y2) ** 2 <= e2
        ):
            cls[k] = "border"
        else:
            cls[k] = "noise"
    from collections import defaultdict

    agg = defaultdict(list)
    for k, c in cls.items():
        agg[c].append(nbrs[k])
    assert set(rows) == set(agg)
    for c, ns in agg.items():
        assert rows[c]["n_points"] == len(ns)
        assert rows[c]["min_neighbors"] == min(ns)
        assert rows[c]["max_neighbors"] == max(ns)
