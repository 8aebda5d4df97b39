"""Semantic properties of the product-analytics operators (cross-engine
exactness is covered by the differential harness)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from wheels_in_motion_analytics_spark.registry import load_all_queries
from wheels_in_motion_analytics_spark.tables import table

SPECS = load_all_queries()


def test_cohort_age_zero_is_cohort_size_upper_bound(spark):
    rows = SPECS["cohort_retention_matrix"].fn(spark, SF_SMALL).collect()
    by_cohort: dict[int, dict[int, int]] = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_q, {})[r.age_quarters] = r.active_customers
    assert by_cohort
    for cohort, ages in by_cohort.items():
        # every cohort has an age-0 row (the quarter of the first order) and
        # no later age exceeds the cohort's own size
        assert 0 in ages
        assert all(n <= ages[0] for n in ages.values())
        assert all(a >= 0 for a in ages)


def test_basket_lift_bounds_and_pair_orientation(spark):
    rows = SPECS["basket_pair_lift"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.brand_a < r.brand_b
        assert 0.0 < r.conf_a_to_b <= 1.0
        assert r.lift > 0
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_transition_shares_sum_to_one_per_from_state(spark):
    rows = SPECS["event_transition_matrix"].fn(spark, SF_SMALL).collect()
    by_from: dict[str, float] = {}
    total_n = 0
    for r in rows:
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.share_of_from
        total_n += r.n
    for from_type, s in by_from.items():
        assert abs(s - 1.0) < 1e-4, (from_type, s)
    # transitions = events - one per user with ≥1 event
    n_events = table(spark, SF_SMALL, "events").count()
    n_users = table(spark, SF_SMALL, "events").select("user_id").distinct().count()
    assert total_n == n_events - n_users


def test_mom_growth_null_on_first_and_gap_months(spark):
    rows = sorted(
        SPECS["revenue_mom_growth"].fn(spark, SF_SMALL).collect(),
        key=lambda r: (r.yr, r.mon),
    )
    assert rows[0].mom_growth is None
    seen = {(r.yr, r.mon) for r in rows}
    for r in rows:
        prev = (r.yr, r.mon - 1) if r.mon > 1 else (r.yr - 1, 12)
        if prev not in seen:
            assert r.mom_growth is None
        assert r.revenue > 0


def test_cumulative_distinct_monotone_and_totals(spark):
    rows = sorted(
        SPECS["cumulative_distinct_users_daily"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r.day,
    )
    cums = [r.cum_distinct_users for r in rows]
    assert cums == sorted(cums)
    total_users = (
        table(spark, SF_SMALL, "events").select("user_id").distinct().count()
    )
    assert cums[-1] == total_users
    assert sum(r.new_users for r in rows) == total_users
    for r in rows:
        assert r.new_users <= r.active


def test_pareto_frontier_has_no_dominated_member(spark):
    rows = SPECS["pareto_frontier_parts"].fn(spark, SF_SMALL).collect()
    assert rows
    pts = [(r.p_size, r.cents) for r in rows]
    for sz, c in pts:
        for sz2, c2 in pts:
            dominates = (
                sz2 >= sz and c2 <= c and (sz2 > sz or c2 < c)
            )
            assert not dominates, ((sz, c), (sz2, c2))


def test_hierarchy_shares_sum_to_one(spark):
    rows = SPECS["hierarchy_share_of_parent"].fn(spark, SF_SMALL).collect()
    by_region: dict[str, float] = {}
    region_share: dict[str, float] = {}
    for r in rows:
        by_region[r.region] = by_region.get(r.region, 0.0) + r.share_of_region
        region_share[r.region] = r.region_share_of_total
    for region, s in by_region.items():
        assert abs(s - 1.0) < 1e-4
    assert abs(sum(region_share.values()) - 1.0) < 1e-4


def test_multi_touch_credits_conserve_purchase_value(spark):
    import pyspark.sql.functions as F

    out = SPECS["multi_touch_attribution"].fn(spark, SF_SMALL)
    total_credited = out.agg(F.sum("credited_value")).collect()[0][0]
    ev = table(spark, SF_SMALL, "events")
    # exact conservation: credited value == value of purchases that HAD at
    # least one view in the window; so it can't exceed total purchase value
    total_purchases = (
        ev.where(F.col("event_type") == "purchase")
        .agg(
            (
                F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
                / 100.0
            ).alias("v")
        )
        .collect()[0][0]
    )
    assert 0 < total_credited <= total_purchases + 1e-9


def test_wau_matches_direct_sliding_distinct(spark):
    """The island/difference-array WAU must equal the definitional
    per-day COUNT(DISTINCT user active in [d-6, d]) recomputed directly."""
    import datetime

    from tests.conftest import SF_SMALL
    from wheels_in_motion_analytics_spark.tables import table as _table

    got = {
        r.day: r.wau
        for r in SPECS["wau_sliding_distinct_users"].fn(spark, SF_SMALL).collect()
    }
    ud = {
        (r.user_id, r.day)
        for r in _table(spark, SF_SMALL, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .collect()
    }
    days = sorted({d for _, d in ud})
    lo, hi = days[0], days[-1]
    d = lo
    while d <= hi:
        active = {
            u
            for (u, ad) in ud
            if d - datetime.timedelta(days=6) <= ad <= d
        }
        assert got[d] == len(active), d
        d += datetime.timedelta(days=1)
    assert set(got) == {
        lo + datetime.timedelta(days=i) for i in range((hi - lo).days + 1)
    }


def test_abc_xyz_partition_and_masses(spark):
    from wheels_in_motion_analytics_spark.registry import load_all_queries
    from wheels_in_motion_analytics_spark.tables import table as tbl

    rows = load_all_queries()["abc_xyz_classification"].fn(spark, SF_SMALL).collect()
    n_parts = (
        tbl(spark, SF_SMALL, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r["n_parts"] for r in rows) == n_parts
    by_abc = {}
    for r in rows:
        by_abc[r["abc"]] = by_abc.get(r["abc"], 0) + r["revenue_cents"]
    tot = sum(by_abc.values())
    # A-class revenue share must dominate (>= its 70% cut is guaranteed by
    # construction only approximately — assert the ordering instead)
    assert by_abc.get("A", 0) >= by_abc.get("B", 0) >= 0
    assert set(r["abc"] for r in rows) <= {"A", "B", "C"}
    assert set(r["xyz"] for r in rows) <= {"X", "Y", "Z"}
    assert tot == sum(r["revenue_cents"] for r in rows)


def test_markov_stationary_python_recompute(spark):
    """Replay the integer-grid power iteration; also check the normalized
    mass sums to ~1e6 and is close to the true stationary distribution."""
    from collections import defaultdict

    from wheels_in_motion_analytics_spark.functions.product_analytics import (
        MARKOV_ROUNDS,
    )

    rows = {
        r["state"]: r
        for r in SPECS["markov_stationary_behavior"].fn(spark, SF_SMALL).collect()
    }
    ev = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"], r["event_type"])
            for r in table(spark, SF_SMALL, "events")
            .select("user_id", "ts", "event_id", "event_type")
            .collect()
        ),
    )
    trans = defaultdict(int)
    per_user = defaultdict(list)
    for u, ts, eid, et in ev:
        per_user[u].append((ts, eid, et))
    for u, seq in per_user.items():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    rtot = defaultdict(int)
    for (a, _), n in trans.items():
        rtot[a] += n
    pi = {s: 10**6 for s in rtot}
    for _ in range(MARKOV_ROUNDS):
        nxt = defaultdict(int)
        for (a, b), n in trans.items():
            if a in pi:
                nxt[b] += (pi[a] * n) // rtot[a]
        pi = dict(nxt)
    s = sum(pi.values())
    assert set(rows) == set(pi)
    for st, v in pi.items():
        assert rows[st]["pi_grid"] == v
        assert rows[st]["pi_norm_ppm"] == (2_000_000 * v + s) // (2 * s)
    total_ppm = sum(r["pi_norm_ppm"] for r in rows.values())
    assert abs(total_ppm - 1_000_000) <= len(rows)  # half-up rounding slack


def test_shapley_attribution_python_recompute_and_efficiency(spark):
    from collections import defaultdict

    rows = {
        r["channel"]: r
        for r in SPECS["shapley_channel_attribution"].fn(spark, SF_SMALL).collect()
    }
    per = defaultdict(lambda: [0, 0, 0, 0])
    idx = {"view": 0, "click": 1, "signup": 2, "purchase": 3}
    for r in table(spark, SF_SMALL, "events").select("user_id", "event_type").collect():
        if r["event_type"] in idx:
            per[r["user_id"]][idx[r["event_type"]]] = 1
    coal = defaultdict(lambda: [0, 0])
    for flags in per.values():
        key = tuple(flags[:3])
        coal[key][0] += 1
        coal[key][1] += flags[3]
    v = {}
    for key in [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]:
        n, cv = coal.get(key, (0, 0))
        v[key] = (2_000_000 * cv + n) // (2 * n) if n else 0
    phi = {
        "view": 2 * (v[(1,0,0)] - v[(0,0,0)]) + (v[(1,1,0)] - v[(0,1,0)])
        + (v[(1,0,1)] - v[(0,0,1)]) + 2 * (v[(1,1,1)] - v[(0,1,1)]),
        "click": 2 * (v[(0,1,0)] - v[(0,0,0)]) + (v[(1,1,0)] - v[(1,0,0)])
        + (v[(0,1,1)] - v[(0,0,1)]) + 2 * (v[(1,1,1)] - v[(1,0,1)]),
        "signup": 2 * (v[(0,0,1)] - v[(0,0,0)]) + (v[(1,0,1)] - v[(1,0,0)])
        + (v[(0,1,1)] - v[(0,1,0)]) + 2 * (v[(1,1,1)] - v[(1,1,0)]),
    }
    eff = 6 * (v[(1,1,1)] - v[(0,0,0)])
    for ch, want in phi.items():
        assert rows[ch]["phi_x6_ppm"] == want
        assert rows[ch]["eff_x6_ppm"] == eff
    # Shapley efficiency axiom holds exactly on the ppm grid
    assert sum(phi.values()) == eff


def test_markov_entropy_rate_python_recompute(spark):
    import math
    from collections import defaultdict

    from wheels_in_motion_analytics_spark.functions.product_analytics import (
        MARKOV_ROUNDS,
    )

    row = SPECS["markov_entropy_rate"].fn(spark, SF_SMALL).collect()[0]
    per_user = defaultdict(list)
    for r in table(spark, SF_SMALL, "events").select("user_id", "ts", "event_id", "event_type").collect():
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    trans = defaultdict(int)
    for seq in per_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    rtot = defaultdict(int)
    for (a, _), n in trans.items():
        rtot[a] += n
    pi = {s: 10**6 for s in rtot}
    for _ in range(MARKOV_ROUNDS):
        nxt = defaultdict(int)
        for (a, b), n in trans.items():
            if a in pi:
                nxt[b] += (pi[a] * n) // rtot[a]
        pi = dict(nxt)
    z = sum(pi.values())

    def ln9(v):
        return int(round(math.log(v), 9) * 10**9)

    s = sum(
        (pi[a] * n * (ln9(rtot[a]) - ln9(n))) // rtot[a]
        for (a, _b), n in trans.items()
        if a in pi
    )
    assert row["n_states"] == len(pi)
    want = (2 * s + z * 1000) // (2 * z * 1000)
    assert row["entropy_rate_micro_nats"] == want
    # bounded by ln(k) for k states
    assert 0 <= row["entropy_rate_micro_nats"] <= int(math.log(len(pi)) * 1e6) + 1
