"""Semantic properties of the hypothesis-test / robust-outlier operators
(cross-engine exactness is covered by the differential harness)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from wheels_in_motion_analytics_spark.registry import load_all_queries
from wheels_in_motion_analytics_spark.tables import table

SPECS = load_all_queries()


def test_welch_all_pairs_present_and_antisymmetric_consistent(spark):
    rows = SPECS["welch_ttest_segments"].fn(spark, SF_SMALL).collect()
    segs = set()
    for r in rows:
        segs.update((r.seg_a, r.seg_b))
        assert r.seg_a < r.seg_b
        # t carries the sign of the mean difference
        assert (r.t_stat >= 0) == (r.mean_diff >= 0)
        # Welch dof lies between min(n)-1 and n_a+n_b-2
        assert min(r.n_a, r.n_b) - 1 <= r.dof <= r.n_a + r.n_b - 2
    k = len(segs)
    assert len(rows) == k * (k - 1) / 2


def test_welch_matches_scipy_free_formula(spark):
    # independent recomputation from raw data, pure Python
    rows = SPECS["welch_ttest_segments"].fn(spark, SF_SMALL).collect()
    data = (
        table(spark, SF_SMALL, "customer")
        .select("c_mktsegment", "c_acctbal")
        .collect()
    )
    by_seg: dict[str, list[float]] = {}
    for r in data:
        by_seg.setdefault(r.c_mktsegment, []).append(r.c_acctbal)
    for r in rows[:3]:
        xa, xb = by_seg[r.seg_a], by_seg[r.seg_b]
        ma = sum(xa) / len(xa)
        mb = sum(xb) / len(xb)
        va = sum((x - ma) ** 2 for x in xa) / (len(xa) - 1)
        vb = sum((x - mb) ** 2 for x in xb) / (len(xb) - 1)
        t = (ma - mb) / math.sqrt(va / len(xa) + vb / len(xb))
        assert abs(t - r.t_stat) < 1e-3


def test_ks_statistic_bounds_and_exact_numerator(spark):
    row = SPECS["ks_test_two_sample"].fn(spark, SF_SMALL).collect()[0]
    assert row.n1 > 0 and row.n2 > 0
    assert 0 <= row.d_num <= row.n1 * row.n2
    assert 0.0 <= row.d_stat <= 1.0
    assert abs(row.d_stat - row.d_num / (row.n1 * row.n2)) < 1e-6


def test_mad_outliers_bounded_and_median_within_range(spark):
    rows = SPECS["mad_outlier_audit"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_outliers <= r.n
        assert r.mad >= 0
    # a robust method on heavy-ish tails should flag only a small fraction
    total = sum(r.n for r in rows)
    flagged = sum(r.n_outliers for r in rows)
    assert flagged / total < 0.2


def test_psi_terms_sum_to_total_and_drift_detected(spark):
    rows = SPECS["psi_price_drift"].fn(spark, SF_SMALL).collect()
    assert rows
    total = rows[0].psi_total
    assert all(abs(r.psi_total - total) < 1e-9 for r in rows)
    assert abs(sum(r.psi_term for r in rows) - total) < 1e-4
    assert total >= 0  # PSI is nonnegative by Gibbs' inequality


def test_ewma_is_between_series_min_and_max(spark):
    rows = SPECS["revenue_ewma_daily"].fn(spark, SF_SMALL).collect()
    assert rows
    by_prio: dict[str, list] = {}
    for r in rows:
        by_prio.setdefault(r.prio, []).append(r)
    for prio, rs in by_prio.items():
        vals = [r.ewma_revenue for r in rs]
        assert all(v > 0 for v in vals)


def test_embedding_dim_percentiles_ordered(spark):
    rows = SPECS["embedding_dim_percentiles"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 64
    for r in rows:
        assert r.vmin <= r.p5 <= r.p50 <= r.p95 <= r.vmax


def test_winsorized_mean_moves_toward_center(spark):
    rows = SPECS["winsorize_prices"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.lo <= r.hi
        assert 0 < r.n_clipped < r.n  # something clipped, not everything
        assert r.lo <= r.mean_winsor <= r.hi


def test_cuped_reduces_variance_and_preserves_overall_mean(spark):
    rows = SPECS["cuped_adjusted_lift"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 2  # two arms
    for r in rows:
        assert 0.0 <= r.variance_reduction < 1.0
        assert r.n_units > 0
    # the synthetic pre/post correlation is weak but must be exploited:
    # reduction strictly positive (= ρ² of covariate and metric)
    assert rows[0].variance_reduction > 0.0
    # the adjustment is mean-preserving over the pooled population
    pooled_raw = sum(r.raw_mean * r.n_units for r in rows) / sum(
        r.n_units for r in rows
    )
    pooled_adj = sum(r.adjusted_mean * r.n_units for r in rows) / sum(
        r.n_units for r in rows
    )
    assert abs(pooled_raw - pooled_adj) < 1.0  # cents-level quantization slack


def test_interval_merge_coverage_bounds(spark):
    from wheels_in_motion_analytics_spark.operators.timeseries import (
        COALESCE_PAD_MIN,
    )
    from wheels_in_motion_analytics_spark.tables import table as _table

    rows = SPECS["merge_overlapping_intervals"].fn(spark, SF_SMALL).collect()
    import pyspark.sql.functions as F

    n_per_user = {
        r.user_id: r.n
        for r in _table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        n = n_per_user[r.user_id]
        assert 1 <= r.n_spans <= n
        # coverage between one interval's span and n disjoint intervals
        assert 2 * COALESCE_PAD_MIN <= r.covered_minutes <= n * 2 * COALESCE_PAD_MIN


def test_spearman_rho_ppm_exact_integer_derivation(spark):
    """rho_ppm must equal the exact-integer definition
    sign(num)*((2*|num|*1e6 + a*b) DIV (2*a*b)) with a,b = floor-isqrt of
    dxx,dyy — i.e. the in-plan double-sqrt candidate + correction never
    drifts from Python's math.isqrt, and the emitted value agrees with the
    true 6dp-rounded rho (no float quotient is hashed; r4 verdict item 1)."""
    from decimal import Decimal, getcontext

    row = SPECS["spearman_rank_correlation"].fn(spark, SF_SMALL).collect()[0]
    num, dxx, dyy = int(row.num), int(row.dxx), int(row.dyy)
    a, b = math.isqrt(dxx), math.isqrt(dyy)
    expect = (1 if num >= 0 else -1) * (
        (2 * abs(num) * 10**6 + a * b) // (2 * a * b)
    )
    assert row.rho_ppm == expect
    getcontext().prec = 60
    true_ppm = Decimal(num) * Decimal(10**6) / (Decimal(dxx) * Decimal(dyy)).sqrt()
    assert int(true_ppm.quantize(Decimal(1))) == row.rho_ppm
    assert -(10**6) <= row.rho_ppm <= 10**6


def test_acf_lags_bounded_and_pairs_match_calendar(spark):
    """|ACF| <= 1 in ppm, and each lag's pair count equals the number of
    (day, day+k) calendar alignments actually present in the series —
    recomputed here directly (NOT monotone in k: gap patterns can align
    better at a larger lag)."""
    from wheels_in_motion_analytics_spark.tables import table as _table

    rows = {r.lag: r for r in SPECS["acf_daily_revenue"].fn(spark, SF_SMALL).collect()}
    assert set(rows) == set(range(1, 8))
    days = {
        r.day
        for r in _table(spark, SF_SMALL, "orders")
        .select(F.col("o_orderdate").cast("date").alias("day"))
        .distinct()
        .collect()
    }
    import datetime

    for k, r in rows.items():
        assert abs(r.acf_ppm) <= 10**6
        expect_pairs = sum(
            1 for d in days if d + datetime.timedelta(days=k) in days
        )
        assert r.n_pairs == expect_pairs


def test_cusum_changepoint_maximizes_statistic(spark):
    """The emitted day must attain the max |n*P_k - k*S| over every prefix
    (recomputed here directly from the day-grain series)."""
    from wheels_in_motion_analytics_spark.tables import table as _table

    r = SPECS["cusum_changepoint_daily"].fn(spark, SF_SMALL).collect()[0]
    days = (
        _table(spark, SF_SMALL, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("cents")
        )
        .orderBy("day")
        .collect()
    )
    n = len(days)
    s = sum(d.cents for d in days)
    assert r.n_days == n and r.total_cents == s
    best = None
    pc = 0
    for k, d in enumerate(days[:-1], start=1):
        pc += d.cents
        ck = abs(n * pc - k * s)
        if best is None or ck > best[0]:
            best = (ck, d.day, pc, k)
    assert int(r.max_abs_cusum) == best[0]
    assert r.change_day == best[1]
    assert r.mean_before_cents == best[2] // best[3]
    assert r.mean_after_cents == (s - best[2]) // (n - best[3])


def test_corr_matrix_matches_exact_python_recompute(spark):
    """Every pair's corr_ppm must equal the exact-integer definition
    recomputed from raw rows with Python bignums (one-pass moment
    aggregation can't have drifted), and pair qty_price must agree in
    sign with spearman's quantity/price monotone association."""
    import math as _math

    rows = SPECS["corr_matrix_metrics"].fn(spark, SF_SMALL).collect()
    li = table(spark, SF_SMALL, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint").alias("price"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("bigint").alias("disc"),
        F.floor(F.col("l_tax") * 100 + F.lit(0.5)).cast("bigint").alias("tax"),
    ).collect()
    cols = {c: [getattr(r, c) for r in li] for c in ("qty", "price", "disc", "tax")}
    n = len(li)
    for r in rows:
        a, b = r.pair.split("_")
        xa, xb = cols[a], cols[b]
        num = n * sum(x * y for x, y in zip(xa, xb)) - sum(xa) * sum(xb)
        dxx = n * sum(x * x for x in xa) - sum(xa) ** 2
        dyy = n * sum(y * y for y in xb) - sum(xb) ** 2
        assert int(r.num) == num, r.pair
        ia, ib = _math.isqrt(dxx), _math.isqrt(dyy)
        expect = (1 if num >= 0 else -1) * (
            (2 * abs(num) * 10**6 + ia * ib) // (2 * ia * ib)
        )
        assert r.corr_ppm == expect, r.pair
        assert abs(r.corr_ppm) <= 10**6


def test_theil_sen_matches_direct_pair_median(spark):
    """Quickselect median slope == the directly-computed lower median of
    all pairwise scaled slopes (Python recompute on the day series)."""
    r = SPECS["theil_sen_trend_daily"].fn(spark, SF_SMALL).collect()[0]
    days = sorted(
        (
            (d.day, d.cents)
            for d in table(spark, SF_SMALL, "orders")
            .groupBy(F.col("o_orderdate").cast("date").alias("day"))
            .agg(
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
                ).alias("cents")
            )
            .collect()
        )
    )
    slopes = []
    for i in range(len(days)):
        for jj in range(i + 1, len(days)):
            dd = (days[jj][0] - days[i][0]).days
            num = (days[jj][1] - days[i][1]) * 1048576
            q = abs(num) // dd
            slopes.append(q if num >= 0 else -q)  # truncation toward zero
    slopes.sort()
    assert r.n_pairs == len(slopes)
    assert r.median_slope_scaled == slopes[(len(slopes) + 1) // 2 - 1]


def test_mann_kendall_matches_direct_recompute(spark):
    """S, ties-corrected 18*Var(S), tau_ppm and the 5% verdict recomputed
    directly from the day series with Python bignums."""
    r = SPECS["mann_kendall_trend"].fn(spark, SF_SMALL).collect()[0]
    cents = [
        d.cents
        for d in table(spark, SF_SMALL, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("cents")
        )
        .orderBy("day")
        .collect()
    ]
    n = len(cents)
    s = sum(
        (1 if cents[j] > cents[i] else -1 if cents[j] < cents[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(cents)
    tie18 = sum(c * (c - 1) * (2 * c + 5) for c in ties.values())
    var18 = n * (n - 1) * (2 * n + 5) - tie18
    assert r.n_days == n and r.s_stat == s and r.var18 == var18
    d_pairs = n * (n - 1) // 2
    t_pairs = sum(c * (c - 1) for c in ties.values()) // 2
    a, b = math.isqrt(d_pairs), math.isqrt(d_pairs - t_pairs)
    expect_tau = (1 if s >= 0 else -1) * (
        (2 * abs(s) * 10**6 + a * b) // (2 * a * b)
    )
    assert r.tau_ppm == expect_tau
    expect_sig = abs(s) > 1 and (abs(s) - 1) ** 2 * 1800000000 > 384160000 * var18
    assert r.trend_significant == expect_sig


def test_kaplan_meier_invariants(spark):
    """KM structural invariants: risk sets strictly decrease, log-survival
    is non-increasing, NULL only at/after a full-death time, and the
    first-row survival matches the closed form."""
    import math

    from tests.conftest import SF_SMALL
    from wheels_in_motion_analytics_spark.registry import load_all_queries

    rows = sorted(
        load_all_queries()["kaplan_meier_ship_latency"]
        .fn(spark, SF_SMALL)
        .collect(),
        key=lambda r: r.dur_days,
    )
    assert rows
    total = rows[0].n_risk
    seen = 0
    prev_ls = 0.0
    dead = False
    for r in rows:
        assert r.n_risk == total - seen
        seen += r.d_events + r.c_censored
        assert r.d_events + r.c_censored >= 1
        if dead or r.d_events >= r.n_risk:
            dead = True
            assert r.log_survival is None
            continue
        assert r.log_survival <= prev_ls + 1e-9
        prev_ls = r.log_survival
    first = rows[0]
    if first.d_events and first.d_events < first.n_risk:
        want = round(
            round(math.log(1 - first.d_events / first.n_risk), 9), 6
        )
        assert abs(first.log_survival - want) < 1e-9


def test_sprt_python_recompute(spark):
    """Exact sequential replay: same frozen nano-ln increments, same
    arrival order, same first-crossing semantics."""
    from wheels_in_motion_analytics_spark.functions.stats import (
        SPRT_A_NANO,
        SPRT_B_NANO,
        SPRT_L0_NANO,
        SPRT_L1_NANO,
    )

    row = SPECS["sprt_sequential_test"].fn(spark, SF_SMALL).collect()[0]
    rows = (
        table(spark, SF_SMALL, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderstatus")
        .collect()
    )
    rows.sort(key=lambda r: (r["o_orderdate"], r["o_orderkey"]))
    cum = 0
    stop = None
    for i, r in enumerate(rows, 1):
        cum += SPRT_L1_NANO if r["o_orderstatus"] == "F" else SPRT_L0_NANO
        if stop is None and (cum >= SPRT_A_NANO or cum <= SPRT_B_NANO):
            stop = (i, cum)
    assert row["n_total"] == len(rows)
    assert row["final_llr_nano"] == cum
    if stop is None:
        assert row["decision"] == "continue"
        assert row["stopped_at_n"] is None
    else:
        assert (row["stopped_at_n"], row["llr_at_stop_nano"]) == stop
        assert row["decision"] == (
            "accept_h1" if stop[1] >= SPRT_A_NANO else "accept_h0"
        )


def test_conformal_coverage_guarantee(spark):
    """Split-conformal finite-sample guarantee: empirical coverage on the
    held-out half must be >= 1 - alpha - slack, and q is the exact order
    statistic (python re-selection)."""
    from wheels_in_motion_analytics_spark.functions.ml import CONF_ALPHA_PCT

    row = SPECS["conformal_interval_calibration"].fn(spark, SF_SMALL).collect()[0]
    assert row["q_idx"] == min(
        -(-(row["n_cal"] + 1) * (100 - CONF_ALPHA_PCT) // 100), row["n_cal"]
    )
    assert row["coverage_ppm"] >= 860_000  # 90% target minus small-n slack
    assert row["n_covered"] <= row["n_test"]


def test_runs_test_python_recompute(spark):
    from collections import defaultdict

    row = SPECS["runs_test_randomness"].fn(spark, SF_SMALL).collect()[0]
    daily = defaultdict(int)
    for r in (
        table(spark, SF_SMALL, "orders")
        .selectExpr(
            "CAST(o_orderdate AS DATE) AS day",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    ):
        daily[r["day"]] += r["cents"]
    vals = sorted(daily.values())
    m = vals[(len(vals) + 1) // 2 - 1]
    seq = [1 if daily[d] > m else 0 for d in sorted(daily) if daily[d] != m]
    n1, n2 = sum(seq), len(seq) - sum(seq)
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    assert (row["n_above"], row["n_below"], row["n_runs"]) == (n1, n2, runs)
    n = n1 + n2
    a = runs * n - 2 * n1 * n2 - n
    assert row["a_scaled"] == a
    assert row["reject_randomness"] == (
        a * a * (n - 1) * 10000 > 38416 * 2 * n1 * n2 * (2 * n1 * n2 - n)
    )


def test_did_python_recompute(spark):
    from collections import defaultdict

    from wheels_in_motion_analytics_spark.functions.stats import (
        DID_SPLIT,
        DID_TREATED_REGION,
    )

    row = SPECS["did_estimator_regions"].fn(spark, SF_SMALL).collect()[0]
    orders = table(spark, SF_SMALL, "orders").selectExpr(
        "o_custkey",
        f"CAST(o_orderdate >= TIMESTAMP '{DID_SPLIT} 00:00:00' AS INT) AS after",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 1000 AS milli",
    )
    cust = table(spark, SF_SMALL, "customer").selectExpr("c_custkey", "c_nationkey")
    nat = table(spark, SF_SMALL, "nation").selectExpr("n_nationkey", "n_regionkey")
    reg = table(spark, SF_SMALL, "region").selectExpr("r_regionkey", "r_name")
    rows = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nat, cust.c_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .selectExpr(
            f"CAST(r_name = '{DID_TREATED_REGION}' AS INT) AS treated",
            "after",
            "milli",
        )
        .collect()
    )
    cells = defaultdict(lambda: [0, 0])
    for r in rows:
        cells[(r["treated"], r["after"])][0] += 1
        cells[(r["treated"], r["after"])][1] += r["milli"]

    def mean(t, a):
        n, s = cells[(t, a)]
        return (2 * s + n) // (2 * n)

    did = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
    assert row["did_milli"] == did
    assert row["treated_after_milli"] == mean(1, 1)
    assert row["n_treated"] == cells[(1, 1)][0] + cells[(1, 0)][0]


def test_kruskal_wallis_python_recompute(spark):
    """Exact grid recompute: ranks, micro grid, tie factor — and the grid
    H must sit within 1e-4 of the float textbook H."""
    from collections import defaultdict

    row = SPECS["kruskal_wallis_priority"].fn(spark, SF_SMALL).collect()[0]
    data = [
        (float(r["v"]), int(r["g"]))
        for r in table(spark, SF_SMALL, "orders")
        .selectExpr(
            "CAST(o_totalprice AS DECIMAL(18,2)) AS v",
            "CAST(substr(o_orderpriority, 1, 1) AS INT) AS g",
        )
        .collect()
    ]
    per_val = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n_tot, c1..c5
    for v, g in data:
        per_val[v][0] += 1
        per_val[v][g] += 1
    n = len(data)
    cum = 0
    r2 = [0] * 6
    ngrp = [0] * 6
    ties = 0
    for v in sorted(per_val):
        t = per_val[v][0]
        dr = 2 * cum + t + 1
        for g in range(1, 6):
            r2[g] += per_val[v][g] * dr
            ngrp[g] += per_val[v][g]
        ties += t * t * t - t
        cum += t
    assert row["n_total"] == n and row["ties_t"] == ties
    names = ["urgent", "high", "medium", "notspec", "low"]
    for g, name in enumerate(names, start=1):
        assert row[f"n_{name}"] == ngrp[g]
        assert row[f"r2_{name}"] == r2[g]
    # exact grid recompute
    sdev = 0
    for g in range(1, 6):
        m = (2 * r2[g] * 10**6 + ngrp[g]) // (2 * ngrp[g])
        d = m - (n + 1) * 10**6
        sdev += ngrp[g] * d * d
    h0_nano = (3 * sdev) // (n * (n + 1) * 1000)
    tf_ppm = ((n**3 - n) * 10**6) // ((n**3 - n) - ties)
    h_micro = (h0_nano * tf_ppm) // 10**9
    assert row["h_micro"] == h_micro
    assert row["reject_equal_dists"] == (h_micro > 9487729)
    # grid H within 1e-4 of the float textbook statistic
    h_float = (
        12.0 / (n * (n + 1)) * sum((r2[g] / 2.0) ** 2 / ngrp[g] for g in range(1, 6))
        - 3.0 * (n + 1)
    ) / (1.0 - ties / float(n**3 - n))
    assert abs(h_micro / 1e6 - h_float) < 1e-4 * max(1.0, abs(h_float))


def test_kendall_tau_python_recompute(spark):
    from collections import defaultdict
    from fractions import Fraction
    from math import isqrt

    row = SPECS["kendall_tau_daily"].fn(spark, SF_SMALL).collect()[0]
    daily = defaultdict(lambda: [0, 0])
    for r in (
        table(spark, SF_SMALL, "orders")
        .selectExpr(
            "CAST(o_orderdate AS DATE) AS day",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    ):
        daily[r["day"]][0] += 1
        daily[r["day"]][1] += r["cents"]
    pts = [tuple(daily[d]) for d in sorted(daily)]
    n = len(pts)
    conc = disc = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = pts[j][0] - pts[i][0], pts[j][1] - pts[i][1]
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
    n0 = n * (n - 1) // 2
    assert (row["n_days"], row["concordant"], row["discordant"]) == (n, conc, disc)
    assert (row["tied_x"], row["tied_y"]) == (tx, ty)
    num, dxx, dyy = conc - disc, n0 - tx, n0 - ty
    a, b = isqrt(dxx), isqrt(dyy)
    sign = -1 if num < 0 else 1
    expected = sign * ((2 * abs(num) * 10**6 + a * b) // (2 * a * b))
    assert row["tau_b_ppm"] == expected
    # ppm value is within 1/isqrt-grid of the float tau-b
    tau = float(Fraction(num) / Fraction(isqrt(dxx * dyy) or 1))
    assert abs(row["tau_b_ppm"] / 1e6 - tau) < 5e-4


def test_mcnemar_python_recompute(spark):
    row = SPECS["mcnemar_paired_classifiers"].fn(spark, SF_SMALL).collect()[0]
    data = [
        (r["cents"], r["b"])
        for r in table(spark, SF_SMALL, "orders")
        .selectExpr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
            "CAST(o_orderstatus = 'F' AS INT) AS b",
        )
        .collect()
    ]
    n = len(data)
    s = sum(c for c, _ in data)
    n11 = sum(1 for c, b in data if c * n > s and b == 1)
    n10 = sum(1 for c, b in data if c * n > s and b == 0)
    n01 = sum(1 for c, b in data if c * n <= s and b == 1)
    n00 = n - n11 - n10 - n01
    assert (row["both_pos"], row["only_a"], row["only_b"], row["both_neg"]) == (
        n11,
        n10,
        n01,
        n00,
    )
    d = abs(n10 - n01) - 1
    assert row["chi2_milli"] == (2000 * d * d + (n10 + n01)) // (2 * (n10 + n01))
    assert row["reject_marginal_homogeneity"] == (d * d * 10000 > 38416 * (n10 + n01))


def test_jonckheere_python_recompute(spark):
    from bisect import bisect_left, bisect_right
    from collections import defaultdict

    row = SPECS["jonckheere_terpstra_trend"].fn(spark, SF_SMALL).collect()[0]
    groups = defaultdict(list)
    for r in (
        table(spark, SF_SMALL, "orders")
        .selectExpr(
            "CAST(o_totalprice * 100 AS BIGINT) AS cents100",
            "CAST(substr(o_orderpriority, 1, 1) AS INT) AS g",
        )
        .collect()
    ):
        groups[r["g"]].append(r["cents100"])
    for g in groups:
        groups[g].sort()
    j2 = 0
    for j in range(1, 6):
        for k in range(j + 1, 6):
            for x in groups[j]:
                # 2 * (#{y > x} + 0.5 * #{y == x})
                gt = len(groups[k]) - bisect_right(groups[k], x)
                eq = bisect_right(groups[k], x) - bisect_left(groups[k], x)
                j2 += 2 * gt + eq
    ns = [len(groups[g]) for g in range(1, 6)]
    n = sum(ns)
    sq = sum(x * x for x in ns)
    sq3 = sum(x * x * (2 * x + 3) for x in ns)
    d = 2 * j2 - (n * n - sq)
    var72 = n * n * (2 * n + 3) - sq3
    assert row["n_total"] == n
    assert row["jt_2j"] == j2
    assert row["d_scaled"] == d
    assert row["var72"] == str(var72)
    assert row["trend_significant"] == (d * d * 90000 > 2 * 38416 * var72)


def test_ab_srm_python_recompute(spark):
    import hashlib

    rows = {r["design"]: r for r in SPECS["ab_srm_check"].fn(spark, SF_SMALL).collect()}
    keys = [
        r["c_custkey"]
        for r in table(spark, SF_SMALL, "customer").select("c_custkey").collect()
    ]
    hs = [int(hashlib.md5(f"arm:{k}".encode()).hexdigest()[:15], 16) for k in keys]
    n = len(hs)
    n_even = sum(1 for h in hs if h % 2 == 0)
    n_hold = sum(1 for h in hs if h % 10 == 0)
    r = rows["50_50"]
    d = 2 * n_even - n
    assert (r["n_a"], r["n_b"]) == (n_even, n - n_even)
    assert r["chi2_milli"] == (2000 * d * d + n) // (2 * n)
    assert r["srm_detected"] == (d * d * 10000 > 38416 * n)
    r = rows["90_10"]
    d = 10 * n_hold - n
    assert (r["n_a"], r["n_b"]) == (n - n_hold, n_hold)
    assert r["chi2_milli"] == (2000 * d * d + 9 * n) // (2 * 9 * n)
    assert r["srm_detected"] == (d * d * 10000 > 38416 * 9 * n)


def test_psm_caliper_python_recompute(spark):
    from wheels_in_motion_analytics_spark.functions.stats import (
        _PSM_OFFSET,
        PSM_CALIPER_CENTS,
        PSM_TREATED_SEGMENT,
    )

    row = SPECS["psm_caliper_matching"].fn(spark, SF_SMALL).collect()[0]
    cust = {
        r["k"]: (r["bal"], r["treated"])
        for r in table(spark, SF_SMALL, "customer")
        .selectExpr(
            "c_custkey AS k",
            f"CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + {_PSM_OFFSET} AS bal",
            f"CAST(c_mktsegment = '{PSM_TREATED_SEGMENT}' AS INT) AS treated",
        )
        .collect()
    }
    rev = {
        r["k"]: r["cents"]
        for r in table(spark, SF_SMALL, "orders")
        .selectExpr(
            "o_custkey AS k",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .groupBy("k")
        .sum("cents")
        .withColumnRenamed("sum(cents)", "cents")
        .collect()
    }
    treated = [(k, b) for k, (b, t) in cust.items() if t == 1]
    control = [(k, b) for k, (b, t) in cust.items() if t == 0]
    n_matched = 0
    sum_diff = 0
    sum_gap = 0
    for tk, tb in treated:
        cands = [
            (abs(tb - cb), ck) for ck, cb in control if abs(tb - cb) <= PSM_CALIPER_CENTS
        ]
        if not cands:
            continue
        gap, ck = min(cands)
        n_matched += 1
        sum_diff += rev.get(tk, 0) - rev.get(ck, 0)
        sum_gap += gap
    assert row["n_treated"] == len(treated)
    assert row["n_control"] == len(control)
    assert row["n_matched"] == n_matched
    assert row["sum_diff_cents"] == sum_diff
    sign = -1 if sum_diff < 0 else 1
    assert row["att_milli_cents"] == sign * (
        (2000 * abs(sum_diff) + n_matched) // (2 * n_matched)
    )
    assert row["mean_gap_milli"] == (2000 * sum_gap + n_matched) // (2 * n_matched)


def test_permutation_test_python_recompute(spark):
    import hashlib

    from wheels_in_motion_analytics_spark.functions.stats import (
        PERM_B,
        PERM_SEGMENT,
    )

    row = SPECS["permutation_test_segment_revenue"].fn(spark, SF_SMALL).collect()[0]
    cust = {
        r["k"]: r["t"]
        for r in table(spark, SF_SMALL, "customer")
        .selectExpr(
            "c_custkey AS k", f"CAST(c_mktsegment = '{PERM_SEGMENT}' AS INT) AS t"
        )
        .collect()
    }
    rev = {}
    for r in (
        table(spark, SF_SMALL, "orders")
        .selectExpr(
            "o_custkey AS k", "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c"
        )
        .collect()
    ):
        rev[r["k"]] = rev.get(r["k"], 0) + r["c"]
    pts = [(k, t, rev.get(k, 0)) for k, t in cust.items()]
    st = sum(o for _, t, o in pts if t == 1)
    nt = sum(1 for _, t, _ in pts if t == 1)
    sc = sum(o for _, t, o in pts if t == 0)
    nc = len(pts) - nt
    obs = st * nc - sc * nt
    n_extreme = 0
    for b in range(PERM_B):
        s0 = n0 = s1 = n1 = 0
        for k, _, o in pts:
            arm = int(hashlib.md5(f"perm:{b}:{k}".encode()).hexdigest()[:15], 16) % 2
            if arm == 0:
                s0 += o
                n0 += 1
            else:
                s1 += o
                n1 += 1
        if abs(s0 * n1 - s1 * n0) * (nt * nc) >= abs(obs) * (n0 * n1):
            n_extreme += 1
    assert (row["n_treated"], row["n_control"]) == (nt, nc)
    assert row["obs_diff_num"] == str(obs)
    assert row["n_extreme"] == n_extreme
    assert row["p_milli"] == (2000 * (1 + n_extreme) + (PERM_B + 1)) // (
        2 * (PERM_B + 1)
    )


def test_wilcoxon_signed_rank_python_recompute(spark):
    from collections import defaultdict

    from wheels_in_motion_analytics_spark.functions.stats import CUPED_SPLIT

    row = SPECS["wilcoxon_signed_rank_prepost"].fn(spark, SF_SMALL).collect()[0]
    per = defaultdict(lambda: [0, 0])
    for r in (
        table(spark, SF_SMALL, "orders")
        .selectExpr(
            "o_custkey",
            f"CAST(o_orderdate < TIMESTAMP '{CUPED_SPLIT}' AS INT) AS pre",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    ):
        per[r["o_custkey"]][r["pre"]] += r["cents"]
    # index order: per[cust][1] = pre-period cents, per[cust][0] = post
    diffs = []
    for v in per.values():
        x, y = v[1], v[0]
        if x != y:
            diffs.append(y - x)
    n = len(diffs)
    per_abs = defaultdict(lambda: [0, 0])
    for d in diffs:
        per_abs[abs(d)][0] += 1
        if d > 0:
            per_abs[abs(d)][1] += 1
    cum = 0
    w2 = 0
    ties = 0
    for a in sorted(per_abs):
        t, p = per_abs[a]
        w2 += p * (2 * cum + t + 1)
        ties += t * t * t - t
        cum += t
    dd = 2 * w2 - n * (n + 1)
    var48 = 2 * n * (n + 1) * (2 * n + 1) - ties
    assert row["n_pairs"] == n
    assert row["w2_pos"] == w2
    assert row["d_scaled"] == dd
    assert row["ties_t"] == ties
    assert row["var48"] == str(var48)
    assert row["reject_symmetry"] == (dd * dd * 30000 > 38416 * var48)


def test_friedman_python_recompute(spark):
    from collections import defaultdict

    row = SPECS["friedman_test_priority_months"].fn(spark, SF_SMALL).collect()[0]
    cell = defaultdict(dict)
    for r in (
        table(spark, SF_SMALL, "orders")
        .selectExpr(
            "CAST(date_trunc('month', o_orderdate) AS DATE) AS blk",
            "CAST(substr(o_orderpriority, 1, 1) AS INT) AS g",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    ):
        cell[r["blk"]][r["g"]] = cell[r["blk"]].get(r["g"], 0) + r["cents"]
    full = {b: v for b, v in cell.items() if len(v) == 5}
    r2 = [0] * 6
    for b, vals in full.items():
        for g, v in vals.items():
            below = sum(1 for v2 in vals.values() if v2 < v)
            eq = sum(1 for v2 in vals.values() if v2 == v)
            r2[g] += 2 * below + eq + 1
    n = len(full)
    s2 = sum(r2[g] * r2[g] for g in range(1, 6))
    q_milli = (2 * 3 * s2 * 1000 + 30 * n) // (2 * 30 * n) - 3 * n * 6 * 1000
    names = ["urgent", "high", "medium", "notspec", "low"]
    assert row["n_blocks"] == n
    for g, name in enumerate(names, start=1):
        assert row[f"r2_{name}"] == r2[g]
    assert row["q_milli"] == q_milli
    assert row["reject_equal_treatments"] == (q_milli > 9488)
    # grid Q close to textbook float Q
    qf = 12.0 / (n * 5 * 6) * sum((r2[g] / 2.0) ** 2 for g in range(1, 6)) - 3 * n * 6
    assert abs(q_milli / 1000.0 - qf) < 0.01 * max(1.0, abs(qf))


def test_seasonal_mann_kendall_python_recompute(spark):
    from collections import defaultdict

    row = SPECS["seasonal_mann_kendall_trend"].fn(spark, SF_SMALL).collect()[0]
    daily = defaultdict(int)
    for r in (
        table(spark, SF_SMALL, "orders")
        .selectExpr(
            "CAST(o_orderdate AS DATE) AS day",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    ):
        daily[r["day"]] += r["cents"]
    seasons = defaultdict(list)
    for day, v in daily.items():
        seasons[day.month].append((day, v))
    s_stat = 0
    var18 = 0
    n_days = 0
    for m, pts in seasons.items():
        pts.sort()
        n = len(pts)
        n_days += n
        var18 += n * (n - 1) * (2 * n + 5)
        tiec = defaultdict(int)
        for _, v in pts:
            tiec[v] += 1
        var18 -= sum(t * (t - 1) * (2 * t + 5) for t in tiec.values())
        for i in range(n):
            for j in range(i + 1, n):
                d = pts[j][1] - pts[i][1]
                s_stat += (d > 0) - (d < 0)
    assert row["n_days"] == n_days
    assert row["s_stat"] == s_stat
    assert row["var18"] == var18
    if abs(s_stat) <= 1:
        assert row["trend_significant"] is False
    else:
        assert row["trend_significant"] == (
            (abs(s_stat) - 1) ** 2 * 1_800_000_000 > 384_160_000 * var18
        )


def test_price_elasticity_python_recompute(spark):
    from collections import defaultdict

    rows = {
        r["brand"]: r
        for r in SPECS["price_elasticity_loglog"].fn(spark, SF_SMALL).collect()
    }
    data = (
        table(spark, SF_SMALL, "lineitem")
        .join(
            table(spark, SF_SMALL, "part").select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .selectExpr(
            "p_brand AS brand",
            "CAST(round(ln(l_extendedprice / l_quantity), 9) * 1000000000 AS BIGINT) AS x",
            "CAST(round(ln(l_quantity), 9) * 1000000000 AS BIGINT) AS y",
        )
        .collect()
    )
    m = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in data:
        a = m[r["brand"]]
        a[0] += 1
        a[1] += r["x"]
        a[2] += r["y"]
        a[3] += r["x"] * r["y"]
        a[4] += r["x"] * r["x"]
    assert set(rows) == set(m)
    for brand, (n, sx, sy, sxy, sxx) in m.items():
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        sign = -1 if num < 0 else 1
        want = sign * ((2000 * abs(num) + den) // (2 * den))
        assert rows[brand]["n"] == n
        assert rows[brand]["elasticity_milli"] == want
        # demand curves slope down: elasticity negative for every brand
        assert rows[brand]["elasticity_milli"] < 0


def test_newsvendor_python_recompute(spark):
    from collections import defaultdict

    from wheels_in_motion_analytics_spark.operators.timeseries import NV_CO, NV_CU

    row = SPECS["newsvendor_stock_level"].fn(spark, SF_SMALL).collect()[0]
    daily = defaultdict(int)
    for r in (
        table(spark, SF_SMALL, "lineitem")
        .selectExpr("CAST(l_shipdate AS DATE) AS day", "CAST(l_quantity AS BIGINT) AS q")
        .collect()
    ):
        daily[r["day"]] += r["q"]
    dem = sorted(daily.values())
    n = len(dem)
    k = -(-4 * n // 5)
    stock = dem[k - 1]
    assert (row["n_days"], row["stock"]) == (n, stock)
    under = sum(d - stock for d in dem if d > stock)
    over = sum(stock - d for d in dem if d < stock)
    served = sum(1 for d in dem if d <= stock)
    assert row["under_units"] == under and row["over_units"] == over
    assert row["service_ppm"] == (2_000_000 * served + n) // (2 * n)
    assert row["cost_at_q"] == NV_CU * under + NV_CO * over

    def cost(q):
        return NV_CU * sum(d - q for d in dem if d > q) + NV_CO * sum(
            q - d for d in dem if d < q
        )

    assert row["empirically_optimal"] == (
        cost(stock - 1) >= cost(stock) <= cost(stock + 1)
    )
    assert row["empirically_optimal"] is True


def test_hurst_python_recompute(spark):
    import math
    from collections import defaultdict
    from decimal import Decimal

    from wheels_in_motion_analytics_spark.operators.timeseries import HURST_WINDOWS

    rows = {
        r["m"]: r for r in SPECS["hurst_rescaled_range"].fn(spark, SF_SMALL).collect()
    }
    daily = defaultdict(int)
    for r in (
        table(spark, SF_SMALL, "orders")
        .selectExpr(
            "CAST(o_orderdate AS DATE) AS day",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    ):
        daily[r["day"]] += r["cents"]
    xs = [daily[d] for d in sorted(daily)]
    pts = []
    for m in HURST_WINDOWS:
        rss = []
        for b in range(len(xs) // m):
            blkv = xs[b * m : (b + 1) * m]
            sx = sum(blkv)
            sxx = sum(v * v for v in blkv)
            cum = 0
            devs = []
            for k, v in enumerate(blkv, start=1):
                cum += v
                devs.append(m * cum - k * sx)
            r_scaled = max(max(devs), 0) - min(min(devs), 0)
            rs = round(r_scaled / math.sqrt(m * sxx - sx * sx), 6)
            rss.append(rs)
        mean_rs = float(sum(Decimal(str(v)) for v in rss)) / len(rss)
        row = rows[m]
        assert row["n_blocks"] == len(rss)
        assert abs(row["mean_rs"] - mean_rs) < 1e-9
        pts.append(
            (
                int(round(math.log(m), 9) * 10**9),
                int(round(math.log(mean_rs), 9) * 10**9),
            )
        )
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx2 = sum(p[0] * p[0] for p in pts)
    num = n * sxy - sx * sy
    den = n * sxx2 - sx * sx
    sign = -1 if num < 0 else 1
    want = sign * ((2000 * abs(num) + den) // (2 * den))
    for r in rows.values():
        assert r["hurst_milli"] == want
    assert 0 < want < 1000  # H in (0, 1) for a real series


def test_theil_decomposition_python_recompute(spark):
    import math
    from collections import defaultdict

    row = SPECS["theil_inequality_decomposition"].fn(spark, SF_SMALL).collect()[0]
    cust_region = {}
    nat = {
        r["n_nationkey"]: r["n_regionkey"]
        for r in table(spark, SF_SMALL, "nation").collect()
    }
    reg = {
        r["r_regionkey"]: r["r_name"]
        for r in table(spark, SF_SMALL, "region").collect()
    }
    for r in table(spark, SF_SMALL, "customer").select("c_custkey", "c_nationkey").collect():
        cust_region[r["c_custkey"]] = reg[nat[r["c_nationkey"]]]
    per = defaultdict(int)
    for r in (
        table(spark, SF_SMALL, "orders")
        .selectExpr("o_custkey", "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
        .collect()
    ):
        per[r["o_custkey"]] += r["cents"]
    nn = len(per)
    yy = sum(per.values())

    def ln9(v):
        return int(round(math.log(v), 9) * 10**9)

    sa = sum(y * (ln9(y) + ln9(nn) - ln9(yy)) for y in per.values())
    grp = defaultdict(lambda: [0, 0])
    for k, y in per.items():
        g = grp[cust_region[k]]
        g[0] += 1
        g[1] += y
    sb = sum(
        ygrp * (ln9(ygrp) - ln9(ng) - ln9(yy) + ln9(nn))
        for ng, ygrp in grp.values()
    )

    def micro(num):
        sign = -1 if num < 0 else 1
        return sign * ((2 * abs(num) + yy * 1000) // (2 * yy * 1000))

    assert row["n_customers"] == nn
    assert row["theil_total_micro"] == micro(sa)
    assert row["theil_between_micro"] == micro(sb)
    assert row["theil_within_micro"] == micro(sa - sb)
    # inequality is nonnegative and decomposition is additive on the grid
    assert row["theil_total_micro"] >= 0
    assert (
        abs(
            row["theil_total_micro"]
            - row["theil_between_micro"]
            - row["theil_within_micro"]
        )
        <= 1
    )


def test_anova_python_recompute(spark):
    from collections import defaultdict

    row = SPECS["anova_oneway_segments"].fn(spark, SF_SMALL).collect()[0]
    g = defaultdict(lambda: [0, 0, 0])
    for r in (
        table(spark, SF_SMALL, "customer")
        .selectExpr("c_mktsegment AS seg", "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS x")
        .collect()
    ):
        a = g[r["seg"]]
        a[0] += 1
        a[1] += r["x"]
        a[2] += r["x"] * r["x"]
    k = len(g)
    nn = sum(a[0] for a in g.values())
    ss = sum(a[1] for a in g.values())
    sqn = sum((a[1] * a[1]) // a[0] for a in g.values())
    ssw = sum((a[0] * a[2] - a[1] * a[1]) // a[0] for a in g.values())
    ssb = sqn - (ss * ss) // nn
    assert (row["n_groups"], row["n_total"]) == (k, nn)
    assert row["ssb"] == str(ssb) and row["ssw"] == str(ssw)
    assert row["f_milli"] == (2000 * ssb * (nn - k) + ssw * (k - 1)) // (
        2 * ssw * (k - 1)
    )
    assert row["reject_equal_means"] == (
        ssb * (nn - k) * 10000 > 23719 * ssw * (k - 1)
    )
    # F is near the textbook float F
    means = {s: a[1] / a[0] for s, a in g.items()}
    grand = ss / nn
    ssb_f = sum(a[0] * (means[s] - grand) ** 2 for s, a in g.items())
    ssw_f = sum(a[2] - a[1] ** 2 / a[0] for a in g.values())
    f_f = (ssb_f / (k - 1)) / (ssw_f / (nn - k))
    assert abs(row["f_milli"] / 1000.0 - f_f) < 0.01 * max(1.0, abs(f_f))


def test_var_cvar_python_recompute(spark):
    from collections import defaultdict

    row = SPECS["var_cvar_revenue_changes"].fn(spark, SF_SMALL).collect()[0]
    daily = defaultdict(int)
    for r in (
        table(spark, SF_SMALL, "orders")
        .selectExpr(
            "CAST(o_orderdate AS DATE) AS day",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    ):
        daily[r["day"]] += r["cents"]
    days = sorted(daily)
    deltas = [daily[b] - daily[a] for a, b in zip(days, days[1:])]
    n = len(deltas)
    k = (n + 19) // 20
    var_c = sorted(deltas)[k - 1]
    tail = [d for d in deltas if d <= var_c]
    ts = sum(tail)
    sign = -1 if ts < 0 else 1
    assert (row["n_changes"], row["var_cents"], row["n_tail"]) == (n, var_c, len(tail))
    assert row["cvar_milli_cents"] == sign * (
        (2000 * abs(ts) + len(tail)) // (2 * len(tail))
    )
    # CVaR is at least as extreme as VaR (tail mean <= tail threshold)
    assert row["cvar_milli_cents"] <= row["var_cents"] * 1000


def test_eb_shrinkage_python_recompute_and_contraction(spark):
    from collections import defaultdict

    from wheels_in_motion_analytics_spark.functions.stats import EB_PSEUDO_M

    rows = {
        r["brand"]: r
        for r in SPECS["eb_shrunk_return_rates"].fn(spark, SF_SMALL).collect()
    }
    part_brand = {
        r["p_partkey"]: r["p_brand"]
        for r in table(spark, SF_SMALL, "part").select("p_partkey", "p_brand").collect()
    }
    g = defaultdict(lambda: [0, 0])
    for r in (
        table(spark, SF_SMALL, "lineitem").select("l_partkey", "l_returnflag").collect()
    ):
        a = g[part_brand[r["l_partkey"]]]
        a[0] += 1
        a[1] += 1 if r["l_returnflag"] == "R" else 0
    nn = sum(a[0] for a in g.values())
    ss = sum(a[1] for a in g.values())
    for brand, (n, s) in g.items():
        r = rows[brand]
        assert (r["n_lines"], r["n_returns"]) == (n, s)
        raw = (2_000_000 * s + n) // (2 * n)
        shrunk = (
            2_000_000 * (s * nn + EB_PSEUDO_M * ss) + nn * (n + EB_PSEUDO_M)
        ) // (2 * nn * (n + EB_PSEUDO_M))
        glob = (2_000_000 * ss + nn) // (2 * nn)
        assert r["raw_rate_ppm"] == raw
        assert r["shrunk_rate_ppm"] == shrunk
        assert r["global_rate_ppm"] == glob
        # shrinkage contracts toward the global rate (up to 1ppm rounding)
        assert abs(shrunk - glob) <= abs(raw - glob) + 1


def test_gumbel_python_recompute(spark):
    import math
    from collections import defaultdict

    from wheels_in_motion_analytics_spark.operators.timeseries import (
        _GUM_EULER,
        _GUM_SQRT6_PI,
        _GUM_Y100,
    )

    row = SPECS["gumbel_block_maxima_fit"].fn(spark, SF_SMALL).collect()[0]
    daily = defaultdict(int)
    for r in (
        table(spark, SF_SMALL, "orders")
        .selectExpr(
            "CAST(o_orderdate AS DATE) AS day",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    ):
        daily[r["day"]] += r["cents"]
    mx = defaultdict(int)
    for day, v in daily.items():
        key = (day.year, day.month)
        mx[key] = max(mx[key], v)
    vals = list(mx.values())
    n = len(vals)
    s = sum(vals)
    s2 = sum(v * v for v in vals)
    mean = s / n
    sigma = math.sqrt(n * s2 - s * s) / n
    beta = sigma * _GUM_SQRT6_PI
    mu = mean - _GUM_EULER * beta
    assert row["n_blocks"] == n
    assert abs(row["mu_cents"] - round(mu, 4)) < 1e-6
    assert abs(row["beta_cents"] - round(beta, 4)) < 1e-6
    assert abs(row["return_level_100_cents"] - round(mu + _GUM_Y100 * beta, 4)) < 1e-6
    # the 100-block return level must exceed the observed mean and mu
    assert row["return_level_100_cents"] > row["mu_cents"] > 0


def test_ccf_python_recompute_and_lag0_is_kendall_pair(spark):
    from collections import defaultdict
    from datetime import timedelta
    from math import isqrt

    rows = {
        r["lag"]: r
        for r in SPECS["ccf_count_revenue_daily"].fn(spark, SF_SMALL).collect()
    }
    assert set(rows) == set(range(-7, 8))
    daily = defaultdict(lambda: [0, 0])
    for r in (
        table(spark, SF_SMALL, "orders")
        .selectExpr(
            "CAST(o_orderdate AS DATE) AS day",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    ):
        daily[r["day"]][0] += 1
        daily[r["day"]][1] += r["cents"]
    for lag in (-3, 0, 5):
        pts = []
        for day, (x, _y) in daily.items():
            other = day + timedelta(days=lag)
            if other in daily:
                pts.append((x, daily[other][1]))
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        syy = sum(p[1] * p[1] for p in pts)
        num = n * sxy - sx * sy
        dxx = n * sxx - sx * sx
        dyy = n * syy - sy * sy
        a, b = isqrt(dxx), isqrt(dyy)
        sign = -1 if num < 0 else 1
        want = sign * ((2 * abs(num) * 10**6 + a * b) // (2 * a * b))
        assert rows[lag]["n_pairs"] == n
        assert rows[lag]["ccf_ppm"] == want
    # symmetry of pair counts: n(k) == n(-k)
    for k in range(1, 8):
        assert rows[k]["n_pairs"] == rows[-k]["n_pairs"]


def test_max_studentized_deviate_python_recompute(spark):
    import math
    from collections import defaultdict
    from math import isqrt

    row = SPECS["max_studentized_deviate_day"].fn(spark, SF_SMALL).collect()[0]
    daily = defaultdict(int)
    for r in (
        table(spark, SF_SMALL, "orders")
        .selectExpr(
            "CAST(o_orderdate AS DATE) AS day",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    ):
        daily[r["day"]] += r["cents"]
    n = len(daily)
    s = sum(daily.values())
    s2 = sum(v * v for v in daily.values())
    best = max(daily.items(), key=lambda kv: (abs(kv[1] * n - s), -kv[0].toordinal()))
    ds = abs(best[1] * n - s)
    assert row["flagged_day"] == best[0]
    assert row["n_days"] == n
    dxx = n * s2 - s * s
    a = isqrt(dxx)
    want = (2 * ds * 10**6 + a) // (2 * a)
    assert row["g_ppm"] == want
    assert row["beyond_3_sigma"] == (ds * ds > 9 * dxx)
    # ppm value close to the float G
    g_float = (ds / n) / math.sqrt(dxx / n / n)
    assert abs(row["g_ppm"] / 1e6 - g_float) < 1e-4


def test_odds_ratio_python_recompute(spark):
    import math

    row = SPECS["odds_ratio_segment_status"].fn(spark, SF_SMALL).collect()[0]
    cust = {
        r["c_custkey"]: r["c_mktsegment"] == "AUTOMOBILE"
        for r in table(spark, SF_SMALL, "customer").select("c_custkey", "c_mktsegment").collect()
    }
    a = b = c = d = 0
    for r in table(spark, SF_SMALL, "orders").select("o_custkey", "o_orderstatus").collect():
        seg = cust[r["o_custkey"]]
        pos = r["o_orderstatus"] == "F"
        if seg and pos:
            a += 1
        elif seg:
            b += 1
        elif pos:
            c += 1
        else:
            d += 1
    assert (row["n_seg_pos"], row["n_seg_neg"], row["n_rest_pos"], row["n_rest_neg"]) == (a, b, c, d)
    assert row["or_milli"] == (2000 * a * d + b * c) // (2 * b * c)
    lor = math.log(a * d / (b * c))
    se = math.sqrt((b * c * d + a * c * d + a * b * d + a * b * c) / a / b / c / d)
    assert abs(row["ci_low"] - round(math.exp(lor - 1.96 * se), 6)) < 1e-9
    assert abs(row["ci_high"] - round(math.exp(lor + 1.96 * se), 6)) < 1e-9
    assert row["ci_low"] < row["or_milli"] / 1000.0 < row["ci_high"]


def test_logrank_python_recompute(spark):
    from collections import defaultdict

    from wheels_in_motion_analytics_spark.functions.stats import (
        LOGRANK_G0,
        LOGRANK_G1,
    )

    row = SPECS["logrank_ship_latency_groups"].fn(spark, SF_SMALL).collect()[0]
    first_ship = {}
    for r in (
        table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_shipdate").collect()
    ):
        k = r["l_orderkey"]
        if k not in first_ship or r["l_shipdate"] < first_ship[k]:
            first_ship[k] = r["l_shipdate"]
    subjects = []
    for r in (
        table(spark, SF_SMALL, "orders")
        .where(F.col("o_orderpriority").isin(LOGRANK_G1, LOGRANK_G0))
        .select("o_orderkey", "o_orderdate", "o_orderstatus", "o_orderpriority")
        .collect()
    ):
        if r["o_orderkey"] in first_ship:
            dur = (first_ship[r["o_orderkey"]].date() - r["o_orderdate"].date()).days if hasattr(first_ship[r["o_orderkey"]], 'date') else (first_ship[r["o_orderkey"]] - r["o_orderdate"]).days
            subjects.append(
                (
                    1 if r["o_orderpriority"] == LOGRANK_G1 else 0,
                    dur,
                    1 if r["o_orderstatus"] != "O" else 0,
                )
            )
    grain = defaultdict(lambda: [0, 0, 0, 0])  # d1, d, m1, m
    for g, dur, ev in subjects:
        a = grain[dur]
        a[0] += g * ev
        a[1] += ev
        a[2] += g
        a[3] += 1
    t1 = sum(g for g, _, _ in subjects)
    tt = len(subjects)
    cum1 = cum = 0
    o1 = e1m = vm = 0
    for dur in sorted(grain):
        d1, d, m1, m = grain[dur]
        n1 = t1 - cum1
        n = tt - cum
        if d > 0:
            o1 += d1
            e1m += (2 * d * n1 * 10**6 + n) // (2 * n)
            if n > 1:
                vm += (
                    2 * d * n1 * (n - n1) * (n - d) * 10**6 + n * n * (n - 1)
                ) // (2 * n * n * (n - 1))
        cum1 += m1
        cum += m
    assert row["observed_g1"] == o1
    assert row["expected_g1_micro"] == e1m
    assert row["variance_micro"] == vm
    u = o1 * 10**6 - e1m
    sign = -1 if u < 0 else 1
    assert row["chi2_milli"] == sign * (
        (2000 * abs(u) * abs(u) + 10**6 * vm) // (2 * 10**6 * vm)
    )
    assert row["survival_differs"] == (abs(u) * abs(u) * 10000 > 38416000000 * vm)


def test_poisson_rate_ratio_python_recompute(spark):
    rows = table(spark, SF_SMALL, "orders").selectExpr("year(o_orderdate) AS y").collect()
    n1 = sum(1 for r in rows if r["y"] == 1996)
    n2 = sum(1 for r in rows if r["y"] == 1997)
    nn = n1 + n2
    row = SPECS["poisson_rate_ratio_periods"].fn(spark, SF_SMALL).collect()[0]
    assert (row["n_1996"], row["n_1997"]) == (n1, n2)
    assert row["rate_ratio_milli"] == (2000 * n1 * 365 + n2 * 366) // (2 * n2 * 366)
    d = n1 * 731 - nn * 366
    assert row["rate_changed"] == (d * d * 10000 > 38416 * nn * 366 * 365)
