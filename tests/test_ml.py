"""ML-primitive operators (functions/ml.py) plus the session's sibling
additions: Python-exact parity checks (independent of the DuckDB oracle)
and plan-shape pins for the scale-critical properties."""

from __future__ import annotations

import hashlib
from fractions import Fraction

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from wheels_in_motion_analytics_spark.registry import load_all_queries
from wheels_in_motion_analytics_spark.tables import table

SPECS = load_all_queries()


def _run(spark, name):
    return SPECS[name].fn(spark, SF_SMALL)


# ---------------------------------------------------------------------------
# decision_stump_best_split: exhaustive Python re-derivation
# ---------------------------------------------------------------------------


def test_stump_matches_exhaustive_python(spark):
    rows = (
        table(spark, SF_SMALL, "orders")
        .select(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
            (F.col("o_orderstatus") == "F").cast("int").alias("pos"),
        )
        .collect()
    )
    lo = min(r.cents for r in rows)
    hi = max(r.cents for r in rows)
    hist: dict[int, list[int]] = {}
    for r in rows:
        b = (r.cents - lo) * 256 // (hi - lo + 1)
        n, p = hist.get(b, (0, 0))
        hist[b] = (n + 1, p + r.pos)
    nt = sum(n for n, _ in hist.values())
    pt = sum(p for _, p in hist.values())
    best = None
    nl = pl = 0
    for b in sorted(hist):
        n, p = hist[b]
        nl, pl = nl + n, pl + p
        if nl == 0 or nt - nl == 0:
            continue
        nr, pr = nt - nl, pt - pl
        a = (pl * pl + (nl - pl) * (nl - pl)) * nr + (
            pr * pr + (nr - pr) * (nr - pr)
        ) * nl
        score = a * 1_000_000 // (nl * nr)
        key = (-score, b)
        if best is None or key < best[0]:
            best = (key, b, nl, pl, nr, pr, score)
    got = _run(spark, "decision_stump_best_split").collect()[0]
    _, b, nl, pl, nr, pr, score = best
    assert got.split_bin == b
    assert got.threshold_cents == lo + (b + 1) * (hi - lo + 1) // 256
    assert (got.n_left, got.pos_left, got.n_right, got.pos_right) == (nl, pl, nr, pr)
    assert got.score_micro == score


# ---------------------------------------------------------------------------
# feature_hashing_trick: md5 parity with hashlib + conservation
# ---------------------------------------------------------------------------


def test_feature_hashing_conserves_tokens_and_matches_hashlib(spark):
    out = _run(spark, "feature_hashing_trick").collect()
    docs = (
        table(spark, SF_SMALL, "documents")
        .select("lang", F.lower("text").alias("t"))
        .collect()
    )
    expect: dict[tuple[str, int], list[int]] = {}
    for r in docs:
        for tok in r.t.split():
            hv = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            k = (r.lang, hv % 64)
            sgn = 1 if (hv // 64) % 2 == 0 else -1
            f0, n0 = expect.get(k, (0, 0))
            expect[k] = (f0 + sgn, n0 + 1)
    got = {(r.lang, r.bucket): (r.feat_val, r.n_tokens) for r in out}
    assert got == expect


# ---------------------------------------------------------------------------
# target_encoding_smoothed: Fraction re-derivation
# ---------------------------------------------------------------------------


def test_target_encoding_ppm_exact(spark):
    out = _run(spark, "target_encoding_smoothed").collect()
    gn = sum(r.n_rows for r in out)
    gs = sum(r.n_pos for r in out)
    for r in out:
        enc = Fraction(r.n_pos + Fraction(20 * gs, gn), r.n_rows + 20)
        # half-up ppm
        want = (2 * 1_000_000 * enc.numerator + enc.denominator) // (
            2 * enc.denominator
        )
        assert r.enc_ppm == want, r.brand


# ---------------------------------------------------------------------------
# fuzzy_lookup_best_match: brute-force over the (small) name dictionary
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_lookup_matches_bruteforce(spark):
    names = sorted(
        r.name
        for r in table(spark, SF_SMALL, "part")
        .select(F.col("p_name").alias("name"))
        .where(F.length("name") >= 6)
        .distinct()
        .collect()
    )
    probes = [
        n[:4] + n[5:]
        for n in names
        if int(hashlib.md5(n.encode()).hexdigest()[:15], 16) % 3 == 0
    ]
    expect = {}
    for p in probes:
        cands = [
            (_lev(p, n), n)
            for n in names
            if n[:4] == p[:4] and abs(len(n) - len(p)) <= 2
        ]
        cands = [(d, n) for d, n in cands if d <= 2]
        if cands:
            expect[p] = min(cands)
    got = {r.probe: (r.dist, r.matched_name) for r in
           _run(spark, "fuzzy_lookup_best_match").collect()}
    assert got == expect
    assert expect, "probe derivation selected no names"


# ---------------------------------------------------------------------------
# key_skew_profile: Fraction Gini re-derivation
# ---------------------------------------------------------------------------


def test_key_skew_gini_exact(spark):
    counts = sorted(
        ((r.c, r.k) for r in
         table(spark, SF_SMALL, "lineitem")
         .groupBy(F.col("l_suppkey").alias("k"))
         .agg(F.count(F.lit(1)).alias("c"))
         .collect())
    )
    kk = len(counts)
    t = sum(c for c, _ in counts)
    mx = max(c for c, _ in counts)
    s = sum(i * c for i, (c, _) in enumerate(counts, 1))
    gini = Fraction(2 * s - (kk + 1) * t, kk * t)
    want_gini = (2 * 1_000_000 * gini.numerator + gini.denominator) // (
        2 * gini.denominator
    )
    skew = Fraction(mx * kk, t)
    want_skew = (2 * 1_000_000 * skew.numerator + skew.denominator) // (
        2 * skew.denominator
    )
    got = _run(spark, "key_skew_profile").collect()[0]
    assert (got.n_keys, got.total_rows, got.max_key_rows) == (kk, t, mx)
    assert got.top_key == min(k for c, k in counts if c == mx)
    assert got.gini_ppm == want_gini
    assert got.skew_ratio_ppm == want_skew
    assert 0 <= got.gini_ppm <= 1_000_000


# ---------------------------------------------------------------------------
# shard_assignment_by_budget: Python recompute + budget property
# ---------------------------------------------------------------------------


def test_shard_assignment_recompute(spark):
    docs = (
        table(spark, SF_SMALL, "documents")
        .select("doc_id", F.lower("text").alias("t"))
        .collect()
    )
    order = sorted(
        (hashlib.md5(f"shard:{r.doc_id}".encode()).hexdigest(), r.doc_id,
         len(r.t.split()))
        for r in docs
    )
    expect: dict[int, list[int]] = {}
    cum = 0
    for _, _, tn in order:
        cum += tn
        sh = (max(cum, 1) - 1) // 1024
        n0, t0 = expect.get(sh, (0, 0))
        expect[sh] = (n0 + 1, t0 + tn)
    got = {r.shard: (r.n_docs, r.shard_tokens)
           for r in _run(spark, "shard_assignment_by_budget").collect()}
    assert got == expect
    # shards are contiguous from 0 and (except the last) carry >0 docs
    assert sorted(got) == list(range(len(got)))


# ---------------------------------------------------------------------------
# gap_fill_linear_interpolate: endpoints exact, interiors bracketed
# ---------------------------------------------------------------------------


def test_linear_interpolation_recompute(spark):
    out = {r.day: (r.cents, r.interpolated)
           for r in _run(spark, "gap_fill_linear_interpolate").collect()}
    obs = {
        r.day: r.cents
        for r in table(spark, SF_SMALL, "orders")
        .where((F.col("o_orderpriority") == "1-URGENT")
               & (F.col("o_orderstatus") == "F"))
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                   .cast("bigint")).alias("cents"))
        .collect()
    }
    days = sorted(out)
    known = sorted(obs)
    assert days[0] == known[0] and days[-1] == known[-1]
    assert (days[-1] - days[0]).days + 1 == len(days)
    import bisect

    interpolated_seen = 0
    for d in days:
        cents, interp = out[d]
        if d in obs:
            assert not interp and cents == obs[d]
            continue
        interpolated_seen += 1
        i = bisect.bisect_left(known, d)
        pd_, nd_ = known[i - 1], known[i]
        gap = (nd_ - pd_).days
        off = (d - pd_).days
        num = obs[pd_] * (gap - off) + obs[nd_] * off
        assert cents == (2 * num + gap) // (2 * gap)
    assert interpolated_seen > 0, "fixture has no gaps to interpolate"


# ---------------------------------------------------------------------------
# plan-shape pins
# ---------------------------------------------------------------------------


def _plan(spark, name: str) -> str:
    return (
        SPECS[name]
        .fn(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_stump_histogram_is_partial_final_no_sort(spark):
    """The histogram fold must partial-aggregate map-side and nothing may
    sort the fact scan — the defining properties of the GBDT histogram
    algorithm at scale."""
    plan = _plan(spark, "decision_stump_best_split")
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_target_encoding_broadcasts_dim(spark):
    plan = _plan(spark, "target_encoding_smoothed")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fuzzy_lookup_no_cartesian(spark):
    """Blocking must surface as an equi-join — never a cartesian/BNLJ over
    the dictionary."""
    plan = _plan(spark, "fuzzy_lookup_best_match")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_key_skew_profile_no_single_partition_sort(spark):
    """The Gini rank must ride the two-phase range rank — a SinglePartition
    exchange is allowed only as a scalar partial-agg merge (same rule as
    test_two_phase_rank_queries_have_no_single_partition_stage)."""
    plan = _plan(spark, "key_skew_profile")
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        below = "\n".join(lines[i + 1 : i + 3])
        assert "partial_" in below, plan[:2000]


# ---------------------------------------------------------------------------
# ML evaluation suite: Python re-derivations
# ---------------------------------------------------------------------------


def _orders_scored(spark):
    return [
        (r.cents, r.pos)
        for r in table(spark, SF_SMALL, "orders")
        .select(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
            (F.col("o_orderstatus") == "F").cast("int").alias("pos"),
        )
        .collect()
    ]


def test_auc_matches_pairwise_definition(spark):
    """AUC == P(score_pos > score_neg) + 0.5·P(tie), computed directly from
    the pairwise definition via per-value counts."""
    rows = _orders_scored(spark)
    from collections import Counter

    pos = Counter(c for c, p in rows if p == 1)
    neg = Counter(c for c, p in rows if p == 0)
    n1 = sum(pos.values())
    n0 = sum(neg.values())
    wins_x2 = 0
    neg_sorted = sorted(neg.items())
    import bisect

    keys = [k for k, _ in neg_sorted]
    cums = []
    acc = 0
    for _, c in neg_sorted:
        acc += c
        cums.append(acc)
    for v, cp in pos.items():
        i = bisect.bisect_left(keys, v)
        below = cums[i - 1] if i > 0 else 0
        tie = neg[v] if v in neg else 0
        wins_x2 += cp * (2 * below + tie)
    want_ppm = (2 * 1_000_000 * wins_x2 + 2 * n1 * n0) // (4 * n1 * n0)
    got = SPECS["auc_rank_ppm"].fn(spark, SF_SMALL).collect()[0]
    assert (got.n_pos, got.n_neg) == (n1, n0)
    assert got.u_x2 == wins_x2  # doubled rank-U equals doubled pairwise wins
    assert got.auc_ppm == want_ppm


def test_threshold_metrics_fraction_exact(spark):
    rows = _orders_scored(spark)
    s = sum(c for c, _ in rows)
    n = len(rows)
    tp = sum(1 for c, p in rows if c * n > s and p == 1)
    fp = sum(1 for c, p in rows if c * n > s and p == 0)
    fn = sum(1 for c, p in rows if c * n <= s and p == 1)
    tn = sum(1 for c, p in rows if c * n <= s and p == 0)

    def ppm(num, den):
        return (2 * 1_000_000 * num + den) // (2 * den)

    got = SPECS["classification_threshold_metrics"].fn(spark, SF_SMALL).collect()[0]
    assert (got.tp, got.fp, got.fn, got.tn) == (tp, fp, fn, tn)
    assert got.precision_ppm == ppm(tp, tp + fp)
    assert got.recall_ppm == ppm(tp, tp + fn)
    assert got.f1_ppm == ppm(2 * tp, 2 * tp + fp + fn)


def test_calibration_bins_partition_rows(spark):
    rows = SPECS["calibration_reliability_bins"].fn(spark, SF_SMALL).collect()
    total = sum(r.n for r in rows)
    assert total == len(_orders_scored(spark))
    for r in rows:
        assert 0 <= r.bin < 10
        assert 0 <= r.n_pos <= r.n
        want = (2 * 1_000_000 * r.n_pos + r.n) // (2 * r.n)
        assert r.pos_rate_ppm == want


# ---------------------------------------------------------------------------
# logreg Newton step / skipgram / Naive Bayes parity
# ---------------------------------------------------------------------------


def test_logreg_newton_step_fraction_exact(spark):
    """Re-derive the Newton step with Python exact integers and compare the
    ppm-canonicalized coefficients."""
    li = (
        table(spark, SF_SMALL, "lineitem")
        .select(
            F.col("l_quantity").cast("bigint").alias("x1"),
            F.floor(F.col("l_discount") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("x2"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(-1).alias("z"),
        )
        .collect()
    )
    n = len(li)
    s1 = sum(r.x1 for r in li)
    s2 = sum(r.x2 for r in li)
    s11 = sum(r.x1 * r.x1 for r in li)
    s12 = sum(r.x1 * r.x2 for r in li)
    s22 = sum(r.x2 * r.x2 for r in li)
    t0 = sum(r.z for r in li)
    t1 = sum(r.x1 * r.z for r in li)
    t2 = sum(r.x2 * r.z for r in li)
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    d0 = (
        t0 * (s11 * s22 - s12 * s12)
        - s1 * (t1 * s22 - s12 * t2)
        + s2 * (t1 * s12 - s11 * t2)
    )
    d1 = (
        n * (t1 * s22 - s12 * t2)
        - t0 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * t2 - t1 * s2)
    )
    d2 = (
        n * (s11 * t2 - t1 * s12)
        - s1 * (s1 * t2 - t1 * s2)
        + t0 * (s1 * s12 - s11 * s2)
    )
    assert det > 0  # X'X positive definite

    def ppm(d):
        s = -1 if d < 0 else 1
        return s * ((2_000_000 * 2 * abs(d) + det) // (2 * det))

    got = _run(spark, "logreg_newton_step").collect()[0]
    assert got.n_rows == n
    assert (got.beta0_ppm, got.beta1_ppm, got.beta2_ppm) == (
        ppm(d0), ppm(d1), ppm(d2),
    )
    # sanity: beta = 2*(X'X)^-1 X'z reproduced by numpy within float noise
    import numpy as np

    xtx = np.array([[n, s1, s2], [s1, s11, s12], [s2, s12, s22]], dtype=float)
    xtz = np.array([t0, t1, t2], dtype=float)
    beta = 2 * np.linalg.solve(xtx, xtz)
    for got_ppm, b in zip(
        (got.beta0_ppm, got.beta1_ppm, got.beta2_ppm), beta
    ):
        assert abs(got_ppm / 1e6 - b) < 1e-5


def test_skipgram_pairs_recompute(spark):
    from collections import Counter

    docs = (
        table(spark, SF_SMALL, "documents")
        .select(F.lower("text").alias("t"))
        .collect()
    )
    c = Counter()
    for r in docs:
        ws = r.t.split()
        for i, w in enumerate(ws):
            for k in (1, 2):
                if i + k < len(ws):
                    c[(w, ws[i + k])] += 1
    want = sorted(
        ((-n, a, b) for (a, b), n in c.items())
    )[:50]
    got = sorted(
        (-r.n_pairs, r.center, r.context)
        for r in _run(spark, "skipgram_training_pairs").collect()
    )
    assert got == want


def test_naive_bayes_model_recompute(spark):
    import math
    from collections import Counter

    docs = (
        table(spark, SF_SMALL, "documents")
        .select("lang", F.lower("text").alias("t"))
        .collect()
    )
    vocab = set()
    cls_tokens = Counter()
    cnt = Counter()
    n_docs = Counter()
    for r in docs:
        n_docs[r.lang] += 1
        ws = r.t.split()
        cls_tokens[r.lang] += len(ws)
        for w in ws:
            vocab.add(w)
            if w in ("hash", "join", "vector", "stream"):
                cnt[(r.lang, w)] += 1
    v = len(vocab)
    total_docs = sum(n_docs.values())
    rows = _run(spark, "naive_bayes_token_model").collect()
    assert len(rows) == 4 * len(n_docs)
    for r in rows:
        c = cnt.get((r.lang, r.token), 0)
        assert r.cnt == c
        assert r.class_tokens == cls_tokens[r.lang]
        assert r.token_ll == round(
            math.log((c + 1) / (cls_tokens[r.lang] + v)), 9
        )
        assert r.prior_ll == round(
            math.log(n_docs[r.lang] / total_docs), 9
        )


# ---------------------------------------------------------------------------
# PR curve / chi2 selection / group k-fold parity
# ---------------------------------------------------------------------------


def test_pr_curve_recompute(spark):
    rows = _orders_scored(spark)
    lo = min(c for c, _ in rows)
    hi = max(c for c, _ in rows)
    hist = {}
    for c, p in rows:
        b = (c - lo) * 10 // (hi - lo + 1)
        n0, p0 = hist.get(b, (0, 0))
        hist[b] = (n0 + 1, p0 + p)
    pt = sum(p for _, p in hist.values())

    def ppm(num, den):
        return (2 * 1_000_000 * num + den) // (2 * den)

    got = {r.threshold_bin: r
           for r in _run(spark, "pr_curve_points").collect()}
    for t in range(1, 10):
        tp = sum(p for b, (_, p) in hist.items() if b >= t)
        fp = sum(n - p for b, (n, p) in hist.items() if b >= t)
        if tp + fp == 0:
            assert t not in got
            continue
        r = got[t]
        assert (r.tp, r.fp) == (tp, fp)
        assert r.precision_ppm == ppm(tp, tp + fp)
        assert r.recall_ppm == ppm(tp, pt)
    # recall is monotone non-increasing in the threshold
    ts = sorted(got)
    recalls = [got[t].recall_ppm for t in ts]
    assert recalls == sorted(recalls, reverse=True)


def test_chi2_selection_recompute(spark):
    docs = (
        table(spark, SF_SMALL, "documents")
        .select("doc_id", (F.col("lang") == "en").cast("int").alias("y"),
                F.lower("text").alias("t"))
        .collect()
    )
    n = len(docs)
    npos = sum(r.y for r in docs)
    from collections import Counter

    df = Counter()
    a = Counter()
    for r in docs:
        for tok in set(r.t.split()):
            df[tok] += 1
            if r.y:
                a[tok] += 1
    scored = []
    for tok, dfc in df.items():
        if dfc < 20:
            continue
        aa = a.get(tok, 0)
        b = dfc - aa
        c = npos - aa
        dd = n - npos - b
        den = (aa + b) * (c + dd) * (aa + c) * (b + dd)
        if den <= 0:
            continue
        num = n * (aa * dd - b * c) ** 2
        chi2 = (2 * num * 1_000_000 + den) // (2 * den)
        scored.append((-chi2, tok, dfc))
    want = sorted(scored)[:25]
    got = [(-r.chi2_micro, r.token, r.df)
           for r in _run(spark, "chi2_feature_selection").collect()]
    assert sorted(got) == want


def test_group_kfold_no_leakage(spark):
    rows = _run(spark, "group_kfold_assignment").collect()
    assert sorted(r.fold for r in rows) == list(range(5))
    orders = table(spark, SF_SMALL, "orders").select("o_custkey").collect()
    custs = {r.o_custkey for r in orders}
    # every customer maps to exactly one fold by construction; totals agree
    assert sum(r.n_orders for r in rows) == len(orders)
    assert sum(r.n_customers for r in rows) == len(custs)


def test_logreg_single_aggregate_scan(spark):
    """The Newton step must be ONE partial+final moment aggregate over the
    scan (same contract as test_linreg_single_aggregate_scan) — the 3x3
    Cramer solve lives on the 1-row relation."""
    plan = _plan(spark, "logreg_newton_step")
    assert plan.count("HashAggregate") >= 2
    for op in ("SortMergeJoin", "BroadcastHashJoin", "Sort "):
        assert op not in plan, f"unexpected {op} in logreg plan"


# ---------------------------------------------------------------------------
# kappa / learning curve / rendezvous invariants
# ---------------------------------------------------------------------------


def test_cohens_kappa_bounds_and_recompute(spark):
    from fractions import Fraction as Fr

    r = _run(spark, "cohens_kappa_langid").collect()[0]
    assert 0 < r.n_agree <= r.n_docs
    assert -1_000_000 <= r.kappa_ppm <= 1_000_000
    # accuracy from counts
    acc = Fr(r.n_agree, r.n_docs)
    assert r.accuracy_ppm == (2 * 10**6 * acc.numerator + acc.denominator) // (
        2 * acc.denominator
    )
    # kappa <= accuracy scaled (chance >= 0 implies kappa <= po)
    assert r.kappa_ppm <= r.accuracy_ppm


def test_learning_curve_tiers_nested_monotone(spark):
    rows = {r.tier_pct: r for r in
            _run(spark, "learning_curve_nested_samples").collect()}
    assert sorted(rows) == [12, 25, 50, 100]
    ns = [rows[p].n_rows for p in (12, 25, 50, 100)]
    revs = [rows[p].revenue_cents for p in (12, 25, 50, 100)]
    assert ns == sorted(ns) and revs == sorted(revs)  # nested => monotone
    total = table(spark, SF_SMALL, "orders").count()
    assert rows[100].n_rows == total  # 100% tier is the full corpus
    # tier sizes are near their nominal fractions (md5 uniformity)
    for p in (12, 25, 50):
        frac = rows[p].n_rows / total
        assert abs(frac - p / 100) < 0.08


def test_rendezvous_rebalance_invariant(spark):
    r = _run(spark, "rendezvous_shard_rebalance").collect()[0]
    # THE consistent-hashing guarantee: moved keys move ONLY to the new shard
    assert r.n_moved_elsewhere == 0
    # and the moved fraction is ~1/8 (exact expectation under uniformity)
    assert abs(r.moved_ppm / 1e6 - 1 / 8) < 0.05
    assert r.n_keys == table(spark, SF_SMALL, "orders").count()


def test_fairness_audit_python_recompute(spark):
    from wheels_in_motion_analytics_spark.functions.ml import FAIR_MIN_CHARS

    specs = load_all_queries()
    out = {r["lang"]: r for r in specs["fairness_selection_rate_audit"].fn(spark, SF_SMALL).collect()}
    docs = table(spark, SF_SMALL, "documents").select("lang", "n_chars").collect()
    agg: dict[str, list[int]] = {}
    for r in docs:
        n, s = agg.get(r["lang"], [0, 0])
        agg[r["lang"]] = [n + 1, s + (1 if r["n_chars"] >= FAIR_MIN_CHARS else 0)]
    n_tot = sum(v[0] for v in agg.values())
    sel_tot = sum(v[1] for v in agg.values())
    def hup(a, b):
        return (2 * a + b) // (2 * b)
    mx_lang = min(agg, key=lambda k: (-(agg[k][1] * 1_000_000 // agg[k][0]), k))
    n_max, sel_max = agg[mx_lang]
    assert set(out) == set(agg)
    for lang, (n, s) in agg.items():
        row = out[lang]
        assert row["n_docs"] == n and row["n_sel"] == s
        assert row["rate_ppm"] == hup(s * 1_000_000, n)
        assert row["parity_gap_ppm"] == hup(s * 1_000_000, n) - hup(sel_tot * 1_000_000, n_tot)
        di = hup(s * n_max * 1_000_000, n * sel_max)
        assert row["di_ratio_ppm"] == di
        assert row["passes_four_fifths"] == (di >= 800_000)


def test_gbdt_two_round_python_recompute(spark):
    """Exact integer re-derivation of both boosting rounds (F0, split
    argmax by normalized variance reduction, half-up leaf means, residual
    update) from the raw rows."""
    specs = load_all_queries()
    out = {r["round"]: r for r in specs["gbdt_two_round_regression"].fn(spark, SF_SMALL).collect()}
    rows = (
        table(spark, SF_SMALL, "lineitem")
        .selectExpr(
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * 1000 AS y",
            "CAST(l_quantity AS BIGINT) AS q",
            "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d",
        )
        .collect()
    )
    n = len(rows)
    f0 = (2 * sum(r["y"] for r in rows) + n) // (2 * n)

    def hup_signed(s, m):
        return -((2 * (-s) + m) // (2 * m)) if s < 0 else (2 * s + m) // (2 * m)

    def best(data, feat):
        from collections import defaultdict

        agg = defaultdict(lambda: [0, 0])
        for fv, r in data:
            agg[fv][0] += 1
            agg[fv][1] += r
        nt = sum(v[0] for v in agg.values())
        st = sum(v[1] for v in agg.values())
        nl = sl = 0
        cand = []
        for fv in sorted(agg):
            nl += agg[fv][0]
            sl += agg[fv][1]
            nr, sr = nt - nl, st - sl
            if nl and nr:
                score = (sl * sl * nr + sr * sr * nl) // (nl * nr * nt)
                cand.append((score, -fv, fv, nl, nr, sl, sr))
        score, _, fv, nl, nr, sl, sr = max(cand)
        return fv, nl, nr, hup_signed(sl, nl), hup_signed(sr, nr), score

    r1 = [(r["q"], r["y"] - f0) for r in rows]
    t1, nl1, nr1, gl1, gr1, sc1 = best(r1, "q")
    row1 = out[1]
    assert (row1["split_at"], row1["n_left"], row1["n_right"]) == (t1, nl1, nr1)
    assert (row1["leaf_left_milli"], row1["leaf_right_milli"]) == (gl1, gr1)
    assert row1["score_per_row"] == sc1
    r2 = [(r["d"], (r["y"] - f0) - (gl1 if r["q"] <= t1 else gr1)) for r in rows]
    t2, nl2, nr2, gl2, gr2, sc2 = best(r2, "d")
    row2 = out[2]
    assert (row2["split_at"], row2["n_left"], row2["n_right"]) == (t2, nl2, nr2)
    assert (row2["leaf_left_milli"], row2["leaf_right_milli"]) == (gl2, gr2)
    assert row2["score_per_row"] == sc2


def test_feature_store_no_leakage(spark):
    """Point-in-time contract: every feature must be reproducible from
    STRICTLY-PRIOR rows only (python replay over the full per-customer
    history)."""
    from collections import defaultdict

    specs = load_all_queries()
    out = {
        r["order_key"]: r
        for r in specs["feature_store_training_set"].fn(spark, SF_SMALL).collect()
    }
    hist = defaultdict(list)
    for r in (
        table(spark, SF_SMALL, "orders")
        .where(F.col("o_custkey") % 10 == 7)
        .selectExpr(
            "o_orderkey AS k",
            "o_custkey AS cust",
            "CAST(o_orderdate AS DATE) AS d",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    ):
        hist[r["cust"]].append((r["d"], r["k"], r["cents"]))
    for cust, rows in hist.items():
        rows.sort()
        for i, (d, k, cents) in enumerate(rows):
            if i >= 3 or k not in out:
                continue
            row = out[k]
            prior = rows[:i]
            assert row["prior_orders"] == len(prior)
            assert row["prior_spend_cents"] == sum(p[2] for p in prior)
            assert row["spend_90d_cents"] == sum(
                p[2] for p in prior if 1 <= (d - p[0]).days <= 90
            )
            assert row["days_since_prev"] == (
                (d - prior[-1][0]).days if prior else None
            )


def test_pinball_loss_python_recompute(spark):
    """Exact replay: md5 split, type-1 quantile fit on the calibration
    half, 4-scaled pinball loss on the held-out half."""
    import hashlib
    from collections import defaultdict

    specs = load_all_queries()
    out = {
        (r["prio"], r["q_pct"]): r
        for r in specs["pinball_loss_quantile_eval"].fn(spark, SF_SMALL).collect()
    }
    rows = (
        table(spark, SF_SMALL, "orders")
        .selectExpr(
            "o_orderkey AS k",
            "o_orderpriority AS prio",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    )
    cal, test = defaultdict(list), defaultdict(list)
    for r in rows:
        is_cal = int(hashlib.md5(f"pin:{r['k']}".encode()).hexdigest()[:15], 16) % 2 == 0
        (cal if is_cal else test)[r["prio"]].append(r["cents"])
    for prio, vals in cal.items():
        vals.sort()
        n = len(vals)
        for q_pct, rank in ((25, (n + 3) // 4), (75, (3 * n + 3) // 4)):
            yhat = vals[rank - 1]
            row = out[(prio, q_pct)]
            assert row["yhat_cents"] == yhat
            w_above = 1 if q_pct == 25 else 3
            w_below = 3 if q_pct == 25 else 1
            losses = [
                w_above * (y - yhat) if y >= yhat else w_below * (yhat - y)
                for y in test[prio]
            ]
            assert row["n_test"] == len(losses)
            assert row["total_loss4"] == sum(losses)
            assert row["mean_loss4_milli"] == (
                2 * sum(losses) * 1000 + len(losses)
            ) // (2 * len(losses))


def test_woe_iv_counts_and_total(spark):
    rows = SPECS["woe_iv_feature_audit"].fn(spark, SF_SMALL).collect()
    from wheels_in_motion_analytics_spark.functions.ml import WOE_LAPLACE

    n_orders = table(spark, SF_SMALL, "orders").count()
    assert sum(r["n_good"] + r["n_bad"] - 2 * WOE_LAPLACE for r in rows) == n_orders
    totals = {r["iv_total"] for r in rows}
    assert len(totals) == 1
    # WoE sign must track the share comparison
    tg = sum(r["n_good"] for r in rows)
    tb = sum(r["n_bad"] for r in rows)
    for r in rows:
        assert (r["woe"] > 0) == (r["n_good"] * tb > r["n_bad"] * tg) or r["woe"] == 0


def test_isotonic_pav_monotone_and_matches_exact_pav(spark):
    """The ppm-grid minimax fit must be nondecreasing, and within a few
    ppm of classical pool-adjacent-violators run on exact fractions."""
    from fractions import Fraction

    rows = sorted(
        SPECS["isotonic_calibration_pav"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r["bin"],
    )
    iso = [r["iso_rate_ppm"] for r in rows]
    assert iso == sorted(iso)  # monotone
    # classical PAV on exact fractions
    blocks = [[Fraction(r["n_pos"]), Fraction(r["n"])] for r in rows]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) > 1 and out[-2][0] * out[-1][1] > out[-1][0] * out[-2][1]:
            p2, n2 = out.pop()
            out[-1][0] += p2
            out[-1][1] += n2
    exact = []
    for p, n in out:
        v = Fraction(p, n)
        # expand the pooled value over its member bins
        exact.extend([v] * 0)
    # re-expand: walk blocks again tracking how many bins each pool ate
    exact = []
    i = 0
    for p, n in out:
        acc_p, acc_n, cnt = Fraction(0), Fraction(0), 0
        while acc_p != p or acc_n != n:
            acc_p += Fraction(rows[i + cnt]["n_pos"])
            acc_n += Fraction(rows[i + cnt]["n"])
            cnt += 1
        exact.extend([Fraction(p, n)] * cnt)
        i += cnt
    assert len(exact) == len(rows)
    for got_ppm, want in zip(iso, exact):
        assert abs(Fraction(got_ppm, 10**6) - want) <= Fraction(2, 10**6)


def test_lift_deciles_python_recompute(spark):
    rows = sorted(
        SPECS["lift_curve_deciles"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r["decile"],
    )
    data = sorted(
        (
            (-r["cents"], r["o_orderkey"], r["pos"])
            for r in table(spark, SF_SMALL, "orders")
            .selectExpr(
                "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
                "o_orderkey",
                "CAST(o_orderstatus = 'F' AS INT) AS pos",
            )
            .collect()
        ),
    )
    n = len(data)
    q, r10 = divmod(n, 10)
    sizes = [q + 1] * r10 + [q] * (10 - r10)
    total_pos = sum(p for _, _, p in data)
    i = 0
    cum = 0
    for d, size in enumerate(sizes, start=1):
        chunk = data[i : i + size]
        i += size
        npos = sum(p for _, _, p in chunk)
        cum += npos
        row = rows[d - 1]
        assert row["n"] == size and row["n_pos"] == npos
        assert row["pos_rate_ppm"] == (2_000_000 * npos + size) // (2 * size)
        assert row["cum_capture_ppm"] == (2_000_000 * cum + total_pos) // (
            2 * total_pos
        )
        assert row["lift_ppm"] == (2_000_000 * npos * n + size * total_pos) // (
            2 * size * total_pos
        )
    # decile 1 (highest scores) should over-capture vs uniform in a sane table
    assert rows[0]["cum_capture_ppm"] >= 0


def test_ece_python_recompute(spark):
    from collections import defaultdict

    from wheels_in_motion_analytics_spark.functions.ml import CALIB_BINS

    row = SPECS["expected_calibration_error"].fn(spark, SF_SMALL).collect()[0]
    data = [
        (r["cents"], r["pos"])
        for r in table(spark, SF_SMALL, "orders")
        .selectExpr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
            "CAST(o_orderstatus = 'F' AS INT) AS pos",
        )
        .collect()
    ]
    lo = min(c for c, _ in data)
    hi = max(c for c, _ in data)
    bins = defaultdict(lambda: [0, 0])
    for cts, pos in data:
        b = (cts - lo) * CALIB_BINS // (hi - lo + 1)
        bins[b][0] += 1
        bins[b][1] += pos
    ece_num = 0
    mce = 0
    ntot = 0
    for b, (n, npos) in bins.items():
        acc = (2_000_000 * npos + n) // (2 * n)
        conf = ((2 * b + 1) * 1_000_000) // (2 * CALIB_BINS)
        gap = abs(acc - conf)
        ece_num += n * gap
        mce = max(mce, gap)
        ntot += n
    assert row["n_bins_used"] == len(bins)
    assert row["n_total"] == ntot
    assert row["ece_num"] == ece_num
    assert row["ece_ppm"] == (2 * ece_num + ntot) // (2 * ntot)
    assert row["mce_ppm"] == mce


def test_ucb1_python_recompute(spark):
    import math
    from collections import defaultdict

    rows = {r["segment"]: r for r in SPECS["bandit_ucb1_allocation"].fn(spark, SF_SMALL).collect()}
    cust = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in table(spark, SF_SMALL, "customer").select("c_custkey", "c_mktsegment").collect()
    }
    arms = defaultdict(lambda: [0, 0])
    for r in table(spark, SF_SMALL, "orders").select("o_custkey", "o_orderstatus").collect():
        seg = cust[r["o_custkey"]]
        arms[seg][0] += 1
        arms[seg][1] += 1 if r["o_orderstatus"] == "F" else 0
    nn = sum(n for n, _ in arms.values())
    scores = {}
    for seg, (n, s) in arms.items():
        mean_ppm = (2_000_000 * s + n) // (2 * n)
        score = round(s / n + math.sqrt(2 * round(math.log(nn), 9) / n), 6)
        scores[seg] = score
        r = rows[seg]
        assert (r["pulls"], r["successes"], r["mean_ppm"]) == (n, s, mean_ppm)
        assert abs(r["ucb_score"] - score) < 1e-12
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    assert sum(1 for r in rows.values() if r["chosen"]) == 1
    assert rows[top]["chosen"] is True
    # bonus shrinks with pulls: the most-pulled arm has the smallest bonus
    most = max(arms.items(), key=lambda kv: kv[1][0])[0]
    bonus = {seg: rows[seg]["ucb_score"] - arms[seg][1] / arms[seg][0] for seg in arms}
    assert bonus[most] == min(bonus.values())
