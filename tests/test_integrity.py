"""Semantic properties of the integrity / graph-triangle operators
(cross-engine exactness is covered by the differential harness)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from wheels_in_motion_analytics_spark.functions import integrity
from wheels_in_motion_analytics_spark.functions.graph import oriented_triangles
from wheels_in_motion_analytics_spark.registry import load_all_queries
from wheels_in_motion_analytics_spark.tables import table

SPECS = load_all_queries()


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    row = SPECS["bloom_join_prune_audit"].fn(spark, SF_SMALL).collect()[0]
    # the defining Bloom property: every true match survives the filter
    assert row.n_passed >= row.n_true
    assert row.n_false_positive == row.n_passed - row.n_true
    assert row.n_false_positive >= 0
    # the filter is genuinely small: at most k positions per build key
    n_build = (
        table(spark, SF_SMALL, "customer")
        .where(F.col("c_mktsegment") == integrity.BLOOM_SEGMENT)
        .count()
    )
    assert row.n_bits_set <= integrity.BLOOM_K * n_build
    assert row.n_bits_set <= integrity.BLOOM_M
    # pruning actually prunes: survivors are a small fraction of the probe
    assert row.n_passed < row.n_probe


def test_bloom_bit_set_is_broadcast(spark):
    df = SPECS["bloom_join_prune_audit"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_fingerprints_are_order_and_partitioning_independent(spark):
    base = table(spark, SF_SMALL, "orders")
    specs = integrity._FP_COLS["orders"]
    a = integrity.fingerprint_of(base.repartition(13), specs).collect()[0]
    b = integrity.fingerprint_of(
        base.orderBy(F.desc("o_totalprice")).coalesce(1), specs
    ).collect()[0]
    assert a.n_rows == b.n_rows
    assert a.checksum == b.checksum


def test_fingerprints_detect_single_row_change(spark):
    base = table(spark, SF_SMALL, "orders")
    specs = integrity._FP_COLS["orders"]
    clean = integrity.fingerprint_of(base, specs).collect()[0]
    tampered_df = base.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == 1, F.col("o_totalprice") + 0.01).otherwise(
            F.col("o_totalprice")
        ),
    )
    tampered = integrity.fingerprint_of(tampered_df, specs).collect()[0]
    assert clean.n_rows == tampered.n_rows
    assert clean.checksum != tampered.checksum


def test_oriented_triangles_on_known_graph(spark):
    # bowtie: triangles (1,2,3) and (3,4,5) sharing node 3, plus a
    # dangling edge (5,6) that is in no triangle
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 5), (5, 6)]
    und = spark.createDataFrame(edges, ["s1", "s2"])
    tri = oriented_triangles(und).collect()
    assert len(tri) == 2
    sets = sorted(tuple(sorted((r.a, r.b, r.c))) for r in tri)
    assert sets == [(1, 2, 3), (3, 4, 5)]


def test_triangle_query_counts_are_consistent(spark):
    rows = SPECS["triangle_count_cosupply"].fn(spark, SF_SMALL).collect()
    assert rows
    counts = [r.tri_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(c >= 1 for c in counts)


def test_bfs_min_hops_on_known_graph(spark):
    """Path 1-2-3-4-5 with a shortcut 1-4: hop(4) must take the shortcut (1,
    not 3), hop(5) = 2; node 9 in a separate component is never reached."""
    from wheels_in_motion_analytics_spark.functions.graph import bfs_min_hops

    und = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (9, 10)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {r.node: r.hop for r in bfs_min_hops(edges, seed=1, max_hops=4).collect()}
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}


def test_bfs_hop_bound_truncates(spark):
    from wheels_in_motion_analytics_spark.functions.graph import bfs_min_hops

    chain = [(i, i + 1) for i in range(1, 6)]  # 1-2-3-4-5-6
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "src long, dst long"
    )
    got = {r.node: r.hop for r in bfs_min_hops(edges, seed=1, max_hops=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


# ---------------------------------------------------------------------------
# l-diversity / DP geometric counts / label propagation (round-5 session-3)
# ---------------------------------------------------------------------------


def test_l_diversity_bounds_and_consistency(spark):
    rows = SPECS["l_diversity_audit"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # distinct sensitive values can't exceed class size or decile count
        assert 1 <= r.l_distinct <= min(r.k, 10)
        assert r.l_diverse == (r.l_distinct >= 3)


def test_dp_noise_matches_python_cdf_walk(spark):
    import hashlib

    from wheels_in_motion_analytics_spark.functions.integrity import _GEO_CDF_52

    rows = SPECS["dp_geometric_noisy_counts"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        def geo(prefix: str) -> int:
            u = int(
                hashlib.md5(f"{prefix}:{r.segment}".encode()).hexdigest()[:13], 16
            )
            return sum(1 for t in _GEO_CDF_52 if u >= t)

        want = geo("dp1") - geo("dp2")
        assert r.noise == want
        assert r.noisy_n == r.true_n + want
        # truncated support bound
        assert abs(r.noise) <= len(_GEO_CDF_52)


def test_label_propagation_partitions_nodes(spark):
    rows = SPECS["label_propagation_communities"].fn(spark, SF_SMALL).collect()
    assert rows
    nodes = [r.node for r in rows]
    assert len(nodes) == len(set(nodes))  # one label per node
    # every community label is a node id of the graph and sizes agree
    sizes = {}
    for r in rows:
        sizes[r.community] = sizes.get(r.community, 0) + 1
    node_set = set(nodes)
    for r in rows:
        assert r.community in node_set
        assert r.community_size == sizes[r.community]


def test_t_closeness_python_recompute(spark):
    from collections import defaultdict

    from wheels_in_motion_analytics_spark.functions.integrity import (
        TCLOSE_BUCKETS,
        TCLOSE_BUCKET_W,
        TCLOSE_T_PPM,
    )

    specs = load_all_queries()
    out = {
        (r["prio"], r["yr"]): r
        for r in specs["t_closeness_audit"].fn(spark, SF_SMALL).collect()
    }
    rows = (
        table(spark, SF_SMALL, "orders")
        .selectExpr(
            "o_orderpriority AS prio",
            "CAST(year(o_orderdate) AS BIGINT) AS yr",
            f"least(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
            f" DIV {TCLOSE_BUCKET_W}, {TCLOSE_BUCKETS - 1}) AS v",
        )
        .collect()
    )
    per = defaultdict(lambda: [0] * TCLOSE_BUCKETS)
    for r in rows:
        per[(r["prio"], r["yr"])][r["v"]] += 1
    tot = [0] * TCLOSE_BUCKETS
    for counts in per.values():
        for i, c in enumerate(counts):
            tot[i] += c
    n_t = sum(tot)
    tcum = [sum(tot[: i + 1]) for i in range(TCLOSE_BUCKETS)]
    assert set(out) == set(per)
    for key, counts in per.items():
        n_g = sum(counts)
        gcum = [sum(counts[: i + 1]) for i in range(TCLOSE_BUCKETS)]
        dd = sum(
            abs(gcum[i] * n_t - tcum[i] * n_g) for i in range(TCLOSE_BUCKETS - 1)
        )
        denom = n_g * n_t * (TCLOSE_BUCKETS - 1)
        emd = (2 * dd * 1_000_000 + denom) // (2 * denom)
        row = out[key]
        assert row["n_rows"] == n_g
        assert row["emd_ppm"] == emd
        assert row["t_close_ok"] == (emd <= TCLOSE_T_PPM)


def test_hits_python_recompute(spark):
    """Exact integer-dynamics recompute of the unrolled HITS rounds."""
    from collections import defaultdict

    from wheels_in_motion_analytics_spark.functions.graph import (
        HITS_ROUNDS,
        HITS_TOPK,
        _HITS_SCALE,
    )

    rows = SPECS["hits_hubs_authorities"].fn(spark, SF_SMALL).collect()
    edges = {
        (r["l_suppkey"], r["l_partkey"])
        for r in table(spark, SF_SMALL, "lineitem")
        .select("l_suppkey", "l_partkey")
        .collect()
    }
    h = {s: _HITS_SCALE for s, _ in edges}
    a = {}
    for _ in range(HITS_ROUNDS):
        a = defaultdict(int)
        for s, p in edges:
            a[p] += h[s]
        mx = max(a.values())
        a = {p: v * _HITS_SCALE // mx for p, v in a.items()}
        h = defaultdict(int)
        for s, p in edges:
            h[s] += a[p]
        mx = max(h.values())
        h = {s: v * _HITS_SCALE // mx for s, v in h.items()}
    exp_auth = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:HITS_TOPK]
    exp_hub = sorted(h.items(), key=lambda kv: (-kv[1], kv[0]))[:HITS_TOPK]
    got_auth = [(r["key"], r["score_ppm"]) for r in rows if r["side"] == "authority"]
    got_hub = [(r["key"], r["score_ppm"]) for r in rows if r["side"] == "hub"]
    assert got_auth == exp_auth
    assert got_hub == exp_hub
    ranks = sorted(r["rnk"] for r in rows if r["side"] == "hub")
    assert ranks == list(range(1, HITS_TOPK + 1))


def test_ktruss_python_peel_replay(spark):
    """Replay the support/peel fixpoint in Python and compare the
    surviving edge set and supports."""
    from collections import Counter, defaultdict

    from wheels_in_motion_analytics_spark.functions.graph import (
        KTRUSS_K,
        KTRUSS_MIN_QTY,
        KTRUSS_MIN_SHARED,
        KTRUSS_TOPK,
    )

    rows = SPECS["ktruss_cosupply_peel"].fn(spark, SF_SMALL).collect()
    links = defaultdict(set)
    for r in (
        table(spark, SF_SMALL, "lineitem")
        .where(F.col("l_quantity") >= KTRUSS_MIN_QTY)
        .select("l_partkey", "l_suppkey")
        .distinct()
        .collect()
    ):
        links[r["l_partkey"]].add(r["l_suppkey"])
    shared = Counter()
    for ss in links.values():
        ss = sorted(ss)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                shared[(ss[i], ss[j])] += 1
    edges = {e for e, n in shared.items() if n >= KTRUSS_MIN_SHARED}
    while True:
        adj = defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        supp = {e: len(adj[e[0]] & adj[e[1]]) for e in edges}
        nxt = {e for e in edges if supp[e] >= KTRUSS_K - 2}
        if nxt == edges:
            break
        edges = nxt
    expected = sorted(
        ((supp[e], e) for e in edges), key=lambda t: (-t[0], t[1])
    )[:KTRUSS_TOPK]
    got = [((r["support"]), (r["s1"], r["s2"])) for r in rows]
    assert got == expected
    for r in rows:
        assert r["converged"] is True
        assert r["n_edges_final"] == len(edges)


def test_clustering_coefficient_python_recompute(spark):
    from collections import Counter, defaultdict

    from wheels_in_motion_analytics_spark.functions.graph import (
        TRI_MIN_QTY,
        TRI_MIN_SHARED,
    )

    row = SPECS["clustering_coefficient_cosupply"].fn(spark, SF_SMALL).collect()[0]
    links = defaultdict(set)
    for r in (
        table(spark, SF_SMALL, "lineitem")
        .where(F.col("l_quantity") >= TRI_MIN_QTY)
        .select("l_partkey", "l_suppkey")
        .distinct()
        .collect()
    ):
        links[r["l_partkey"]].add(r["l_suppkey"])
    shared = Counter()
    for ss in links.values():
        ss = sorted(ss)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                shared[(ss[i], ss[j])] += 1
    edges = {e for e, n in shared.items() if n >= TRI_MIN_SHARED}
    adj = defaultdict(set)
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    tri_per = Counter()
    nodes = sorted(adj)
    n_tri = 0
    for x, y in edges:
        common = adj[x] & adj[y]
        for z in common:
            if z > max(x, y):
                n_tri += 1
                tri_per[x] += 1
                tri_per[y] += 1
                tri_per[z] += 1
    wedges = sum(len(adj[v]) * (len(adj[v]) - 1) // 2 for v in nodes)
    assert row["n_triangles"] == n_tri
    assert row["n_wedges"] == wedges
    assert row["global_cc_ppm"] == (2_000_000 * 3 * n_tri + wedges) // (2 * wedges)
    loc = []
    for v in nodes:
        d = len(adj[v])
        if d >= 2:
            pairs = d * (d - 1) // 2
            loc.append((2_000_000 * tri_per[v] * 2 + d * (d - 1)) // (2 * pairs))
    assert row["n_nodes_deg2"] == len(loc)
    assert row["avg_local_cc_ppm"] == (2 * sum(loc) + len(loc)) // (2 * len(loc))


def test_modularity_python_recompute(spark):
    """Recompute Q from the (already-verified) community assignment and
    the raw edge set; check the exact integer derivation and Q in [-0.5, 1]."""
    from collections import Counter, defaultdict

    from wheels_in_motion_analytics_spark.functions.graph import (
        TRI_MIN_QTY,
        TRI_MIN_SHARED,
    )

    row = SPECS["community_modularity_score"].fn(spark, SF_SMALL).collect()[0]
    comm = {
        r["node"]: r["community"]
        for r in SPECS["label_propagation_communities"].fn(spark, SF_SMALL).collect()
    }
    links = defaultdict(set)
    for r in (
        table(spark, SF_SMALL, "lineitem")
        .where(F.col("l_quantity") >= TRI_MIN_QTY)
        .select("l_partkey", "l_suppkey")
        .distinct()
        .collect()
    ):
        links[r["l_partkey"]].add(r["l_suppkey"])
    shared = Counter()
    for ss in links.values():
        ss = sorted(ss)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                shared[(ss[i], ss[j])] += 1
    edges = {e for e, n in shared.items() if n >= TRI_MIN_SHARED}
    m = len(edges)
    ec = Counter()
    dc = Counter()
    for a, b in edges:
        if comm[a] == comm[b]:
            ec[comm[a]] += 1
        dc[comm[a]] += 1
        dc[comm[b]] += 1
    num = sum(4 * m * ec[c] - dc[c] * dc[c] for c in dc)
    assert row["n_edges"] == m
    assert row["n_communities"] == len(dc)
    assert row["q_num"] == str(num)
    sign = -1 if num < 0 else 1
    assert row["q_ppm"] == sign * (
        (2_000_000 * abs(num) + 4 * m * m) // (2 * 4 * m * m)
    )
    assert -500_000 <= row["q_ppm"] <= 1_000_000
