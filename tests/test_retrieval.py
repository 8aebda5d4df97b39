"""Semantic properties of the lexical-retrieval operators (cross-engine
exactness is covered by the differential harness)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from wheels_in_motion_analytics_spark.functions import retrieval
from wheels_in_motion_analytics_spark.registry import load_all_queries
from wheels_in_motion_analytics_spark.tables import table

SPECS = load_all_queries()


def test_bm25_topk_shape_and_monotonicity(spark):
    rows = SPECS["bm25_topk_search"].fn(spark, SF_SMALL).collect()
    assert len(rows) == retrieval.BM25_TOPK
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_plan_is_heap_topk_not_global_sort(spark):
    df = SPECS["bm25_topk_search"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_top_terms_bounded_per_doc(spark):
    out = SPECS["tfidf_top_terms"].fn(spark, SF_SMALL)
    per_doc = out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c")).collect()
    assert all(r.c <= retrieval.TFIDF_TOP_TERMS for r in per_doc)
    n_docs = table(spark, SF_SMALL, "documents").count()
    assert len(per_doc) == n_docs
    assert out.where(F.col("tfidf") <= 0).count() == 0


def test_intradoc_repetition_is_shuffle_free(spark):
    df = SPECS["curate_intradoc_repetition"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = df.collect()
    assert all(0.0 <= r.dup_frac <= 1.0 for r in rows)
    assert all(r.n_distinct <= r.n_grams for r in rows)
    # synthetic 31-word vocab + ~100-token docs ⇒ some repeated 3-grams exist
    assert any(r.n_distinct < r.n_grams for r in rows)


def test_ndcg_bounds_and_python_recompute(spark):
    """NDCG in [0, 1e6]; exact recompute from a Python re-ranking."""
    import math

    from tests.conftest import SF_SMALL
    from wheels_in_motion_analytics_spark.functions.retrieval import (
        _NDCG_W,
        NDCG_K,
        QUERY_TERMS,
    )
    from wheels_in_motion_analytics_spark.registry import load_all_queries
    from wheels_in_motion_analytics_spark.tables import table
    import pyspark.sql.functions as F

    specs = load_all_queries()
    got = specs["ndcg_at_k_retrieval"].fn(spark, SF_SMALL).collect()[0]
    docs = (
        table(spark, SF_SMALL, "documents")
        .select("doc_id", F.lower("text").alias("t"))
        .collect()
    )
    qs = set(QUERY_TERMS)
    m = []
    for r in docs:
        toks = [t for t in r.t.split() if t in qs]
        if toks:
            m.append((r.doc_id, len(toks), len(set(toks))))
    sys10 = sorted(m, key=lambda x: (-x[1], x[0]))[:NDCG_K]
    ideal10 = sorted(m, key=lambda x: (-x[2], x[0]))[:NDCG_K]
    dcg = sum(rel * w for (_, _, rel), w in zip(sys10, _NDCG_W))
    idcg = sum(rel * w for (_, _, rel), w in zip(ideal10, _NDCG_W))
    assert got.dcg_micro == dcg
    assert got.idcg_micro == idcg
    assert got.ndcg_ppm == (2 * 1_000_000 * dcg + idcg) // (2 * idcg)
    assert 0 < got.ndcg_ppm <= 1_000_000
    # frozen weights really are round(1e6/log2(pos+1))
    assert _NDCG_W == [round(1e6 / math.log2(i + 1)) for i in range(1, 11)]


def test_mmr_first_pick_is_max_relevance_and_all_distinct(spark):
    out = SPECS["mmr_diversified_topk"].fn(spark, SF_SMALL).collect()
    assert len(out) == retrieval.MMR_K
    assert len({r["vec_id"] for r in out}) == retrieval.MMR_K
    ranks = sorted(r["sel_rank"] for r in out)
    assert ranks == list(range(1, retrieval.MMR_K + 1))
    first = next(r for r in out if r["sel_rank"] == 1)
    # rank 1 has no selected set yet: max relevance, zero redundancy term
    assert first["max_sim_micro"] == 0
    assert first["rel_micro"] == max(r["rel_micro"] for r in out)
    # every row's score is consistent with the integer MMR formula
    for r in out:
        assert (
            r["mmr_score"]
            == retrieval.MMR_REL_W * r["rel_micro"]
            - retrieval.MMR_DIV_W * r["max_sim_micro"]
        )


def test_mmr_diversifies_vs_pure_relevance(spark):
    """The MMR set must not simply be the top-k by relevance ordering:
    later picks trade relevance for diversity whenever a redundant
    candidate leads, so max_sim_micro is recorded (non-zero for at least
    one pick on real embeddings)."""
    out = SPECS["mmr_diversified_topk"].fn(spark, SF_SMALL).collect()
    assert any(r["max_sim_micro"] != 0 for r in out if r["sel_rank"] > 1)


def test_mrr_python_recompute(spark):
    from collections import defaultdict

    from wheels_in_motion_analytics_spark.functions.retrieval import (
        MRR_GOLD_MIN_TF,
        MRR_K,
        MRR_LCM,
        QUERY_TERMS,
    )

    rows = SPECS["mrr_eval_retrieval"].fn(spark, SF_SMALL).collect()
    assert len(rows) == len(QUERY_TERMS)
    tf = defaultdict(lambda: defaultdict(int))
    for r in table(spark, SF_SMALL, "documents").select("doc_id", "text").collect():
        for t in r["text"].lower().split():
            if t in QUERY_TERMS:
                tf[t][r["doc_id"]] += 1
    total = 0
    for row in rows:
        t = row["term"]
        golds = [d for d, n in tf[t].items() if n >= MRR_GOLD_MIN_TF]
        gold = min(golds) if golds else None
        assert row["gold_doc"] == gold
        ranked = sorted(tf[t].items(), key=lambda kv: (-kv[1], kv[0]))[:MRR_K]
        pos = next((i + 1 for i, (d, _) in enumerate(ranked) if d == gold), None)
        assert row["sys_rank"] == pos
        rr = MRR_LCM // pos if pos else 0
        assert row[f"rr_x{MRR_LCM}"] == rr
        total += rr
    n_q = len(QUERY_TERMS)
    mrr_ppm = (2 * total * 10**6 + n_q * MRR_LCM) // (2 * n_q * MRR_LCM)
    for row in rows:
        assert row[f"rr_sum_x{MRR_LCM}"] == total
        assert row["mrr_ppm"] == mrr_ppm


def test_rbo_python_recompute(spark):
    from collections import Counter, defaultdict

    from wheels_in_motion_analytics_spark.functions.retrieval import (
        _RBO_W,
        RBO_K,
        QUERY_TERMS,
    )

    row = SPECS["rbo_rankings_agreement"].fn(spark, SF_SMALL).collect()[0]
    # occurrence ranking
    occ = Counter()
    for r in table(spark, SF_SMALL, "documents").select("doc_id", "text").collect():
        for t in r["text"].lower().split():
            if t in QUERY_TERMS:
                occ[r["doc_id"]] += 1
    occ_top = [
        d for d, _ in sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:RBO_K]
    ]
    # bm25 ranking via the registered query (already oracle-verified)
    bm_top = [r["doc_id"] for r in SPECS["bm25_topk_search"].fn(spark, SF_SMALL).collect()]
    pa = {d: i + 1 for i, d in enumerate(bm_top)}
    pb = {d: i + 1 for i, d in enumerate(occ_top)}
    shared = set(pa) & set(pb)
    total_ov = 0
    rbo = 0
    for d in range(1, RBO_K + 1):
        ov = sum(1 for x in shared if pa[x] <= d and pb[x] <= d)
        total_ov += ov
        rbo += (_RBO_W[d - 1] * ov) // d
    assert row["total_overlap"] == total_ov
    assert row["rbo_micro"] == rbo
    assert 0 <= row["rbo_micro"] <= sum(_RBO_W)  # RBO in [0, ~0.65e6] truncated
