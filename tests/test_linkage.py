"""Semantic properties of the linkage / span-dedup / fusion operators
(cross-engine exactness is covered by the differential harness)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from wheels_in_motion_analytics_spark.functions import linkage
from wheels_in_motion_analytics_spark.registry import load_all_queries

SPECS = load_all_queries()


def test_record_linkage_blocked_pairs_symmetric_free(spark):
    rows = SPECS["record_linkage_part_names"].fn(spark, SF_SMALL).collect()
    assert rows, "blocking should surface at least one near-pair"
    for r in rows:
        # canonical pair orientation — each unordered pair exactly once
        assert r.name_a < r.name_b
        assert 1 <= r.dist <= linkage.LINK_MAX_DIST
        # blocking invariant: both names share the first token
        assert r.name_a.split(" ")[0] == r.name_b.split(" ")[0]
        assert r.support_a >= 1 and r.support_b >= 1


def test_record_linkage_runs_on_dictionary_not_rows(spark):
    # the self-join input is the distinct-name dictionary: pair endpoints
    # must all be distinct names, and the pair count must be far below the
    # raw-row cross product
    out = SPECS["record_linkage_part_names"].fn(spark, SF_SMALL)
    n_pairs = out.count()
    n_names = (
        out.select(F.col("name_a").alias("n"))
        .union(out.select("name_b"))
        .distinct()
        .count()
    )
    assert n_pairs <= n_names * (n_names - 1) / 2


def test_crossdoc_spans_fraction_bounds(spark):
    rows = SPECS["dedup_crossdoc_spans"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.dup_shingles <= r.n_shingles
        assert 0.0 <= r.dup_frac <= 1.0
        assert r.flagged == (r.dup_frac > linkage.SPAN_DUP_FLAG)
    # the corpus contains near-duplicate docs (the LSH tests rely on them),
    # so some cross-doc duplication must be visible
    assert any(r.dup_shingles > 0 for r in rows)


def test_rrf_fusion_rank_math(spark):
    rows = SPECS["hybrid_rrf_retrieval"].fn(spark, SF_SMALL).collect()
    assert len(rows) == linkage.RRF_TOPK
    k = linkage.RRF_K
    for r in rows:
        expect = 0.0
        if r.lex_rank is not None:
            assert 1 <= r.lex_rank <= linkage.RRF_LIST_N
            expect += 1.0 / (k + r.lex_rank)
        if r.vec_rank is not None:
            assert 1 <= r.vec_rank <= linkage.RRF_LIST_N
            expect += 1.0 / (k + r.vec_rank)
        assert r.rrf == expect
    scores = [r.rrf for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rrf_rank_lists_are_heap_topk(spark):
    df = SPECS["hybrid_rrf_retrieval"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # both input lists and the final fusion use heap top-k, never a global sort
    assert "TakeOrderedAndProject" in plan
