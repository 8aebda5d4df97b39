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
