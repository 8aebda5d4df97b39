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


def test_line_dedup_untouched_docs_roundtrip_and_removal_consistency(spark):
    """Reassembly must be lossless where nothing was removed, and the
    removal accounting must reconcile with the text for every doc:
    clean word count == (n_segs' kept segments) expanded back to words."""
    out = SPECS["dedup_lines_crossdoc"].fn(spark, SF_SMALL)
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    joined = out.join(docs, "doc_id").collect()
    assert joined, "corpus must not be empty"
    n_removed_total = 0
    for r in joined:
        words = r.text.split(" ")
        n_segs_expect = (len(words) + linkage.SEG_W - 1) // linkage.SEG_W
        assert r.n_segs == n_segs_expect
        if r.removed_segs == 0:
            assert r.clean_text == r.text  # lossless order-preserving rebuild
        else:
            # every kept segment must appear in the original, in order
            assert r.clean_text == "" or all(
                seg in r.text for seg in _segments(r.clean_text)
            )
        n_removed_total += r.removed_segs
    assert n_removed_total > 0, "threshold should remove real boilerplate"


def _segments(clean_text: str) -> list[str]:
    words = clean_text.split(" ")
    w = linkage.SEG_W
    return [" ".join(words[i : i + w]) for i in range(0, len(words), w)]


def test_scaled_line_dedup_replica_consistency_and_marker_removal(spark):
    """Replicas sharing the same (original doc, variant) have identical
    text, so their rewrites must agree exactly; and the expansion's
    'variant marker' suffixes are corpus-wide boilerplate that the scaled
    threshold must strip from at least some docs."""
    from wheels_in_motion_analytics_spark.functions import corpus_scale

    out = SPECS["scaled_dedup_lines_crossdoc"].fn(spark, SF_SMALL)
    rows = out.collect()
    assert len(rows) == 500 * corpus_scale.CORPUS_FACTOR
    by_group: dict[tuple, set] = {}
    removed_total = 0
    for r in rows:
        orig = r.doc_id // corpus_scale.CORPUS_FACTOR
        variant = (r.doc_id % corpus_scale.CORPUS_FACTOR) % corpus_scale.VARIANTS
        by_group.setdefault((orig, variant), set()).add(
            (r.n_segs, r.removed_segs, r.clean_n_chars, r.clean_fp)
        )
        removed_total += r.removed_segs
    assert all(len(v) == 1 for v in by_group.values())
    assert removed_total > 0


def test_canonicalize_is_fixpoint_and_argmax_support(spark):
    """Every canonical is itself mapped to itself; cluster_size matches the
    actual member count; and no member beats its canonical under the
    (support DESC, name ASC) selection rule."""
    rows = SPECS["record_linkage_canonicalize"].fn(spark, SF_SMALL).collect()
    assert rows
    by_name = {r.name: r for r in rows}
    assert len(by_name) == len(rows), "one row per dictionary name"
    clusters: dict[str, list] = {}
    for r in rows:
        clusters.setdefault(r.canonical_name, []).append(r)
    assert any(len(m) > 1 for m in clusters.values()), "chaining must occur"
    for canon, members in clusters.items():
        c = by_name[canon]
        assert c.canonical_name == canon  # fixpoint
        for m in members:
            assert m.cluster_size == len(members)
            assert c.support > m.support or (
                c.support == m.support and canon <= m.name
            )


def test_incremental_line_dedup_equals_full_and_skips_are_sound(spark):
    """The incremental contract, both directions: every emitted rewrite
    equals the full-corpus recompute for that doc, AND every base doc it
    SKIPPED genuinely needs no re-emit (its base-only rewrite already
    equals the full-corpus one)."""
    full = {
        r.doc_id: (r.n_segs, r.removed_segs, r.clean_text)
        for r in SPECS["dedup_lines_crossdoc"].fn(spark, SF_SMALL).collect()
    }
    inc = SPECS["dedup_lines_incremental"].fn(spark, SF_SMALL).collect()
    emitted = set()
    for r in inc:
        emitted.add(r.doc_id)
        assert (r.n_segs, r.removed_segs, r.clean_text) == full[r.doc_id]
        assert r.is_new == (r.doc_id >= linkage.LINE_INCR_START)
    assert any(not r.is_new for r in inc), "some base docs must be affected"
    # skipped base docs: rewrite under the BASE-ONLY index must already
    # equal the full-corpus rewrite (re-emitting them would be redundant)
    from wheels_in_motion_analytics_spark.tables import table

    K = linkage.LINE_INCR_START
    segs = linkage.doc_segments(
        table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < K)
    )
    fdf = segs.groupBy("seg").agg(F.countDistinct("doc_id").alias("df"))
    kept = F.when(
        F.col("df") < linkage.SEG_BOILER_DF, F.struct("seg_no", "seg")
    )
    base_only = {
        r.doc_id: r.clean_text
        for r in segs.join(fdf, "seg")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(F.array_sort(F.collect_list(kept)), lambda x: x.seg),
            ).alias("clean_text")
        )
        .collect()
    }
    skipped = [d for d in base_only if d not in emitted]
    assert skipped, "some base docs must be untouched by the batch"
    for d in skipped:
        assert base_only[d] == full[d][2], f"doc {d} skipped but changed"


def test_sorted_neighborhood_python_recompute(spark):
    """Exact re-derivation: window-of-4 pairs over the sorted distinct name
    list, kept at levenshtein 1..3."""
    from wheels_in_motion_analytics_spark.functions.linkage import (
        SNM_MAX_DIST,
        SNM_WINDOW,
    )

    from wheels_in_motion_analytics_spark.tables import table

    specs = load_all_queries()
    out = {
        (r["name_a"], r["name_b"]): (r["rank_gap"], r["dist"])
        for r in specs["linkage_sorted_neighborhood"].fn(spark, SF_SMALL).collect()
    }
    names = sorted(
        r["p_name"]
        for r in table(spark, SF_SMALL, "part").select("p_name").distinct().collect()
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    expected = {}
    for i, a in enumerate(names):
        for gap in range(1, SNM_WINDOW + 1):
            if i + gap < len(names):
                d = lev(a, names[i + gap])
                if 1 <= d <= SNM_MAX_DIST:
                    expected[(a, names[i + gap])] = (gap, d)
    assert out == expected
