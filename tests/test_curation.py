"""Semantic properties of the training-data curation operators (their
cross-engine exactness is covered by the differential harness)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from wheels_in_motion_analytics_spark.functions import curation
from wheels_in_motion_analytics_spark.registry import load_all_queries
from wheels_in_motion_analytics_spark.tables import table

SPECS = load_all_queries()


def test_split_fractions_and_determinism(spark):
    rows = SPECS["curate_split_train_val_test"].fn(spark, SF_SMALL).collect()
    n = len(rows)
    frac = {s: sum(1 for r in rows if r.split == s) / n for s in ("train", "val", "test")}
    # hash buckets: exact fractions fluctuate, but not by much at n=500
    assert abs(frac["train"] - 0.8) < 0.06
    assert abs(frac["val"] - 0.1) < 0.05
    assert abs(frac["test"] - 0.1) < 0.05
    again = SPECS["curate_split_train_val_test"].fn(spark, SF_SMALL).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_stratified_sample_exact_quotas(spark):
    docs = table(spark, SF_SMALL, "documents")
    strata = {r.lang: r.cnt for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    got = {
        r.lang: r.cnt
        for r in SPECS["curate_stratified_sample"]
        .fn(spark, SF_SMALL)
        .groupBy("lang")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == {
        lang: math.ceil(cnt * curation.STRATUM_PCT / 100) for lang, cnt in strata.items()
    }


def test_decontaminate_never_flags_eval_docs(spark):
    out = SPECS["curate_decontaminate"].fn(spark, SF_SMALL).collect()
    assert out, "synthetic corpus shares vocabulary; overlap expected"
    assert all(r.doc_id % curation.EVAL_EVERY != 0 for r in out)
    assert all(r.n_shared_shingles >= 1 for r in out)


def test_pack_sequences_conserves_tokens(spark):
    from wheels_in_motion_analytics_spark.functions.text import tokens

    bins = SPECS["curate_pack_sequences"].fn(spark, SF_SMALL).collect()
    total = (
        table(spark, SF_SMALL, "documents")
        .select(F.sum(F.size(tokens(F.col("text")))).alias("t"))
        .collect()[0]
        .t
    )
    assert sum(r.bin_tokens for r in bins) == total
    assert sum(r.n_docs for r in bins) == table(spark, SF_SMALL, "documents").count()
    shards = {r.shard for r in bins}
    assert shards <= set(range(curation.PACK_SHARDS)) and len(shards) > 1
    # bins are dense per shard: 0..max with no gaps (first-fit in hash order)
    for s in shards:
        got = sorted(r.bin for r in bins if r.shard == s)
        assert got == list(range(len(got)))


def test_rebalance_uniform_language_mixture(spark):
    docs = table(spark, SF_SMALL, "documents")
    m = min(
        r.cnt for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    )
    got = (
        SPECS["curate_rebalance_lang"]
        .fn(spark, SF_SMALL)
        .groupBy("lang")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    assert {r.cnt for r in got} == {m}
    assert len(got) == docs.select("lang").distinct().count()


def test_feature_binning_grid_semantics(spark):
    rows = SPECS["feature_binning_buckets"].fn(spark, SF_SMALL).collect()
    li_n = table(spark, SF_SMALL, "lineitem").count()
    assert sum(r.n_items for r in rows) == li_n
    # quantity 1..50: buckets 1..5 for [0,50), 6 for q==50 (width_bucket top)
    assert {r.qty_bucket for r in rows} <= set(range(1, 7))
    assert {r.price_quartile for r in rows} == {1, 2, 3, 4}
    # exact quartiles: per-quartile totals differ by at most 1 row
    per_q = {}
    for r in rows:
        per_q[r.price_quartile] = per_q.get(r.price_quartile, 0) + r.n_items
    assert max(per_q.values()) - min(per_q.values()) <= 1


def test_vocab_oov_rate_consistent_with_vocab(spark):
    import pyspark.sql.functions as F
    from wheels_in_motion_analytics_spark.functions.text import tokens as _toks
    from wheels_in_motion_analytics_spark.tables import table as _table

    rows = SPECS["vocab_oov_rate"].fn(spark, SF_SMALL).collect()
    n_docs = _table(spark, SF_SMALL, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert 0 <= r.covered <= r.n_tokens
        assert 0.0 <= r.oov_rate <= 1.0
    # vocabulary has min_count 5, so coverage should dominate on this corpus
    total = sum(r.n_tokens for r in rows)
    covered = sum(r.covered for r in rows)
    assert covered / total > 0.5


def test_temperature_mixture_flattens_language_skew(spark):
    import pyspark.sql.functions as F
    from wheels_in_motion_analytics_spark.tables import table as _table

    kept = SPECS["curate_temperature_mixture"].fn(spark, SF_SMALL)
    before = {
        r.lang: r.n
        for r in _table(spark, SF_SMALL, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    after = {
        r.lang: r.n
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # skew ratio (max/min) must strictly shrink toward balance
    skew_before = max(before.values()) / min(before.values())
    skew_after = max(after.values()) / min(after.values())
    assert skew_after < skew_before
    # the rarest language is kept (nearly) whole: keep_rate 1.0
    rates = {r.lang: r.keep_rate for r in kept.select("lang", "keep_rate").distinct().collect()}
    rare = min(before, key=before.get)
    assert rates[rare] == 1.0


def test_prefix_locality_reorder_improves_and_recomputes(spark):
    """Sorting by prefix key must not reduce total adjacent shared-prefix
    mass, and both orderings match a direct Python recompute."""
    import pyspark.sql.functions as F

    from tests.conftest import SF_SMALL
    from wheels_in_motion_analytics_spark.registry import load_all_queries
    from wheels_in_motion_analytics_spark.tables import table

    rows = {
        r.ordering: r
        for r in load_all_queries()["prefix_locality_reorder_audit"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(rows) == {"natural", "prefix_sorted"}
    assert (
        rows["prefix_sorted"].shared_prefix_sum
        >= rows["natural"].shared_prefix_sum
    )
    docs = (
        table(spark, SF_SMALL, "documents")
        .select("doc_id", F.lower("text").alias("t"))
        .collect()
    )
    toks = {r.doc_id: r.t.split()[:8] for r in docs}

    def shared(a, b):
        n = 0
        for x, y in zip(a[:8], b[:8]):
            if x != y:
                break
            n += 1
        else:
            return min(len(a), len(b), 8)
        return n

    def total(order):
        return sum(
            shared(toks[order[i]], toks[order[i + 1]])
            for i in range(len(order) - 1)
        )

    nat = sorted(toks)
    opt = sorted(toks, key=lambda d: (" ".join(toks[d][:3]), d))
    assert rows["natural"].shared_prefix_sum == total(nat)
    assert rows["prefix_sorted"].shared_prefix_sum == total(opt)
    assert rows["natural"].n_pairs == len(nat) - 1


def test_length_bucket_padding_python_recompute(spark):
    """Exact Python re-derivation of the bucket/padding arithmetic from the
    raw token counts (half-up ppm, cap+truncate semantics)."""
    specs = load_all_queries()
    out = {
        r["bucket"]: r
        for r in specs["curate_length_bucket_padding"].fn(spark, SF_SMALL).collect()
    }
    from wheels_in_motion_analytics_spark.functions.text import tokens

    tcs = [
        r["tc"]
        for r in table(spark, SF_SMALL, "documents")
        .select(F.size(tokens(F.col("text"))).alias("tc"))
        .collect()
        if r["tc"] > 0
    ]
    agg: dict[int, list[int]] = {}
    for tc in tcs:
        bucket = min(((tc + curation.BUCKET_STEP - 1) // curation.BUCKET_STEP)
                     * curation.BUCKET_STEP, curation.BUCKET_CAP)
        kept = min(tc, curation.BUCKET_CAP)
        n, s = agg.get(bucket, [0, 0])
        agg[bucket] = [n + 1, s + kept]
    assert set(agg) == set(out)
    for bucket, (n, s) in agg.items():
        row = out[bucket]
        padded = bucket * n
        assert row["n_docs"] == n
        assert row["real_tokens"] == s
        assert row["padded_tokens"] == padded
        assert row["waste_ppm"] == (2 * (padded - s) * 1_000_000 + padded) // (2 * padded)


def test_weighted_sample_python_recompute(spark):
    """A-ES parity: identical md5 draws, nano-ln grid, ratio ordering."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from wheels_in_motion_analytics_spark.functions.curation import WSAMPLE_K

    specs = load_all_queries()
    out = [
        (r["doc_id"], r["weight"], r["u52"], r["ln_nano"])
        for r in specs["curate_weighted_sample_noreplace"].fn(spark, SF_SMALL).collect()
    ]
    docs = (
        table(spark, SF_SMALL, "documents")
        .where(F.col("n_chars") > 0)
        .select("doc_id", "n_chars")
        .collect()
    )
    cand = []
    for r in docs:
        u52 = int(hashlib.md5(f"wsr:{r['doc_id']}".encode()).hexdigest()[:13], 16) + 1
        ln = math.log(u52 / 4503599627370496.0)
        ln_nano = int(
            Decimal(repr(ln)).quantize(Decimal("1e-9"), ROUND_HALF_UP) * 1_000_000_000
        )
        cand.append((r["doc_id"], r["n_chars"], u52, ln_nano))
    cand.sort(key=lambda t: (-(t[3] / t[1]), t[0]))
    assert sorted(out, key=lambda t: (-(t[3] / t[1]), t[0])) == cand[:WSAMPLE_K]
