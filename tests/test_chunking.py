"""Semantic tests for chunking / LM scoring / random projection beyond the
oracle differential: reconstruction, smoothing sanity, distance preservation."""

from __future__ import annotations

import pytest

import math

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from wheels_in_motion_analytics_spark.registry import load_all_queries

SPECS = load_all_queries()


@pytest.mark.slow
def test_chunks_reconstruct_document(spark):
    """Dropping each chunk's overlap prefix (except the first) and
    concatenating in chunk_idx order reproduces the tokenized document."""
    from wheels_in_motion_analytics_spark.functions.chunking import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )

    chunks = SPECS["chunk_documents_overlap"].fn(spark, SF_SMALL)
    overlap = CHUNK_SIZE - CHUNK_STRIDE
    rebuilt = (
        chunks.withColumn("toks", F.split("chunk_text", " "))
        .withColumn(
            "tail",
            F.when(F.col("chunk_idx") == 0, F.col("toks")).otherwise(
                F.slice(F.col("toks"), overlap + 1, CHUNK_SIZE)
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("chunk_idx", "tail"))
                        ),
                        lambda s: s["tail"],
                    )
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id",
        F.array_join(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != ""), " "
        ).alias("orig"),
    )
    bad = rebuilt.join(docs, "doc_id").where(F.col("rebuilt") != F.col("orig"))
    assert bad.count() == 0


def test_chunk_sizes_and_counts(spark):
    from wheels_in_motion_analytics_spark.functions.chunking import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )

    chunks = SPECS["chunk_documents_overlap"].fn(spark, SF_SMALL)
    assert chunks.where(F.col("n_tokens") > CHUNK_SIZE).count() == 0
    assert chunks.where(F.col("n_tokens") < 1).count() == 0
    # every doc yields ceil(nt / stride) chunks
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        (F.max(F.col("chunk_idx") * CHUNK_STRIDE) + F.max("n_tokens")).alias("span"),
    )
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id",
        F.size(F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")).alias("nt"),
    )
    joined = per_doc.join(docs, "doc_id")
    bad = joined.where(
        F.col("n_chunks") != F.ceil(F.col("nt") / F.lit(float(CHUNK_STRIDE)))
    )
    assert bad.count() == 0


@pytest.mark.slow
def test_lm_scoring_favors_repetitive_text(spark):
    """A document's avg NLL is a real probability: all scores positive, and
    the corpus-level mean NLL is below ln(V * 2) (add-1 uniform ceiling)."""
    scored = SPECS["lm_bigram_perplexity"].fn(spark, SF_SMALL)
    rows = scored.collect()
    assert all(r["avg_nll"] > 0 for r in rows)
    vocab = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .select("w")
        .distinct()
        .count()
    )
    mean_nll = sum(r["avg_nll"] for r in rows) / len(rows)
    assert mean_nll < math.log(vocab * 2)


def test_random_projection_preserves_distance_ordering(spark):
    """JL guarantee, sampled: projected squared distances (scaled by
    in_dim/out_dim) stay within a loose multiplicative band of the original
    for a sample of pairs, and no projected vector collapses to zero."""
    import numpy as np

    from wheels_in_motion_analytics_spark.functions.embeddings import JL_OUT_DIM

    proj = SPECS["embedding_random_projection"].fn(spark, SF_SMALL).limit(50).collect()
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .limit(50)
        .collect()
    }
    pcols = [f"p{j:02d}" for j in range(JL_OUT_DIM)]
    pvecs = {r["vec_id"]: np.array([r[c] for c in pcols]) for r in proj}
    common = sorted(set(emb) & set(pvecs))[:20]
    assert len(common) >= 10
    ratios = []
    for a in common[:10]:
        for b in common[10:20]:
            d_orig = float(np.sum((emb[a] - emb[b]) ** 2))
            # unnormalized ±1 rows: E[||Sx||^2] = out_dim * ||x||^2
            d_proj = float(np.sum((pvecs[a] - pvecs[b]) ** 2)) / JL_OUT_DIM
            if d_orig > 1e-9:
                ratios.append(d_proj / d_orig)
    # E[ratio] = 1; individual pairs vary but the mean must sit near 1.
    mean_ratio = sum(ratios) / len(ratios)
    assert 0.5 < mean_ratio < 2.0, mean_ratio
    assert all(float(np.linalg.norm(v)) > 0 for v in pvecs.values())


@pytest.mark.slow
def test_zipf_slope_python_parity(spark):
    """Fraction-exact Python re-derivation of the micro-ln OLS: same
    half-up-rounded ln grid, same integer moment closed forms."""
    from decimal import ROUND_HALF_UP, Decimal
    import math

    from wheels_in_motion_analytics_spark.functions import text_pipeline as tp
    from wheels_in_motion_analytics_spark.functions.text import tokens as tok_expr
    from wheels_in_motion_analytics_spark.tables import table as tbl

    specs = load_all_queries()
    row = specs["zipf_token_rank_slope"].fn(spark, SF_SMALL).collect()[0]

    counts = (
        tbl(spark, SF_SMALL, "documents")
        .select(F.explode(tok_expr(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    ranked = sorted(counts, key=lambda r: (-r["n"], r["t"]))[: tp.ZIPF_TOP_RANKS]

    def micro_ln(v: int) -> int:
        d = Decimal(repr(math.log(v))).quantize(Decimal("1e-6"), ROUND_HALF_UP)
        return int(d * 1_000_000)

    xs = [micro_ln(i + 1) for i in range(len(ranked))]
    ys = [micro_ln(r["n"]) for r in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = n * sxy - sx * sy
    dxx = n * sxx - sx * sx
    assert row["n_points"] == n
    sign = -1 if num < 0 else 1
    assert row["slope_ppm"] == sign * ((2 * abs(num) * 1_000_000 + dxx) // (2 * dxx))
    ia = sy * dxx - num * sx
    ib = n * dxx
    isign = -1 if ia < 0 else 1
    assert row["intercept_micro"] == isign * ((2 * abs(ia) + ib) // (2 * ib))


def test_flesch_python_recompute(spark):
    import re

    from wheels_in_motion_analytics_spark.tables import table as tbl

    specs = load_all_queries()
    out = {r["doc_id"]: r for r in specs["readability_flesch_audit"].fn(spark, SF_SMALL).collect()}
    docs = tbl(spark, SF_SMALL, "documents").select("doc_id", "text").collect()

    def hup(a, b):
        return (2 * a + b) // (2 * b)

    for r in docs:
        text = r["text"]
        words = len([w for w in re.split(r"\s+", text.lower()) if w])
        sentences = max(len(re.findall(r"[.!?]+", text)), 1)
        syllables = len(re.findall(r"[aeiouy]+", text.lower()))
        row = out[r["doc_id"]]
        assert (row["words"], row["sentences"], row["syllables"]) == (
            words, sentences, syllables,
        )
        score = 206835 - hup(1015 * words, sentences) - (
            hup(84600 * syllables, words) if words else 0
        )
        assert row["flesch_milli"] == score
