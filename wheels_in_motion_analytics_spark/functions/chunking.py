"""Document chunking and n-gram language-model scoring — the two remaining
staples of an LLM training-data pipeline (context-window packing feeds on
fixed-size chunks; CCNet-style corpus filtering ranks documents by LM
perplexity).

Both are pure DataFrame plans:

* Chunking is a per-row array computation (sequence → slice) followed by one
  explode — zero shuffles, embarrassingly parallel, and the chunk arrays are
  materialized as columns BEFORE any lambda touches them (NOTES.md #5).
* LM scoring builds unigram/bigram count tables (map-side-combinable
  aggregates) and joins the per-document bigram stream against them. The
  count tables are corpus-derived; at 100 TB the bigram table scales with
  the corpus so that join carries NO broadcast hint (shuffle on the bigram
  key, AQE decides) while the final score is one doc_id-keyed aggregate.
  The corpus is necessarily read once per derived table (index-build pass +
  scoring pass) — the same two-pass contract every LM-filter pipeline has.

Float discipline: the only libm call (ln) is rounded to 6 decimals in
isolation; per-doc aggregation accumulates the rounded values in
DECIMAL(18,6) (compat.py convention), so accumulation order can never flake
the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.functions.text import tokens
from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table

CHUNK_SIZE = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks

_ORACLE_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"


@register(
    "chunk_documents_overlap",
    category="text",
    doc=f"Fixed-window chunking with overlap (size {CHUNK_SIZE}, stride "
    f"{CHUNK_STRIDE}): every document becomes ⌈nt/stride⌉ chunks of ≤"
    f"{CHUNK_SIZE} tokens, consecutive chunks sharing "
    f"{CHUNK_SIZE - CHUNK_STRIDE} tokens. Per-row sequence→slice + one "
    "explode_outer (plain explode would re-evaluate the tokenizer inside an "
    "inferred pre-Generate filter); zero shuffles.",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents
),
s AS (
  SELECT doc_id, toks, CAST(len(toks) AS INTEGER) AS nt,
         unnest(generate_series(0, CAST(len(toks) AS INTEGER) - 1, {CHUNK_STRIDE})) AS start
  FROM t
)
SELECT doc_id,
       CAST(start / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(least({CHUNK_SIZE}, nt - start) AS INTEGER) AS n_tokens,
       array_to_string(list_slice(toks, start + 1, start + {CHUNK_SIZE}), ' ') AS chunk_text
FROM s
""",
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    docs = docs.select("doc_id", "toks", F.size("toks").alias("nt"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("nt") - 1, F.lit(0)), F.lit(CHUNK_STRIDE)
    )
    return (
        docs.select(
            "doc_id", "toks", "nt", F.explode_outer(starts).alias("start")
        )
        .where(F.col("start").isNotNull())
        .select(
            "doc_id",
            (F.col("start") / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
            F.least(F.lit(CHUNK_SIZE), F.col("nt") - F.col("start"))
            .cast("int")
            .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("toks"), F.col("start") + 1, F.lit(CHUNK_SIZE)), " "
            ).alias("chunk_text"),
        )
    )


def _bigram_structs(toks: Column) -> Column:
    """Array of (w1, w2) adjacent-pair structs from a materialized token
    array column (never an inline expression — NOTES.md #5)."""
    return F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, i: F.struct(
            x.alias("w1"), F.element_at(toks, i + 2).alias("w2")
        ),
    )


@register(
    "lm_bigram_perplexity",
    category="text",
    doc="CCNet-style corpus quality scoring: average negative log-likelihood "
    "per document under an add-1-smoothed bigram LM trained on the corpus "
    "itself. Unigram/bigram count tables are partial-aggregated; the "
    "scoring join shuffles on the bigram key (no broadcast hint — the "
    "bigram table scales with the corpus); ln rounded in isolation, "
    "per-doc mean decimal-accumulated.",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents
),
big AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, CAST(len(toks) AS INTEGER) - 1),
           i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t
),
uni AS (
  SELECT w1, COUNT(*) AS cu
  FROM (SELECT unnest(toks) AS w1 FROM t)
  GROUP BY w1
),
bc AS (SELECT bigram, COUNT(*) AS cb FROM big GROUP BY bigram),
v AS (SELECT COUNT(*) AS vsz FROM uni),
inst AS (
  SELECT big.doc_id,
         round(-ln((bc.cb + 1.0) / (uni.cu + v.vsz)), 6) AS nll
  FROM big
  JOIN bc USING (bigram)
  JOIN uni ON string_split(big.bigram, ' ')[1] = uni.w1
  CROSS JOIN v
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(CAST(nll AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_nll
FROM inst
GROUP BY doc_id
""",
)
def lm_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    big = (
        docs.select(
            "doc_id", F.explode_outer(_bigram_structs(F.col("toks"))).alias("bg")
        )
        .where(F.col("bg").isNotNull())
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("bg.w1"), F.col("bg.w2")).alias("bigram"),
            F.col("bg.w1").alias("w1"),
        )
    )
    uni = (
        docs.select(F.explode_outer("toks").alias("w1"))
        .where(F.col("w1").isNotNull())
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    bc = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("cb"))
    vsz = uni.agg(F.count(F.lit(1)).alias("vsz"))
    nll = F.round(
        -F.log((F.col("cb") + 1.0) / (F.col("cu") + F.col("vsz"))), 6
    )
    return (
        big.join(bc, "bigram")
        .join(uni, "w1")
        .crossJoin(F.broadcast(vsz))
        .select("doc_id", nll.alias("nll"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.sum(F.col("nll").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_nll"),
        )
    )
