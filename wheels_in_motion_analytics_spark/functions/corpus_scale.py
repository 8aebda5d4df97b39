"""Scaled-corpus dedup/ANN: the same operators at 16× the document count.

The provided documents/embeddings fixtures do not grow with sf (500 rows at
sf≤0.01, 5000/2000 at sf0.1), so the banded-LSH-vs-exact crossover that
motivates the 100 TB design was never exercised at a meaningful size. This
module expands the corpus 16× *inside the query* with a deterministic,
SQL-expressible transform — 80k documents / 32k vectors at sf0.1 bench —
so the dedup/ANN timings in BENCH_FULL.json measure the scale path on a
corpus large enough to mean something, and the dedup variants stay fully
DuckDB-oracle-checkable.

Expansion semantics (deliberately dedup-shaped):

* documents: each doc becomes 16 replicas in 4 text variants
  (rep % 4 == 0 keeps the original text; others append a distinct marker
  suffix). Every variant text therefore appears exactly 4 times → exact
  dedup finds 4-copy groups; variants of one doc differ only in the last
  ~3 tokens → MinHash/LSH must recover the near-dup cluster.
* embeddings: each vector becomes 16 replicas rotated by ``rep`` positions
  — genuinely distinct directions (no trivial duplicates), preserving
  norms, for the bucketed-ANN scale check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.functions.similarity import (
    ANN_DIM,
    _oracle_lsh_topk,
    doc_shingles_of,
    fingerprint,
    hash_hex,
    lsh_topk,
    minhash_lsh_pairs,
    oracle_minhash_pairs,
    oracle_shingles,
)
from wheels_in_motion_analytics_spark.functions.linkage import (
    doc_segments,
    oracle_segments,
)
from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table

CORPUS_FACTOR = 16
VARIANTS = 4

# Scaled ANN sizing: 2^12 buckets per table keeps the expected bucket
# occupancy in single digits at 32k vectors, so candidate volume stays
# ~|corpus| × tables, never quadratic.
SCALED_ANN_TABLES = 4
SCALED_ANN_BITS = 12

_ORACLE_EXPANDED = f"""
expanded AS (
  SELECT d.doc_id * {CORPUS_FACTOR} + r.rep AS doc_id,
         CASE WHEN r.rep % {VARIANTS} = 0 THEN d.text
              ELSE d.text || ' variant marker ' || CAST(r.rep % {VARIANTS} AS VARCHAR)
         END AS text
  FROM documents d
  CROSS JOIN (SELECT unnest(range({CORPUS_FACTOR})) AS rep) r
)"""


def expanded_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16× document expansion, mirrored exactly by ``_ORACLE_EXPANDED``."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    rep = F.explode(F.sequence(F.lit(0), F.lit(CORPUS_FACTOR - 1))).alias("rep")
    v = F.col("rep") % VARIANTS
    return (
        docs.select("doc_id", "text", rep)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            (F.col("doc_id") * CORPUS_FACTOR + F.col("rep")).alias("doc_id"),
            F.when(v == 0, F.col("text"))
            .otherwise(
                F.concat(F.col("text"), F.lit(" variant marker "), v.cast("string"))
            )
            .alias("text"),
        )
    )


def expanded_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16× vector expansion by circular rotation (norm-preserving)."""
    vecs = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rep = F.explode(F.sequence(F.lit(0), F.lit(CORPUS_FACTOR - 1))).alias("rep")
    e = F.col("embedding")
    rotated = F.when(F.col("rep") == 0, e).otherwise(
        F.concat(
            F.slice(e, F.col("rep") + 1, F.lit(ANN_DIM) - F.col("rep")),
            F.slice(e, F.lit(1), F.col("rep")),
        )
    )
    return (
        vecs.select("vec_id", "embedding", rep)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            (F.col("vec_id") * CORPUS_FACTOR + F.col("rep")).alias("vec_id"),
            rotated.alias("embedding"),
        )
    )


@register(
    "scaled_dedup_exact",
    category="dedup-llm",
    doc=f"Exact dedup at {CORPUS_FACTOR}× corpus: one hash-groupBy over the "
    "expanded documents; every variant text appears exactly 4 times, so the "
    "expected group size is itself part of the check.",
    oracle=f"""
WITH {_ORACLE_EXPANDED}
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM expanded
GROUP BY 1
""",
)
def scaled_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        expanded_documents(spark, sf_dir)
        .groupBy(fingerprint(F.col("text")).alias("fp"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@register(
    "scaled_dedup_minhash_lsh",
    category="dedup-llm",
    doc=f"MinHash+LSH candidate pairs at {CORPUS_FACTOR}× corpus (80k docs "
    "at sf0.1 bench): identical banded pipeline as dedup_minhash_lsh, same "
    "oracle chain over the expanded CTE — the fuzzy-dedup scale path at a "
    "size where all-pairs would already be intractable.",
    oracle=oracle_minhash_pairs(_ORACLE_EXPANDED + "," + oracle_shingles("expanded")),
)
def scaled_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    hashed = doc_shingles_of(expanded_documents(spark, sf_dir)).select(
        "doc_id", hash_hex(F.col("s"), 7).alias("h")
    )
    return minhash_lsh_pairs(hashed)


_ORACLE_EXPANDED_NN = f"""
base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS el
  FROM embeddings
),
expanded_emb AS (
  SELECT b.vec_id * {CORPUS_FACTOR} + r.rep AS vec_id,
         CASE WHEN r.rep = 0 THEN el
              ELSE list_concat(list_slice(el, r.rep + 1, {ANN_DIM}),
                               list_slice(el, 1, r.rep))
         END AS e
  FROM base b
  CROSS JOIN (SELECT unnest(range({CORPUS_FACTOR})) AS rep) r
),
nn AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM expanded_emb)"""


@register(
    "scaled_ann_lsh",
    category="similarity",
    doc=f"Bucketed LSH ANN at {CORPUS_FACTOR}× corpus (32k vectors at sf0.1 "
    f"bench): {SCALED_ANN_TABLES} tables × {SCALED_ANN_BITS}-bit buckets — "
    "the bucket count scales with the corpus so per-bucket candidate sets "
    "stay bounded. Fully oracle-checked (rotation expansion + planes + "
    "re-rank replicated in DuckDB); structure additionally asserted in "
    "tests/test_similarity.py.",
    oracle=_oracle_lsh_topk(SCALED_ANN_TABLES, SCALED_ANN_BITS, _ORACLE_EXPANDED_NN),
)
def scaled_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_topk(
        expanded_embeddings(spark, sf_dir),
        tables=SCALED_ANN_TABLES,
        bits=SCALED_ANN_BITS,
    )


# --------------------------------------------------------------------------
# Line-level boilerplate removal at 16× corpus (digest-keyed frequency join)
# --------------------------------------------------------------------------

# The 16× expansion multiplies every segment's raw document frequency by
# CORPUS_FACTOR (all replicas of a doc share its base segments), so the
# boilerplate threshold must scale with the duplication factor — the real
# CCNet subtlety this query demonstrates: line frequencies counted over a
# corpus with unremoved duplicates are inflated, and the threshold (or a
# doc-dedup pass first) has to account for it.
SCALED_SEG_BOILER_DF = 3 * CORPUS_FACTOR


@register(
    "scaled_dedup_lines_crossdoc",
    category="dedup-llm",
    doc=f"Line-level boilerplate removal at {CORPUS_FACTOR}× corpus (80k "
    "docs at sf0.1 bench) — the 100 TB shape of dedup_lines_crossdoc: the "
    "segment-frequency aggregate and join-back are keyed on md5(segment) "
    "instead of the raw string, so shuffle rows carry a fixed-width digest "
    "rather than arbitrary-length text (collision odds ~n²/2^128 — "
    "irrelevant). Duplication-aware threshold: every replica shares its "
    f"original's base segments, so boilerplate is df >= "
    f"{SCALED_SEG_BOILER_DF} (= 3 × the {CORPUS_FACTOR}× duplication "
    "factor) — counting line frequency over a corpus whose exact dups were "
    "NOT removed first inflates df uniformly, and the threshold must scale "
    "with it. The expansion's own ' variant marker N' suffixes behave like "
    "real-crawl boilerplate (shared across thousands of docs) and get "
    "stripped. Output stays compact at scale: per-doc stats + md5 of the "
    "rebuilt text, not the text itself.",
    oracle=f"""
WITH {_ORACLE_EXPANDED},
{oracle_segments("expanded")},
f AS (
  SELECT md5(seg) AS d, COUNT(DISTINCT doc_id) AS df
  FROM seg GROUP BY md5(seg)
),
per_doc AS (
  SELECT s.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_segs,
         CAST(COUNT(*) FILTER (WHERE f.df >= {SCALED_SEG_BOILER_DF}) AS BIGINT)
           AS removed_segs,
         coalesce(string_agg(s.seg, ' ' ORDER BY s.seg_no)
                    FILTER (WHERE f.df < {SCALED_SEG_BOILER_DF}), '')
           AS clean_text
  FROM seg s JOIN f ON md5(s.seg) = f.d
  GROUP BY s.doc_id
)
SELECT doc_id, n_segs, removed_segs,
       CAST(length(clean_text) AS INT) AS clean_n_chars,
       md5(clean_text) AS clean_fp
FROM per_doc
""",
)
def scaled_dedup_lines_crossdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The segment relation feeds BOTH the frequency aggregate and the
    # join-back; without a lineage cut the 16x expansion + segmentation
    # explode runs twice (AQE exchange reuse is unreliable across the agg
    # and join subtrees — the scaled_ann_lsh lesson, NOTES round-2).
    segs = (
        doc_segments(expanded_documents(spark, sf_dir))
        .withColumn("d", F.md5("seg"))
        .localCheckpoint(eager=True)
    )
    # r10 restructure (guide §8: decide with small rows, attach a small
    # verdict to the big rows). The old shape joined the FULL frequency
    # aggregate — one row per DISTINCT SEGMENT in the corpus, O(corpus)
    # rows — back onto the text rows: broadcastable only by luck at bench
    # scale (and it measured as the dominant cost: building + shipping the
    # whole distinct-digest universe), impossible at 100 TB, where it
    # degrades to shuffling the text by digest. But the join-back only
    # needs the boilerplate VERDICT, and the boilerplate set (df >=
    # threshold) is tiny by construction — segments shared by >= 48 docs.
    # So aggregate over the digest-only projection, keep just the
    # offending digests, and left-broadcast-join that small set onto the
    # text rows: the text never moves for the decision, and its only
    # shuffle is the per-doc reassembly groupBy.
    keys = segs.select("doc_id", "d")
    boiler = (
        keys.groupBy("d")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") >= SCALED_SEG_BOILER_DF)
        .select("d", F.lit(True).alias("rm"))
    )
    is_rm = F.coalesce(F.col("rm"), F.lit(False))
    kept = F.when(~is_rm, F.struct("seg_no", "seg"))
    clean_text = F.concat_ws(
        " ", F.transform(F.array_sort(F.collect_list(kept)), lambda x: x.seg)
    )
    return (
        segs.join(boiler, "d", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.count(F.when(is_rm, F.lit(1))).alias("removed_segs"),
            clean_text.alias("clean_text"),
        )
        .select(
            "doc_id",
            "n_segs",
            "removed_segs",
            F.length("clean_text").alias("clean_n_chars"),
            F.md5("clean_text").alias("clean_fp"),
        )
    )
