"""Record linkage, cross-document span duplication, and hybrid retrieval
fusion — the entity-resolution / corpus-hygiene side of a training-data
pipeline.

Scale shapes:

* Record linkage runs on the DISTINCT value dictionary, never the raw rows
  (dedupe the dictionary, then broadcast the mapping back) — at 100 TB the
  dictionary of a categorical column is orders of magnitude smaller than the
  fact table. Candidate pairs come from an equi-join on a blocking key, so
  the edit-distance UDF-free comparison (`levenshtein`, JVM built-in) only
  runs inside blocks — standard blocking: high recall, never all-pairs.
* Cross-document span duplication is one shingle explode + a document
  frequency aggregate + a per-doc ratio — the same inverted-index shape as
  the MinHash pipeline (functions/similarity.py), map-side combinable on
  both groupBys.
* RRF fusion joins two independently-computed top-N rank lists (lexical
  BM25, dense cosine) with a full outer join on the doc id; each list is
  produced with the 100 TB-safe machinery it belongs to (posting-list
  explode for BM25, per-row array math + TakeOrderedAndProject for cosine).

Float discipline: levenshtein is integer; shingle ratios are exact integer
divisions rounded in isolation; RRF scores are sums of two exactly-
representable rationals 1/(60+rank) — every emitted double is bit-identical
across engines (see compat.py preamble).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.functions.similarity import (
    doc_shingles,
    oracle_shingles,
)
from wheels_in_motion_analytics_spark.functions.text import tokens
from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table

# --------------------------------------------------------------------------
# Record linkage over the part-name dictionary
# --------------------------------------------------------------------------

LINK_MAX_DIST = 3


@register(
    "record_linkage_part_names",
    category="linkage",
    doc=f"Entity resolution over the p_name dictionary: distinct names, "
    "blocked on the first token (the standard lossy-but-high-recall "
    "blocking key), candidate pairs compared with JVM levenshtein, kept at "
    f"edit distance 1..{LINK_MAX_DIST}. Runs on the value dictionary (tiny "
    "even at 100 TB), never the fact rows; each side also carries its "
    "support count so the winning canonical form is pickable downstream.",
    oracle=f"""
WITH names AS (
  SELECT p_name AS name, COUNT(*) AS support
  FROM part GROUP BY p_name
)
SELECT a.name AS name_a, b.name AS name_b,
       a.support AS support_a, b.support AS support_b,
       levenshtein(a.name, b.name) AS dist
FROM names a JOIN names b
  ON split_part(a.name, ' ', 1) = split_part(b.name, ' ', 1)
 AND a.name < b.name
WHERE levenshtein(a.name, b.name) BETWEEN 1 AND {LINK_MAX_DIST}
""",
)
def record_linkage_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        table(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("support"))
        .withColumn("blk", F.split_part(F.col("name"), F.lit(" "), F.lit(1)))
    )
    a = names.select(
        F.col("name").alias("name_a"), F.col("support").alias("support_a"), "blk"
    )
    b = names.select(
        F.col("name").alias("name_b"), F.col("support").alias("support_b"), "blk"
    )
    return (
        a.join(b, "blk")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist").between(1, LINK_MAX_DIST))
        .select("name_a", "name_b", "support_a", "support_b", "dist")
    )


# --------------------------------------------------------------------------
# Cross-document repeated-span fraction (suffix-array-style dedup signal)
# --------------------------------------------------------------------------

SPAN_DUP_FLAG = 0.5  # docs with >50% cross-doc-shared shingles are flagged


@register(
    "dedup_crossdoc_spans",
    category="dedup-llm",
    doc="Cross-document repeated-span signal (the distributed stand-in for "
    "suffix-array substring dedup): per document, the fraction of its "
    "distinct 3-word shingles that also occur in at least one OTHER "
    "document. One shingle explode, one df aggregate, one per-doc ratio — "
    f"all map-side combinable. Docs above {SPAN_DUP_FLAG} are flagged for "
    "removal; exact integer ratio, rounded in isolation.",
    oracle=f"""
WITH {oracle_shingles()},
df AS (SELECT s, COUNT(DISTINCT doc_id) AS df FROM sh GROUP BY s),
per_doc AS (
  SELECT sh.doc_id,
         COUNT(*) AS n_shingles,
         COUNT(*) FILTER (WHERE df.df >= 2) AS dup_shingles
  FROM sh JOIN df USING (s)
  GROUP BY sh.doc_id
)
SELECT doc_id, n_shingles, dup_shingles,
       round(CAST(dup_shingles AS DOUBLE) / n_shingles, 6) AS dup_frac,
       (CAST(dup_shingles AS DOUBLE) / n_shingles > {SPAN_DUP_FLAG})
         AS flagged
FROM per_doc
""",
)
def dedup_crossdoc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = doc_shingles(spark, sf_dir)  # (doc_id, s) distinct per doc
    df = sh.groupBy("s").agg(F.countDistinct("doc_id").alias("df"))
    per_doc = (
        sh.join(df, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("df") >= 2, F.lit(1))).alias("dup_shingles"),
        )
    )
    frac = F.col("dup_shingles").cast("double") / F.col("n_shingles")
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "dup_shingles",
        F.round(frac, 6).alias("dup_frac"),
        (frac > SPAN_DUP_FLAG).alias("flagged"),
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and dense cosine
# --------------------------------------------------------------------------

RRF_K = 60
RRF_LIST_N = 50  # depth of each input rank list
RRF_TOPK = 15
RRF_QUERY_TERMS: tuple[str, ...] = ("hash", "join", "vector", "stream")
_RRF_QUERY_IN = ", ".join(f"'{t}'" for t in RRF_QUERY_TERMS)
_Q10 = 10_000_000_000  # dot/norm quantization grid (see functions/embeddings.py)

_ORACLE_TOKS = (
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
)


def _lexical_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, lex_rank) — dense BM25-lite ranking for the fixed query.

    Same posting-list shape as bm25_topk_search (functions/retrieval.py);
    scoring simplified to round(idf,6)*tf accumulated in decimal, because the
    fusion op is about the rank combination, not the saturation curve.
    """
    term_arr = F.array(*[F.lit(t) for t in RRF_QUERY_TERMS])
    ws = tokens(F.col("text"))
    matched = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode_outer(
                F.filter(ws, lambda t: F.array_contains(term_arr, t))
            ).alias("tok"),
        )
        .where(F.col("tok").isNotNull())
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = table(spark, sf_dir, "documents").agg(F.count(F.lit(1)).alias("n"))
    matched = matched.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("tok"))
    )
    idf = F.round(
        F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1), 6
    )
    scored = (
        matched.crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * F.col("tf")).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum(F.col("c").cast("decimal(18,6)")).cast("double").alias("lex"))
    )
    # Top-N FIRST via ORDER BY+LIMIT (TakeOrderedAndProject: per-partition
    # heap, no global sort), then rank the N-row result — the global
    # row_number window only ever sees RRF_LIST_N rows.
    top = scored.orderBy(F.col("lex").desc(), F.col("doc_id")).limit(RRF_LIST_N)
    w = Window.orderBy(F.col("lex").desc(), F.col("doc_id"))
    return top.withColumn("lex_rank", F.row_number().over(w)).select(
        F.col("doc_id").alias("id"), "lex_rank"
    )


def _dense_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, vec_rank) — cosine-to-query ranking; query = embedding of vec 0.

    Per-row quantized dot/norm math (zero shuffle) + TakeOrderedAndProject
    top-N; the single-row query vector broadcasts.
    """
    emb = table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    dot_q = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("qv"),
            lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * F.lit(float(_Q10))
                + F.lit(0.5)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    ssq = lambda c: F.aggregate(  # noqa: E731
        F.transform(
            c,
            lambda x: F.floor(
                x.cast("double") * x.cast("double") * F.lit(float(_Q10))
                + F.lit(0.5)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cos = F.round(
        dot_q.cast("double")
        / (
            F.sqrt(ssq(F.col("embedding")).cast("double"))
            * F.sqrt(ssq(F.col("qv")).cast("double"))
        ),
        6,
    )
    scored = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(F.col("vec_id").alias("id"), cos.alias("cos"))
    )
    # Same limit-then-rank shape as the lexical list: the heap-based top-N
    # bounds the global window's input to RRF_LIST_N rows.
    top = scored.orderBy(F.col("cos").desc(), F.col("id")).limit(RRF_LIST_N)
    w = Window.orderBy(F.col("cos").desc(), F.col("id"))
    return top.withColumn("vec_rank", F.row_number().over(w)).select(
        "id", "vec_rank"
    )


@register(
    "hybrid_rrf_retrieval",
    category="retrieval",
    doc=f"Hybrid search: reciprocal-rank fusion (k={RRF_K}) of a BM25-lite "
    f"lexical top-{RRF_LIST_N} and a dense cosine top-{RRF_LIST_N} "
    "(query = embedding of vec 0; doc ids and vec ids share the id space). "
    "Each list is computed with its native scale machinery, then fused with "
    "one full outer join; RRF contributions 1/(60+rank) are exactly "
    f"representable rationals, so the fused score is bit-stable. Top "
    f"{RRF_TOPK}.",
    oracle=f"""
WITH d AS (SELECT doc_id, {_ORACLE_TOKS} AS ws FROM documents),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(ws) AS tok FROM d)
  WHERE tok IN ({_RRF_QUERY_IN})
  GROUP BY 1, 2
),
stats AS (SELECT COUNT(*) AS n FROM d),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
lex AS (
  SELECT tf.doc_id AS id,
         CAST(SUM(CAST(round(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1), 6)
                       * tf.tf AS DECIMAL(18,6))) AS DOUBLE) AS lex
  FROM tf JOIN df USING (tok) CROSS JOIN stats
  GROUP BY tf.doc_id
),
lexr AS (
  SELECT id, row_number() OVER (ORDER BY lex DESC, id) AS lex_rank FROM lex
  QUALIFY lex_rank <= {RRF_LIST_N}
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
dense AS (
  SELECT e.vec_id AS id,
         round(
           CAST(list_sum(list_transform(range(1, len(e.embedding) + 1),
                i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE)
                          * CAST(q.qv[i] AS DOUBLE) * {_Q10} + 0.5) AS BIGINT)))
                AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(e.embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                            * {_Q10} + 0.5) AS BIGINT))) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(q.qv,
                  x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                            * {_Q10} + 0.5) AS BIGINT))) AS DOUBLE))),
           6) AS cos
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> 0
),
denser AS (
  SELECT id, row_number() OVER (ORDER BY cos DESC, id) AS vec_rank FROM dense
  QUALIFY vec_rank <= {RRF_LIST_N}
)
SELECT COALESCE(lexr.id, denser.id) AS id,
       lexr.lex_rank AS lex_rank,
       denser.vec_rank AS vec_rank,
       COALESCE(1.0 / ({RRF_K} + lexr.lex_rank), 0)
         + COALESCE(1.0 / ({RRF_K} + denser.vec_rank), 0) AS rrf
FROM lexr FULL OUTER JOIN denser ON lexr.id = denser.id
ORDER BY rrf DESC, id
LIMIT {RRF_TOPK}
""",
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    lexr = _lexical_ranks(spark, sf_dir)
    denser = _dense_ranks(spark, sf_dir)
    rrf = F.coalesce(
        1.0 / (RRF_K + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(1.0 / (RRF_K + F.col("vec_rank")), F.lit(0.0))
    return (
        lexr.join(denser, "id", "full_outer")
        .select("id", "lex_rank", "vec_rank", rrf.alias("rrf"))
        .orderBy(F.col("rrf").desc(), "id")
        .limit(RRF_TOPK)
    )
