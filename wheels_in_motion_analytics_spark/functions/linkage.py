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


# --------------------------------------------------------------------------
# Line-level cross-document dedup (CCNet-style boilerplate REMOVAL)
# --------------------------------------------------------------------------

SEG_W = 3  # words per pseudo-line segment
SEG_BOILER_DF = 3  # a segment present in >= this many docs is boilerplate


def doc_segments(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, seg_no, seg): the document cut into
    non-overlapping ``SEG_W``-word segments, order preserved via seg_no.
    The words array is materialized into a column BEFORE the transform
    lambda (NOTES decision #5 — inline expressions re-evaluate per
    element)."""
    return docs.select("doc_id", F.split("text", " ").alias("words")).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.expr(f"CAST((size(words) + {SEG_W - 1}) DIV {SEG_W} AS INT)")
                    - 1,
                ),
                lambda i: F.concat_ws(
                    " ", F.slice("words", i * SEG_W + F.lit(1), F.lit(SEG_W))
                ),
            )
        ).alias("seg_no", "seg"),
    )


def oracle_segments(src: str = "documents") -> str:
    """DuckDB CTE chain mirroring :func:`doc_segments` over ``src``:
    exposes seg(doc_id, seg_no, seg)."""
    return f"""base AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM {src}
),
idx AS (
  SELECT doc_id, words, unnest(generate_series(1, len(words))) AS ord
  FROM base
),
seg AS (
  SELECT doc_id, (ord - 1) // {SEG_W} AS seg_no,
         string_agg(words[ord], ' ' ORDER BY ord) AS seg
  FROM idx GROUP BY doc_id, (ord - 1) // {SEG_W}
)"""


@register(
    "dedup_lines_crossdoc",
    category="dedup-llm",
    doc="Line-level cross-document dedup, the CCNet/Dolma boilerplate-"
    "removal pass: unlike dedup_crossdoc_spans (which only FLAGS documents) "
    f"this REWRITES each document — its text is cut into non-overlapping "
    f"{SEG_W}-word segments (the pseudo-lines of this newline-free corpus), "
    f"segments appearing in >= {SEG_BOILER_DF} distinct documents "
    "(navbars / cookie banners / licence blurbs in a real crawl) are "
    "dropped, and the survivors are reassembled IN ORIGINAL ORDER into "
    "clean_text. SCALE SHAPE: one segment explode, one map-side-combinable "
    "document-frequency aggregate, one hash join back, one per-doc "
    "reassembly groupBy — never all-pairs; the 16x-corpus twin "
    "(scaled_dedup_lines_crossdoc) keys the frequency join on a digest "
    "instead of the raw string. Reassembly is order-proof: kept "
    "(seg_no, seg) structs are array_sort'ed before concat, so the output "
    "is a deterministic pure function of the corpus under any partitioning. "
    "Invariant pinned in tests: removed_segs = 0 => clean_text == text.",
    oracle=f"""
WITH {oracle_segments()},
f AS (SELECT seg, COUNT(DISTINCT doc_id) AS df FROM seg GROUP BY seg),
per_doc AS (
  SELECT s.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_segs,
         CAST(COUNT(*) FILTER (WHERE f.df >= {SEG_BOILER_DF}) AS BIGINT)
           AS removed_segs,
         coalesce(string_agg(s.seg, ' ' ORDER BY s.seg_no)
                    FILTER (WHERE f.df < {SEG_BOILER_DF}), '') AS clean_text
  FROM seg s JOIN f USING (seg)
  GROUP BY s.doc_id
)
SELECT doc_id, n_segs, removed_segs, clean_text,
       CAST(length(clean_text) AS INT) AS clean_n_chars
FROM per_doc
""",
)
def dedup_lines_crossdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    segs = doc_segments(table(spark, sf_dir, "documents").select("doc_id", "text"))
    fdf = segs.groupBy("seg").agg(F.countDistinct("doc_id").alias("df"))
    kept = F.when(
        F.col("df") < SEG_BOILER_DF, F.struct("seg_no", "seg")
    )  # collect_list drops the NULLs of removed segments
    return (
        segs.join(fdf, "seg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.count(F.when(F.col("df") >= SEG_BOILER_DF, F.lit(1))).alias(
                "removed_segs"
            ),
            F.concat_ws(
                " ",
                F.transform(F.array_sort(F.collect_list(kept)), lambda x: x.seg),
            ).alias("clean_text"),
        )
        .withColumn("clean_n_chars", F.length("clean_text"))
    )


# --------------------------------------------------------------------------
# Entity-resolution completion: near-pair graph -> canonical-name mapping
# --------------------------------------------------------------------------


@register(
    "record_linkage_canonicalize",
    category="linkage",
    doc="The step AFTER record_linkage_part_names: near-pairs are only half "
    "an entity resolution — variants chain (A~B, B~C with dist(A,C) > "
    f"{LINK_MAX_DIST}), so clusters come from connected components over "
    "the pair graph (min-label propagation to fixpoint, the same bounded "
    "iterative core as dedup_connected_components), and every variant maps "
    "to ONE canonical form: the cluster member with the highest support, "
    "ties broken by lexicographically-smallest name — picked with a "
    "map-side-combinable min(struct(-support, name)) aggregate, no window. "
    "Node ids for the propagation are md5-derived 60-bit ints (engine-"
    "portable); the label itself never reaches the output, so the oracle "
    "propagates min-STRING labels instead and must still land on the "
    "identical canonical mapping. Runs entirely on the distinct-name "
    "dictionary — at 100 TB the mapping is then a broadcast join back to "
    "the fact rows.",
    oracle=f"""
WITH RECURSIVE names AS (
  SELECT p_name AS name, COUNT(*) AS support
  FROM part GROUP BY p_name
),
pairs AS (
  SELECT a.name AS d1, b.name AS d2
  FROM names a JOIN names b
    ON split_part(a.name, ' ', 1) = split_part(b.name, ' ', 1)
   AND a.name < b.name
  WHERE levenshtein(a.name, b.name) BETWEEN 1 AND {LINK_MAX_DIST}
),
edges AS (
  SELECT d1 AS src, d2 AS dst FROM pairs
  UNION ALL
  SELECT d2, d1 FROM pairs
),
reach(name, lab) AS (
  SELECT name, name FROM names
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.name
),
lbl AS (SELECT name, MIN(lab) AS lab FROM reach GROUP BY name),
cl AS (SELECT l.lab, n.name, n.support FROM lbl l JOIN names n USING (name)),
rep AS (
  SELECT lab, name AS canonical_name FROM (
    SELECT lab, name,
           row_number() OVER (PARTITION BY lab
                              ORDER BY support DESC, name) AS rn
    FROM cl) t
  WHERE rn = 1
),
siz AS (SELECT lab, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM cl GROUP BY lab)
SELECT cl.name, CAST(cl.support AS BIGINT) AS support,
       rep.canonical_name, siz.cluster_size
FROM cl JOIN rep USING (lab) JOIN siz USING (lab)
""",
)
def record_linkage_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wheels_in_motion_analytics_spark.functions.similarity import (
        connected_components,
        hash_hex,
    )

    names = (
        table(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("support"))
    )
    pairs = record_linkage_part_names(spark, sf_dir).select(
        hash_hex(F.col("name_a")).alias("src"), hash_hex(F.col("name_b")).alias("dst")
    )
    edges = pairs.unionAll(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nodes = names.select(hash_hex(F.col("name")).alias("id"))
    labels = connected_components(nodes, edges)
    cl = names.withColumn("id", hash_hex(F.col("name"))).join(labels, "id")
    rep = (
        cl.groupBy("label")
        .agg(
            F.min(
                F.struct(
                    (-F.col("support")).alias("ns"), F.col("name").alias("n")
                )
            ).alias("r"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .select("label", F.col("r.n").alias("canonical_name"), "cluster_size")
    )
    return cl.join(rep, "label").select(
        "name", "support", "canonical_name", "cluster_size"
    )


# --------------------------------------------------------------------------
# Incremental line-level dedup: a new batch arrives, only crossings re-emit
# --------------------------------------------------------------------------

LINE_INCR_START = 400  # doc_id >= this = the incoming batch (same convention
# as similarity.INCR_BATCH_START)


@register(
    "dedup_lines_incremental",
    category="dedup-llm",
    doc="Incremental maintenance of dedup_lines_crossdoc under append-only "
    f"ingestion: the corpus is split into a base (doc_id < "
    f"{LINE_INCR_START}, whose segment-frequency index and rewrites "
    "already exist) and an incoming batch. Segment df only GROWS under "
    "appends, so the only base documents whose rewrite can change are "
    "those containing a CROSSING segment — one whose df passes the "
    f"boilerplate threshold {SEG_BOILER_DF} because of the batch. The "
    "incremental shape: batch-only df delta, merged with the stored base "
    "index by ONE outer join (never a corpus recount), crossing segments "
    "identified from the merged counts, affected base docs via a semi-join "
    "on crossing postings — work is O(batch postings + crossing postings "
    "+ affected-doc segments), never O(corpus). Emits the rewrites that an "
    "incremental consumer must upsert: every batch doc plus every "
    "affected base doc, rewritten under the merged frequencies. The "
    "oracle states the same semantics as a full recompute — incremental "
    "== full is the contract.",
    oracle=f"""
WITH {oracle_segments()},
fb AS (
  SELECT seg, COUNT(DISTINCT doc_id) AS dfb
  FROM seg WHERE doc_id < {LINE_INCR_START} GROUP BY seg
),
ff AS (SELECT seg, COUNT(DISTINCT doc_id) AS dff FROM seg GROUP BY seg),
crossing AS (
  SELECT ff.seg FROM ff LEFT JOIN fb USING (seg)
  WHERE coalesce(fb.dfb, 0) < {SEG_BOILER_DF} AND ff.dff >= {SEG_BOILER_DF}
),
affected AS (
  SELECT DISTINCT s.doc_id FROM seg s JOIN crossing c USING (seg)
  WHERE s.doc_id < {LINE_INCR_START}
),
targets AS (
  SELECT doc_id FROM documents WHERE doc_id >= {LINE_INCR_START}
  UNION SELECT doc_id FROM affected
),
per_doc AS (
  SELECT s.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_segs,
         CAST(COUNT(*) FILTER (WHERE ff.dff >= {SEG_BOILER_DF}) AS BIGINT)
           AS removed_segs,
         coalesce(string_agg(s.seg, ' ' ORDER BY s.seg_no)
                    FILTER (WHERE ff.dff < {SEG_BOILER_DF}), '') AS clean_text
  FROM seg s
  JOIN targets t ON s.doc_id = t.doc_id
  JOIN ff USING (seg)
  GROUP BY s.doc_id
)
SELECT doc_id, doc_id >= {LINE_INCR_START} AS is_new,
       n_segs, removed_segs, clean_text,
       CAST(length(clean_text) AS INT) AS clean_n_chars
FROM per_doc
""",
)
def dedup_lines_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    K = LINE_INCR_START
    # feeds the base index, the batch delta, the crossing semi-join AND the
    # rewrite join — cut the lineage once (the scaled-twin lesson)
    segs = doc_segments(
        table(spark, sf_dir, "documents").select("doc_id", "text")
    ).localCheckpoint(eager=True)
    df_base = (
        segs.where(F.col("doc_id") < K)
        .groupBy("seg")
        .agg(F.countDistinct("doc_id").alias("dfb"))
    )
    df_delta = (
        segs.where(F.col("doc_id") >= K)
        .groupBy("seg")
        .agg(F.countDistinct("doc_id").alias("dfd"))
    )
    # the ONE index-merge join: stored base counts + batch delta
    df_full = (
        df_base.join(df_delta, "seg", "full_outer")
        .select(
            "seg",
            F.coalesce("dfb", F.lit(0)).alias("dfb"),
            (
                F.coalesce("dfb", F.lit(0)) + F.coalesce("dfd", F.lit(0))
            ).alias("dff"),
        )
    )
    crossing = df_full.where(
        (F.col("dfb") < SEG_BOILER_DF) & (F.col("dff") >= SEG_BOILER_DF)
    ).select("seg")
    affected = (
        segs.where(F.col("doc_id") < K)
        .join(crossing, "seg", "left_semi")
        .select("doc_id")
        .distinct()
    )
    targets = (
        segs.where(F.col("doc_id") >= K).select("doc_id").distinct().union(affected)
    ).distinct()
    kept = F.when(
        F.col("dff") < SEG_BOILER_DF, F.struct("seg_no", "seg")
    )
    return (
        segs.join(targets, "doc_id", "left_semi")
        .join(df_full.select("seg", "dff"), "seg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.count(
                F.when(F.col("dff") >= SEG_BOILER_DF, F.lit(1))
            ).alias("removed_segs"),
            F.concat_ws(
                " ",
                F.transform(F.array_sort(F.collect_list(kept)), lambda x: x.seg),
            ).alias("clean_text"),
        )
        .select(
            "doc_id",
            (F.col("doc_id") >= K).alias("is_new"),
            "n_segs",
            "removed_segs",
            "clean_text",
            F.length("clean_text").alias("clean_n_chars"),
        )
    )


# --------------------------------------------------------------------------
# Fuzzy best-match lookup (dirty-FK repair)
# --------------------------------------------------------------------------

FUZZY_PROBE_MOD = 3  # deterministic ~1/3 sample of the name dictionary
FUZZY_MAX_DIST = 2


@register(
    "fuzzy_lookup_best_match",
    category="linkage",
    doc="Fuzzy best-match lookup: a probe list of corrupted part names "
    "(5th character deleted — the dirty-FK / address-matching shape) "
    "resolved against the clean name dictionary. Blocking on the 4-char "
    "prefix (preserved by the corruption) turns the comparison into an "
    "equi-join; JVM levenshtein runs only inside blocks, and the best "
    f"match per probe is the (distance, name) minimum at distance ≤ "
    f"{FUZZY_MAX_DIST} — top-1 resolution, not pair enumeration "
    "(record_linkage_part_names covers that). Runs on the value "
    "dictionary; the probe side broadcasts.",
    oracle=f"""
WITH names AS (SELECT DISTINCT p_name AS name FROM part WHERE length(p_name) >= 6),
probes AS (
  SELECT substr(name, 1, 4) || substr(name, 6) AS probe
  FROM names
  WHERE ('0x' || substr(md5(name), 1, 15))::BIGINT % {FUZZY_PROBE_MOD} = 0
),
cand AS (
  SELECT p.probe, n.name, levenshtein(p.probe, n.name) AS dist
  FROM probes p JOIN names n ON substr(p.probe, 1, 4) = substr(n.name, 1, 4)
  WHERE abs(length(p.probe) - length(n.name)) <= {FUZZY_MAX_DIST}
    AND levenshtein(p.probe, n.name) <= {FUZZY_MAX_DIST}
)
SELECT probe, name AS matched_name, CAST(dist AS INTEGER) AS dist
FROM (
  SELECT probe, name, dist,
         row_number() OVER (PARTITION BY probe ORDER BY dist, name) AS rn
  FROM cand
) WHERE rn = 1
""",
)
def fuzzy_lookup_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wheels_in_motion_analytics_spark.functions.similarity import hash_hex

    names = (
        table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .where(F.length("name") >= 6)
        .distinct()
    )
    probes = names.where(
        hash_hex(F.col("name"), 15) % FUZZY_PROBE_MOD == 0
    ).select(
        F.concat(
            F.substring("name", 1, 4), F.expr("substr(name, 6)")
        ).alias("probe")
    )
    cand = (
        F.broadcast(probes)
        .join(names, F.substring("probe", 1, 4) == F.substring("name", 1, 4))
        .withColumn("dist", F.levenshtein("probe", "name"))
        .where(
            (F.abs(F.length("probe") - F.length("name")) <= FUZZY_MAX_DIST)
            & (F.col("dist") <= FUZZY_MAX_DIST)
        )
    )
    w = Window.partitionBy("probe").orderBy("dist", "name")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "probe",
            F.col("name").alias("matched_name"),
            F.col("dist").cast("int").alias("dist"),
        )
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking — the other classic ER candidate generator
# ---------------------------------------------------------------------------

SNM_WINDOW = 4  # compare records within this rank distance
SNM_MAX_DIST = 3


@register(
    "linkage_sorted_neighborhood",
    category="linkage",
    doc=f"Sorted-neighborhood entity resolution over the part-name "
    "dictionary: records sorted by name, candidate pairs = records within "
    f"rank distance {SNM_WINDOW} (the sliding window), matches kept at "
    f"levenshtein 1..{SNM_MAX_DIST}. The CLASSIC alternative to key "
    "blocking (record_linkage_part_names): a fixed candidate budget of "
    "w*n pairs regardless of key-skew — blocking keys blow up on hot "
    "blocks, the sorted window cannot. SCALE SHAPE: the global sort rank "
    "comes from the TWO-PHASE exact rank (never a single-task window); "
    "the window self-join is an equi-join on rank DIV window (each record "
    "lands in 2 coarse buckets, pairs checked within ±w) — shuffle "
    "bounded by 2n rows.",
    oracle=f"""
WITH names AS (SELECT DISTINCT p_name AS name FROM part),
ranked AS (
  SELECT name, row_number() OVER (ORDER BY name) AS rn FROM names
),
cand AS (
  SELECT a.name AS name_a, b.name AS name_b,
         CAST(b.rn - a.rn AS BIGINT) AS rank_gap
  FROM ranked a JOIN ranked b
    ON b.rn > a.rn AND b.rn <= a.rn + {SNM_WINDOW}
)
SELECT name_a, name_b, rank_gap,
       CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
FROM cand
WHERE levenshtein(name_a, name_b) BETWEEN 1 AND {SNM_MAX_DIST}
""",
)
def linkage_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wheels_in_motion_analytics_spark.operators.windows import global_row_number

    names = table(spark, sf_dir, "part").select(F.col("p_name").alias("name")).distinct()
    ranked = global_row_number(names, [F.asc("name")], rn_name="rn")
    # coarse-bucket equi-join: record r joins buckets floor(rn/w) and
    # floor(rn/w)+1, so every pair within rank distance w shares a bucket
    a = ranked.select(
        F.col("name").alias("name_a"),
        F.col("rn").alias("ra"),
        F.explode(
            F.array(
                F.expr(f"CAST(rn DIV {SNM_WINDOW} AS BIGINT)"),
                F.expr(f"CAST(rn DIV {SNM_WINDOW} AS BIGINT) + 1"),
            )
        ).alias("bkt"),
    )
    b = ranked.select(
        F.col("name").alias("name_b"),
        F.col("rn").alias("rb"),
        F.expr(f"CAST(rn DIV {SNM_WINDOW} AS BIGINT)").alias("bkt"),
    )
    cand = (
        a.join(b, "bkt")
        .where((F.col("rb") > F.col("ra")) & (F.col("rb") <= F.col("ra") + SNM_WINDOW))
        .dropDuplicates(["name_a", "name_b"])
        .select(
            "name_a",
            "name_b",
            (F.col("rb") - F.col("ra")).cast("bigint").alias("rank_gap"),
        )
    )
    return cand.select(
        "*", F.levenshtein("name_a", "name_b").cast("bigint").alias("dist")
    ).where(F.col("dist").between(1, SNM_MAX_DIST))
