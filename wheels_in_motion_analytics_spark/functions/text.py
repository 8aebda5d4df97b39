"""Text-analysis operators over the ``documents`` table (north-star surface,
BASELINE.json): token counting, quality scoring, language-ID heuristic,
document fingerprinting.

Everything is built from JVM regexp/array built-ins — per-row Python never
touches the hot path, so all of it whole-stage-codegens and scales linearly
with input splits (no shuffle at all except where grouping is the point).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table

# Marker stopwords per language for the n-gram/lexicon language-ID heuristic.
# Deterministic and tiny by design — replace with real lexicons in production.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "fr": ("le", "les", "des", "et", "un", "une"),
}

STOPWORDS = LANG_MARKERS["en"]

_WS = r"\s+"
# BPE-ish word/number/punct tokenizer (public GPT-2-style shape).
_BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(col: Column) -> Column:
    """Whitespace tokens, empty strings removed, lowercased."""
    return F.filter(F.split(F.lower(col), _WS), lambda x: x != "")


def count_in_set(toks: Column, words: tuple[str, ...]) -> Column:
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit_arr, t)))


def _oracle_count_in(words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(toks, t -> t IN ({inlist})))"


_ORACLE_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"


@register(
    "text_stats",
    category="text",
    doc="Token counts (whitespace + BPE-ish regex), char length, punctuation "
    "ratio, stopword ratio — the per-document quality signals.",
    oracle=f"""
WITH t AS (SELECT doc_id, text, {_ORACLE_TOKS} AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS INTEGER) AS n_bpe_tokens,
       CAST(length(text) AS INTEGER) AS n_chars_calc,
       CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS INTEGER) AS n_punct,
       CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
         / greatest(length(text), 1) AS punct_ratio,
       CAST({_oracle_count_in(STOPWORDS)} AS DOUBLE) / greatest(len(toks), 1) AS stopword_ratio
FROM t
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).alias("n_bpe_tokens"),
        F.length("text").cast("int").alias("n_chars_calc"),
        n_punct.cast("int").alias("n_punct"),
        (n_punct.cast("double") / F.greatest(F.length("text"), F.lit(1))).alias("punct_ratio"),
        (
            count_in_set(toks, STOPWORDS).cast("double")
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("stopword_ratio"),
    )


@register(
    "text_quality_score",
    category="text",
    doc="Deterministic document quality score: length saturation + stopword "
    "presence - punctuation noise (integer-ratio arithmetic, rounded).",
    oracle=f"""
WITH t AS (SELECT doc_id, text, {_ORACLE_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
         len(toks) AS nt,
         CAST({_oracle_count_in(STOPWORDS)} AS DOUBLE) / greatest(len(toks), 1) AS swr,
         CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS pr
  FROM t
)
SELECT doc_id,
       ROUND(0.5 * least(CAST(nt AS DOUBLE) / 100, 1.0) + 0.3 * least(swr * 5, 1.0)
             + 0.2 * (1.0 - least(pr * 10, 1.0)), 6) AS quality
FROM s
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    nt = F.size(toks)
    swr = count_in_set(toks, STOPWORDS).cast("double") / F.greatest(nt, F.lit(1))
    pr = F.length(F.regexp_replace("text", r"[^.,;:!?]", "")).cast("double") / F.greatest(
        F.length("text"), F.lit(1)
    )
    quality = F.round(
        0.5 * F.least(nt.cast("double") / 100, F.lit(1.0))
        + 0.3 * F.least(swr * 5, F.lit(1.0))
        + 0.2 * (F.lit(1.0) - F.least(pr * 10, F.lit(1.0))),
        6,
    )
    return df.select("doc_id", quality.alias("quality"))


@register(
    "lang_id_heuristic",
    category="text",
    doc="Language ID via marker-stopword voting (argmax with fixed priority "
    "en>es>fr, 'und' when no markers hit).",
    oracle=f"""
WITH t AS (SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents),
c AS (
  SELECT doc_id,
         {_oracle_count_in(LANG_MARKERS["en"])} AS c_en,
         {_oracle_count_in(LANG_MARKERS["es"])} AS c_es,
         {_oracle_count_in(LANG_MARKERS["fr"])} AS c_fr
  FROM t
)
SELECT doc_id,
       CASE WHEN c_en = 0 AND c_es = 0 AND c_fr = 0 THEN 'und'
            WHEN c_en >= c_es AND c_en >= c_fr THEN 'en'
            WHEN c_es >= c_fr THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM c
""",
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    c_en = count_in_set(toks, LANG_MARKERS["en"])
    c_es = count_in_set(toks, LANG_MARKERS["es"])
    c_fr = count_in_set(toks, LANG_MARKERS["fr"])
    pred = (
        F.when((c_en == 0) & (c_es == 0) & (c_fr == 0), "und")
        .when((c_en >= c_es) & (c_en >= c_fr), "en")
        .when(c_es >= c_fr, "es")
        .otherwise("fr")
    )
    return df.select("doc_id", pred.alias("lang_pred"))


def fingerprint(col: Column) -> Column:
    """Normalization fingerprint: lowercase, collapse whitespace, md5."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), _WS, " ")))


@register(
    "doc_fingerprint",
    category="text",
    doc="Document fingerprint: md5 over whitespace-normalized lowercase text "
    "— the exact-dedup key.",
    oracle="""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
FROM documents
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition filters (Rae et al. 2021 §A1.1, token-fraction
# adaptation) — the standard pre-training curation gate for repetitive docs
# ---------------------------------------------------------------------------


def _oracle_gopher() -> str:
    """DuckDB rendition: identical n-gram relations built by unnesting an
    index range over the token list, identical integer-only verdicts."""
    return f"""
WITH base AS (
  SELECT doc_id, {_ORACLE_TOKS} AS t FROM documents
),
docs AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens, t FROM base),
g2 AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS gram
  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        FROM docs WHERE n_tokens >= 2)
),
g3 AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS gram
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
        FROM docs WHERE n_tokens >= 3)
),
s2 AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n2,
         CAST(COUNT(*) AS BIGINT) AS d2, CAST(MAX(c) AS BIGINT) AS top2
  FROM (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram)
  GROUP BY doc_id
),
s3 AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n3,
         CAST(COUNT(*) AS BIGINT) AS d3, CAST(MAX(c) AS BIGINT) AS top3
  FROM (SELECT doc_id, gram, COUNT(*) AS c FROM g3 GROUP BY doc_id, gram)
  GROUP BY doc_id
)
SELECT d.doc_id, d.n_tokens,
       COALESCE(s2.n2, 0) AS n2, COALESCE(s2.d2, 0) AS d2,
       COALESCE(s2.top2, 0) AS top2,
       COALESCE(s3.n3, 0) AS n3, COALESCE(s3.d3, 0) AS d3,
       COALESCE(s3.top3, 0) AS top3,
       (COALESCE(s2.n2, 0) - COALESCE(s2.d2, 0)) * 5 > COALESCE(s2.n2, 0)
         AS fail_dup2,
       (COALESCE(s3.n3, 0) - COALESCE(s3.d3, 0)) * 50 > COALESCE(s3.n3, 0) * 9
         AS fail_dup3,
       COALESCE(s2.top2, 0) * 5 > COALESCE(s2.n2, 0) AS fail_top2,
       NOT ((COALESCE(s2.n2, 0) - COALESCE(s2.d2, 0)) * 5 > COALESCE(s2.n2, 0)
         OR (COALESCE(s3.n3, 0) - COALESCE(s3.d3, 0)) * 50
              > COALESCE(s3.n3, 0) * 9
         OR COALESCE(s2.top2, 0) * 5 > COALESCE(s2.n2, 0)) AS keep
FROM docs d LEFT JOIN s2 ON d.doc_id = s2.doc_id
            LEFT JOIN s3 ON d.doc_id = s3.doc_id
"""


@register(
    "gopher_repetition_filters",
    category="text",
    doc="Gopher repetition filters (Rae et al. 2021, Appendix A1.1), "
    "token-count adaptation: per document, duplicate-2-gram fraction "
    "(> 0.20 fails), duplicate-3-gram fraction (> 0.18 fails) and "
    "top-2-gram fraction (> 0.20 fails), plus the combined keep verdict — "
    "the standard pre-training curation gate against boilerplate and "
    "degenerate repetition. SCALE SHAPE: n-grams explode to a "
    "(doc, gram, count) relation and reduce with two partial-aggregable "
    "groupBys — never a per-doc Python kernel, never a map of the full "
    "vocabulary; linear in corpus tokens and embarrassingly partitionable "
    "by doc. All verdicts are exact integer comparisons (fraction > p "
    "rewritten as count-times-denominator inequalities) so the gate is "
    "engine- and partitioning-deterministic end to end.",
    oracle=_oracle_gopher(),
)
def gopher_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", tokens(F.col("text")).alias("t"))
        .select("doc_id", F.size("t").cast("bigint").alias("n_tokens"), "t")
    )

    def gram_stats(n: int, pre: str) -> DataFrame:
        parts = ", ".join(f"t[i + {k}]" for k in range(n))
        grams = docs.where(F.col("n_tokens") >= n).select(
            "doc_id",
            F.explode(
                F.expr(f"transform(sequence(0, size(t) - {n}), i -> "
                       f"concat_ws(' ', {parts}))")
            ).alias("gram"),
        )
        per_gram = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
        return per_gram.groupBy("doc_id").agg(
            F.sum("c").alias(f"n{pre}"),
            F.count(F.lit(1)).alias(f"d{pre}"),
            F.max("c").alias(f"top{pre}"),
        )

    z = F.lit(0).cast("bigint")
    out = (
        docs.select("doc_id", "n_tokens")
        .join(gram_stats(2, "2"), "doc_id", "left")
        .join(gram_stats(3, "3"), "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n2", z).alias("n2"),
            F.coalesce("d2", z).alias("d2"),
            F.coalesce("top2", z).alias("top2"),
            F.coalesce("n3", z).alias("n3"),
            F.coalesce("d3", z).alias("d3"),
            F.coalesce("top3", z).alias("top3"),
        )
    )
    fail_dup2 = (F.col("n2") - F.col("d2")) * 5 > F.col("n2")
    fail_dup3 = (F.col("n3") - F.col("d3")) * 50 > F.col("n3") * 9
    fail_top2 = F.col("top2") * 5 > F.col("n2")
    return out.select(
        "*",
        fail_dup2.alias("fail_dup2"),
        fail_dup3.alias("fail_dup3"),
        fail_top2.alias("fail_top2"),
        (~(fail_dup2 | fail_dup3 | fail_top2)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Readability — Flesch reading-ease on exact integer arithmetic
# ---------------------------------------------------------------------------


@register(
    "readability_flesch_audit",
    category="text",
    doc="Flesch reading-ease audit per document: 206.835 - 1.015*(words/"
    "sentences) - 84.6*(syllables/words), with sentences = non-overlapping "
    "[.!?]+ runs (min 1), syllables = [aeiouy]+ vowel runs (the standard "
    "heuristic), words = whitespace tokens. The two rational terms are "
    "exact HALF-UP integer divisions in milli units — the score is a "
    "deterministic integer on both engines (no float division). One "
    "projection scan, zero shuffles below the output.",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         CAST(len({_ORACLE_TOKS}) AS BIGINT) AS words,
         greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1) AS sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS syllables
  FROM documents
)
SELECT doc_id, words, sentences, syllables,
       CAST(206835
            - (2 * 1015 * words + sentences) // (2 * sentences)
            - CASE WHEN words = 0 THEN 0
                   ELSE (2 * 84600 * syllables + words) // (2 * words) END
            AS BIGINT) AS flesch_milli
FROM t
""",
)
def readability_flesch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = F.col
    t = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("words"),
        F.greatest(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), F.lit(0))),
            F.lit(1),
        )
        .cast("bigint")
        .alias("sentences"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[aeiouy]+"), F.lit(0))
        )
        .cast("bigint")
        .alias("syllables"),
    )
    return t.select(
        "doc_id",
        "words",
        "sentences",
        "syllables",
        (
            F.lit(206835)
            - F.expr("(2 * 1015 * words + sentences) DIV (2 * sentences)")
            - F.when(c("words") == 0, F.lit(0)).otherwise(
                F.expr("(2 * 84600 * syllables + words) DIV (2 * words)")
            )
        )
        .cast("bigint")
        .alias("flesch_milli"),
    )
