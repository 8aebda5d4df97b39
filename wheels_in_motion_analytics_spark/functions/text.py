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
