"""BPE tokenizer-training semantics: merge selection, two-sweep application,
and corpus-weighted symbol accounting (functions/tokenizer.py). The full
cross-engine differential runs in test_differential.py; these tests pin the
algorithm itself on hand-computable vocabularies."""

from __future__ import annotations

import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.functions.tokenizer import (
    train_bpe,
    word_freqs,
)


def _vocab(spark, rows):
    return spark.createDataFrame(rows, "w string, f long")


def test_first_merge_is_max_weighted_pair(spark):
    # 'ab' adjacency weight: 3 (abc) + 2 (zab) = 5; 'q </w>' = 4; rest < 5
    vocab = _vocab(spark, [("abc", 3), ("zab", 2), ("q", 4)])
    learned, _ = train_bpe(vocab, merges=1)
    assert learned == ["a b"]


def test_tie_breaks_lexicographically(spark):
    # 'ab' and 'cd' both appear once; lexicographically smaller pair wins.
    # ('b </w>' / 'd </w>' also appear once; 'a b' < 'b </w>' < 'c d')
    vocab = _vocab(spark, [("ab", 1), ("cd", 1)])
    learned, _ = train_bpe(vocab, merges=1)
    assert learned == ["a b"]


def test_two_sweep_merges_alternating_run(spark):
    # ' a b a b </w> ': one left-to-right sweep merges only the first 'a b'
    # (the match consumes the separator); the second sweep catches the rest.
    vocab = _vocab(spark, [("abab", 5)])
    learned, seqs = train_bpe(vocab, merges=1)
    assert learned == ["a b"]
    seq = seqs.collect()[0].seq
    assert seq == " ab ab </w> "


def test_merged_symbol_weighted_by_word_freq(spark):
    # 'a a' = 5 + 4 = 9 strictly beats 'a </w>' = 4 and 'a b' = 'b </w>' = 5
    vocab = _vocab(spark, [("aab", 5), ("aa", 4)])
    learned, seqs = train_bpe(vocab, merges=1)
    assert learned == ["a a"]
    freqs = {
        r.sym: r.freq
        for r in seqs.select(
            "f", F.explode(F.expr("filter(split(seq, ' '), x -> x != '')")).alias("sym")
        )
        .groupBy("sym")
        .agg(F.sum("f").alias("freq"))
        .collect()
    }
    assert freqs["aa"] == 9  # 5 from 'aab' + 4 from 'aa'
    assert freqs["b"] == 5
    assert freqs["</w>"] == 9


def test_word_freqs_collapses_corpus(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, "the cat the hat"), (1, "the cat")], "doc_id long, text string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    wf = {r.w: r.f for r in word_freqs(spark, str(tmp_path)).collect()}
    assert wf == {"the": 3, "cat": 2, "hat": 1}


def test_fertility_invariants_and_totals(spark):
    """Fertility >= 1 (BPE never splits below 1 token/word after merges
    cap at word length), per-lang totals reconcile with the corpus, and
    the ratio grids replay exactly."""
    from tests.conftest import SF_SMALL
    from wheels_in_motion_analytics_spark.registry import load_all_queries
    from wheels_in_motion_analytics_spark.tables import table

    rows = load_all_queries()["tokenizer_fertility_audit"].fn(spark, SF_SMALL).collect()
    total_words = 0
    for r in rows:
        assert r["n_bpe_tokens"] >= r["n_words"]  # >= 1 token per word
        assert r["fertility_ppm"] == (
            2_000_000 * r["n_bpe_tokens"] + r["n_words"]
        ) // (2 * r["n_words"])
        assert r["chars_per_token_milli"] == (
            2_000 * r["n_chars"] + r["n_bpe_tokens"]
        ) // (2 * r["n_bpe_tokens"])
        total_words += r["n_words"]
    corpus_words = (
        table(spark, SF_SMALL, "documents")
        .selectExpr("size(filter(split(lower(text), '\\\\s+'), x -> x != '')) AS n")
        .groupBy()
        .sum("n")
        .collect()[0][0]
    )
    assert total_words == corpus_words
