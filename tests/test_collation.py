"""Collation & locale string semantics (Spark 4 collation support) — pinned
so engine upgrades or JVM-locale drift can't silently change comparison
semantics the way the MMMyyyy month-name trap did (functions/datetime_dim.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_lcase_collation_equality_and_distinct(spark):
    # default UTF8_BINARY: case-sensitive
    assert not spark.sql("SELECT 'abc' = 'ABC' AS eq").collect()[0].eq
    # UTF8_LCASE: case-insensitive compare without rewriting to lower(x)
    assert spark.sql(
        "SELECT 'abc' COLLATE UTF8_LCASE = 'ABC' COLLATE UTF8_LCASE AS eq"
    ).collect()[0].eq
    # DISTINCT under the collation merges case variants
    df = spark.createDataFrame([("Promo",), ("PROMO",), ("promo",), ("other",)], "s string")
    n_binary = df.select("s").distinct().count()
    n_lcase = df.select(F.expr("s COLLATE UTF8_LCASE").alias("s")).distinct().count()
    assert (n_binary, n_lcase) == (4, 2)


def test_binary_sort_order_is_codepoint_order(spark):
    """The engine's ORDER BY on strings is codepoint order (uppercase block
    before lowercase, accents after ASCII) — the property every
    deterministic tiebreak in the registry relies on."""
    df = spark.createDataFrame([("b",), ("A",), ("a",), ("B",), ("á",)], "s string")
    got = [r.s for r in df.orderBy("s").collect()]
    assert got == ["A", "B", "a", "b", "á"]


def test_case_functions_are_locale_independent(spark):
    """upper/lower use root-locale one-to-one mappings for ASCII — the
    Turkish-I trap (locale tr: 'I'.lower() == 'ı') must not apply."""
    row = spark.sql("SELECT lower('TITLE') AS lo, upper('title') AS up").collect()[0]
    assert (row.lo, row.up) == ("title", "TITLE")


def test_lcase_collation_in_filter_matches_lower_rewrite(spark):
    df = spark.createDataFrame(
        [("URGENT",), ("urgent",), ("Urgent",), ("low",)], "p string"
    )
    via_collation = df.where(F.expr("p COLLATE UTF8_LCASE = 'urgent'")).count()
    via_lower = df.where(F.lower("p") == "urgent").count()
    assert via_collation == via_lower == 3
