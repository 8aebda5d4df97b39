"""Extended scalar coverage: bitwise ops and the long tail of string
functions (edit distance, padding, translate, soundex-adjacent)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table


@register(
    "bitwise_funcs_suite",
    category="scalars",
    doc="Bitwise AND/OR/XOR/NOT, shifts, bit_count over integer keys.",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 1 AS set_low,
       xor(o_orderkey, 21845) AS xored,
       CAST(~o_orderkey AS BIGINT) AS negated,
       o_orderkey << 2 AS shl2,
       o_orderkey >> 3 AS shr3,
       CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
FROM orders
""",
)
def bitwise_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(1)).alias("set_low"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.bitwise_not(k).alias("negated"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).cast("int").alias("popcount"),
    )


@register(
    "string_funcs_suite2",
    category="scalars",
    doc="String long tail: ucfirst, lpad/rpad, translate, repeat, reverse, "
    "ascii, levenshtein, position.",
    oracle="""
SELECT s_suppkey,
       upper(s_name[1:1]) || lower(s_name[2:]) AS name_title,
       lpad(CAST(s_suppkey AS VARCHAR), 8, '0') AS key_padded,
       rpad(s_name, 20, '.') AS name_dotted,
       translate(s_name, '#', '-') AS name_dashed,
       repeat('ab', 3) AS abab,
       reverse(s_name) AS name_rev,
       CAST(ascii(s_name) AS INTEGER) AS first_char_code,
       CAST(levenshtein(s_name, 'Supplier#000000001') AS INTEGER) AS edit_dist,
       CAST(position('#' IN s_name) AS INTEGER) AS hash_pos
FROM supplier
""",
)
def string_funcs_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.concat(
            F.upper(F.substring("s_name", 1, 1)),
            F.lower(F.expr("substring(s_name, 2)")),
        ).alias("name_title"),
        F.lpad(F.col("s_suppkey").cast("string"), 8, "0").alias("key_padded"),
        F.rpad("s_name", 20, ".").alias("name_dotted"),
        F.translate("s_name", "#", "-").alias("name_dashed"),
        F.repeat(F.lit("ab"), 3).alias("abab"),
        F.reverse("s_name").alias("name_rev"),
        F.ascii("s_name").cast("int").alias("first_char_code"),
        F.levenshtein("s_name", F.lit("Supplier#000000001")).cast("int").alias("edit_dist"),
        F.instr("s_name", "#").cast("int").alias("hash_pos"),
    )


@register(
    "try_funcs_suite",
    category="scalars",
    doc="ANSI-safe try_* error handling: try_divide (NULL on zero divisor, "
    "never a runtime error or silent ±Inf), try_cast (NULL on malformed "
    "input, with a success case alongside), try_element_at (NULL past the "
    "array bound; index 0 is rejected by Spark — INVALID_INDEX_OF_ZERO — so "
    "the index expression maps to 1-based). DuckDB mirrors via NULLIF "
    "division, TRY_CAST, and its NULL-on-out-of-bounds list indexing. The "
    "at-scale story: one malformed row cannot kill a 1000-executor job.",
    oracle="""
SELECT o_orderkey,
       o_totalprice / NULLIF(CAST(o_orderkey % 3 AS DOUBLE), 0.0) AS safe_ratio,
       TRY_CAST(o_orderstatus AS INTEGER) AS bad_int,
       TRY_CAST(CAST(o_orderkey AS VARCHAR) AS INTEGER) AS good_int,
       (['a', 'b', 'c'])[CAST(o_orderkey % 5 AS INTEGER) + 1] AS elem
FROM orders
""",
)
def try_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), (k % 3).cast("double")).alias("safe_ratio"),
        F.expr("try_cast(o_orderstatus AS INT)").alias("bad_int"),
        F.expr("try_cast(CAST(o_orderkey AS STRING) AS INT)").alias("good_int"),
        F.try_element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")), ((k % 5) + 1).cast("int")
        ).alias("elem"),
    )


@register(
    "higher_order_funcs_suite",
    category="scalars",
    doc="Higher-order array lambdas: transform/filter/exists/forall/"
    "aggregate/sequence/flatten/sort/reverse/slice over an array built "
    "from lineitem measures. All JVM-side Catalyst lambda expressions "
    "(one codegen stage, no UDF); integer-grid values so list_sum vs "
    "aggregate accumulate identically. Array outputs emitted as joined "
    "strings — scalar cells for the driver canonicalizer.",
    oracle="""
SELECT l_orderkey, l_linenumber,
       array_to_string(list_transform(a, x -> x * 2), ',') AS doubled,
       array_to_string(list_filter(a, x -> x > 1000), ',') AS big_vals,
       CAST(len(list_filter(a, x -> x > 1000)) > 0 AS BOOLEAN) AS any_big,
       CAST(len(list_filter(a, x -> NOT (x >= 0))) = 0 AS BOOLEAN) AS all_nonneg,
       CAST(list_sum(a) AS BIGINT) AS total,
       array_to_string(list_sort(a), ',') AS sorted_a,
       array_to_string(list_reverse(a), ',') AS reversed_a,
       array_to_string(list_slice(a, 2, 3), ',') AS mid_slice,
       array_to_string(generate_series(1, l_linenumber), ',') AS seq_ln,
       array_to_string(flatten([a, list_reverse(a)]), ',') AS doubled_up,
       CAST(list_position(a, CAST(l_quantity AS BIGINT)) AS INTEGER) AS qty_pos
FROM (
  SELECT l_orderkey, l_linenumber, l_quantity,
         [CAST(l_quantity AS BIGINT),
          CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),
          CAST(floor(l_discount * 100 + 0.5) AS BIGINT),
          CAST(floor(l_tax * 100 + 0.5) AS BIGINT)] AS a
  FROM lineitem
) t
""",
)
def higher_order_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    arr = F.array(
        F.col("l_quantity").cast("bigint"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint"),
        F.floor(F.col("l_tax") * 100 + 0.5).cast("bigint"),
    )
    base = li.select("l_orderkey", "l_linenumber", "l_quantity", arr.alias("a"))
    a = F.col("a")
    j = lambda c: F.array_join(c, ",")  # noqa: E731
    return base.select(
        "l_orderkey",
        "l_linenumber",
        j(F.transform(a, lambda x: x * 2)).alias("doubled"),
        j(F.filter(a, lambda x: x > 1000)).alias("big_vals"),
        F.exists(a, lambda x: x > 1000).alias("any_big"),
        F.forall(a, lambda x: x >= 0).alias("all_nonneg"),
        F.aggregate(a, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("total"),
        j(F.sort_array(a)).alias("sorted_a"),
        j(F.reverse(a)).alias("reversed_a"),
        j(F.slice(a, 2, 2)).alias("mid_slice"),
        j(F.sequence(F.lit(1), F.col("l_linenumber"))).alias("seq_ln"),
        j(F.flatten(F.array(a, F.reverse(a)))).alias("doubled_up"),
        F.array_position(a, F.col("l_quantity").cast("bigint"))
        .cast("int")
        .alias("qty_pos"),
    )


@register(
    "null_semantics_suite",
    category="scalars",
    doc="NULL semantics end-to-end: nullif manufactures NULLs (the testdata "
    "ships none), then coalesce/ifnull/nvl2/null-safe equality (<=> / IS "
    "NOT DISTINCT FROM) and NULL-vs-zero arithmetic propagation — the "
    "corner every SQL port gets wrong first.",
    oracle="""
SELECT l_orderkey, l_linenumber,
       nullif(l_discount, 0.0) AS d_null,
       coalesce(nullif(l_discount, 0.0), -1.0) AS d_coalesced,
       CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 'no-disc' ELSE 'disc' END AS d_tag,
       (nullif(l_discount, 0.0) IS NOT DISTINCT FROM nullif(l_tax, 0.0)) AS d_eq_t_nullsafe,
       (nullif(l_discount, 0.0) = nullif(l_tax, 0.0)) AS d_eq_t_plain,
       round(nullif(l_discount, 0.0) * 100, 6) AS d_scaled_nullprop,
       CAST(count(nullif(l_discount, 0.0)) OVER () AS BIGINT) AS nonnull_total
FROM lineitem
""",
)
def null_semantics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    d = F.nullif(F.col("l_discount"), F.lit(0.0))
    t = F.nullif(F.col("l_tax"), F.lit(0.0))
    # count(...) OVER () as a broadcast scalar join, not an empty-partition
    # window — the window form funnels the whole fact through one task.
    total = li.agg(F.count(d).alias("nonnull_total"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        d.alias("d_null"),
        F.coalesce(d, F.lit(-1.0)).alias("d_coalesced"),
        F.when(d.isNull(), "no-disc").otherwise("disc").alias("d_tag"),
        d.eqNullSafe(t).alias("d_eq_t_nullsafe"),
        (d == t).alias("d_eq_t_plain"),
        F.round(d * 100, 6).alias("d_scaled_nullprop"),
    ).crossJoin(F.broadcast(total))


@register(
    "conditional_agg_suite",
    category="aggregates",
    doc="Conditional/boolean aggregates per group: count_if, bool_and/"
    "bool_or, conditional decimal sums (FILTER-style), and null-aware "
    "count over a manufactured nullable column.",
    oracle="""
SELECT l_returnflag,
       CAST(count_if(l_quantity > 25) AS BIGINT) AS n_big,
       bool_and(l_quantity > 0) AS all_positive,
       bool_or(l_discount > 0.09) AS any_deep_discount,
       CAST(SUM(CAST(CASE WHEN l_quantity > 25 THEN l_extendedprice ELSE 0 END
                AS DECIMAL(18,4))) AS DOUBLE) AS big_revenue,
       COUNT(nullif(l_discount, 0.0)) AS n_discounted
FROM lineitem
GROUP BY l_returnflag
""",
)
def conditional_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wheels_in_motion_analytics_spark.compat import dsum

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_big"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        dsum(
            F.when(F.col("l_quantity") > 25, F.col("l_extendedprice")).otherwise(0.0)
        ).alias("big_revenue"),
        F.count(F.nullif(F.col("l_discount"), F.lit(0.0))).alias("n_discounted"),
    )


@register(
    "collated_group_case_insensitive",
    category="scalars",
    doc="Collation-aware grouping (Spark 4 collations): order priorities with "
    "manufactured case variation (upper on even keys, lower on odd) grouped "
    "under UTF8_LCASE — the engine merges case variants WITHOUT a lower() "
    "rewrite on the grouping expression. Because the collation picks an "
    "arbitrary representative per group, the emitted key is normalized with "
    "lower() so the output (not the grouping mechanism) is deterministic. "
    "Oracle: the lower() rewrite, which is semantically equivalent for "
    "ASCII data.",
    oracle="""
SELECT lower(p) AS priority,
       COUNT(*) AS n_orders
FROM (
  SELECT CASE WHEN o_orderkey % 2 = 0 THEN upper(o_orderpriority)
              ELSE lower(o_orderpriority) END AS p
  FROM orders
)
GROUP BY 1
""",
)
def collated_group_case_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    cased = table(spark, sf_dir, "orders").select(
        F.when(
            F.col("o_orderkey") % 2 == 0, F.upper("o_orderpriority")
        )
        .otherwise(F.lower("o_orderpriority"))
        .alias("p")
    )
    return (
        cased.groupBy(F.expr("p COLLATE UTF8_LCASE").alias("pk"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.lower(F.col("pk").cast("string")).alias("priority"), "n_orders"
        )
    )


@register(
    "generator_funcs_suite",
    category="scalars",
    doc="Row-generator functions: stack() (the k-column unpivot generator) "
    "and posexplode_outer() (position-indexed explode that keeps "
    "empty-array rows as NULLs) over the urgent-orders slice, tagged and "
    "unioned into one relation. Generators multiply rows JVM-side inside "
    "codegen — the 100 TB-safe fan-out (no UDTF, no Python). Oracle builds "
    "the same rows with UNION ALL + unnest-with-ordinality arithmetic.",
    oracle="""
WITH o AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(length(o_orderpriority) AS BIGINT) AS prio_len
  FROM orders WHERE o_orderpriority = '1-URGENT'
),
stacked AS (
  SELECT o_orderkey, 'stack' AS gen, CAST(NULL AS INTEGER) AS pos, 'total' AS metric, cents AS val FROM o
  UNION ALL
  SELECT o_orderkey, 'stack', NULL, 'half', cents // 2 FROM o
  UNION ALL
  SELECT o_orderkey, 'stack', NULL, 'prio_len', prio_len FROM o
),
pe AS (
  SELECT o_orderkey, 'posexplode_outer' AS gen,
         CAST(CASE WHEN cents > 20000000 THEN u.i - 1 END AS INTEGER) AS pos,
         CAST(NULL AS VARCHAR) AS metric,
         CASE WHEN cents > 20000000
              THEN CASE WHEN u.i = 1 THEN cents ELSE cents // 2 END END AS val
  FROM o LEFT JOIN (SELECT unnest(range(1, 3)) AS i) u
    ON cents > 20000000 OR u.i = 1
)
SELECT * FROM stacked UNION ALL SELECT * FROM pe
""",
)
def generator_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
            F.length("o_orderpriority").cast("bigint").alias("prio_len"),
        )
    )
    stacked = o.selectExpr(
        "o_orderkey",
        "'stack' AS gen",
        "stack(3, 'total', cents, 'half', CAST(cents DIV 2 AS BIGINT), "
        "'prio_len', prio_len) AS (metric, val)",
    ).select(
        "o_orderkey", "gen", F.lit(None).cast("int").alias("pos"), "metric", "val"
    )
    # rows above the threshold explode both entries; others have an empty
    # array and must SURVIVE with NULL pos/val (the _outer contract)
    big = F.filter(
        F.array(F.col("cents"), F.expr("CAST(cents DIV 2 AS BIGINT)")),
        lambda x: F.col("cents") > 20000000,
    )
    pe = o.select(
        "o_orderkey",
        F.lit("posexplode_outer").alias("gen"),
        F.posexplode_outer(big),
    ).select(
        "o_orderkey",
        "gen",
        F.col("pos").cast("int").alias("pos"),
        F.lit(None).cast("string").alias("metric"),
        F.col("col").alias("val"),
    )
    return stacked.unionByName(pe)


@register(
    "map_hof_suite",
    category="scalars",
    doc="Map higher-order functions: map_from_arrays, transform_keys/"
    "transform_values, map_filter, map_zip_with, map_concat, element_at — "
    "all Catalyst lambda expressions (no UDF). Maps are emitted as "
    "key-sorted 'k:v' joined strings (canonical scalar cells). The oracle "
    "computes the RESULT strings arithmetically from the scalar columns — "
    "map semantics cross-checked without requiring map HOFs in DuckDB.",
    oracle="""
SELECT l_orderkey, l_linenumber,
       'd:' || (dc * 2) || ',p:' || (pc * 2) || ',q:' || (qc * 2) AS doubled_vals,
       'D:' || dc || ',P:' || pc || ',Q:' || qc AS upper_keys,
       CASE WHEN pc > 100000 THEN 'p:' || pc ELSE '' END AS big_entries,
       'd:' || (dc + dc) || ',p:' || (pc + pc) || ',q:' || (qc + qc) AS zipped_sum,
       'd:' || dc || ',p:' || pc || ',q:' || qc || ',t:' || tc AS with_tax,
       pc AS price_entry
FROM (
  SELECT l_orderkey, l_linenumber,
         CAST(l_quantity AS BIGINT) AS qc,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS dc,
         CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tc
  FROM lineitem WHERE l_linenumber = 1
) t
""",
)
def map_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one line per order: map HOFs are interpreted (non-codegen) Catalyst
    # expressions — the suite demonstrates semantics, not scan volume
    li = table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qc"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint").alias("pc"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint").alias("dc"),
        F.floor(F.col("l_tax") * 100 + 0.5).cast("bigint").alias("tc"),
    )
    m = F.map_from_arrays(
        F.array(F.lit("q"), F.lit("p"), F.lit("d")),
        F.array(F.col("qc"), F.col("pc"), F.col("dc")),
    )

    def render(mcol):
        entries = F.array_sort(F.map_entries(mcol))
        return F.array_join(
            F.transform(entries, lambda e: F.concat_ws(":", e["key"], e["value"])), ","
        )

    base = li.withColumn("m", m)
    return base.select(
        "l_orderkey",
        "l_linenumber",
        render(F.transform_values(F.col("m"), lambda k, v: v * 2)).alias("doubled_vals"),
        render(F.transform_keys(F.col("m"), lambda k, v: F.upper(k))).alias("upper_keys"),
        render(F.map_filter(F.col("m"), lambda k, v: v > 100000)).alias("big_entries"),
        render(
            F.map_zip_with(F.col("m"), F.col("m"), lambda k, v1, v2: v1 + v2)
        ).alias("zipped_sum"),
        render(
            F.map_concat(F.col("m"), F.create_map(F.lit("t"), F.col("tc")))
        ).alias("with_tax"),
        F.element_at(F.col("m"), F.lit("p")).alias("price_entry"),
    )
