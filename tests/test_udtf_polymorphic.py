"""Polymorphic Python UDTF (Spark 4 ``analyze`` static method): the output
schema is computed FROM THE ARGUMENTS at plan time — one table function
serves any input table, the API surface behind schema-generic exploders.
(The static-schema UDTF tier lives in functions/udfs.py
`udtf_expand_installments`.)"""

from __future__ import annotations


def test_polymorphic_udtf_schema_follows_arguments(spark):
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, lit, udtf
    from pyspark.sql.types import IntegerType, StructType

    @udtf
    class RepeatEach:
        """Emit each scalar argument value `n` times, schema derived from the
        argument's own type at analyze time."""

        @staticmethod
        def analyze(v: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            schema = (
                StructType()
                .add("val", v.dataType)
                .add("copy", IntegerType())
            )
            return AnalyzeResult(schema=schema)

        def eval(self, v, n):
            for i in range(n):
                yield (v, i)

    spark.udtf.register("repeat_each", RepeatEach)

    # string argument → string output column
    got = spark.sql("SELECT * FROM repeat_each('ab', 3)")
    assert [f.dataType.simpleString() for f in got.schema.fields] == ["string", "int"]
    assert [(r.val, r.copy) for r in got.collect()] == [("ab", 0), ("ab", 1), ("ab", 2)]

    # bigint argument → bigint output column, SAME udtf
    got2 = spark.sql("SELECT * FROM repeat_each(7L, 2)")
    assert got2.schema.fields[0].dataType.simpleString() == "bigint"
    assert [(r.val, r.copy) for r in got2.collect()] == [(7, 0), (7, 1)]


def test_polymorphic_udtf_lateral_join(spark):
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import IntegerType, StructType

    @udtf
    class CountdownFrom:
        @staticmethod
        def analyze(n: AnalyzeArgument) -> AnalyzeResult:
            return AnalyzeResult(
                schema=StructType().add("step", n.dataType)
            )

        def eval(self, n):
            for i in range(n, 0, -1):
                yield (i,)

    spark.udtf.register("countdown_from", CountdownFrom)
    df = spark.createDataFrame([(1, 2), (2, 3)], "id int, n int")
    df.createOrReplaceTempView("cd_input")
    rows = spark.sql(
        "SELECT id, step FROM cd_input, LATERAL countdown_from(n)"
    ).collect()
    assert sorted((r.id, r.step) for r in rows) == [
        (1, 1), (1, 2), (2, 1), (2, 2), (2, 3),
    ]
