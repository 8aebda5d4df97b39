"""Arrow-native & Variant surface (Spark 4 features).

mapInArrow skips the pandas layer entirely — RecordBatches in, RecordBatches
out — the lowest-overhead Python hook for columnar transforms (pandas
conversion cost matters when the UDF itself is trivial).

VariantType is Spark 4's semi-structured type: parse_json once, then typed
variant_get extraction — the engine-native way to keep the reference's
weather-JSON shape queryable without flattening (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from wheels_in_motion_analytics_spark.registry import register
from wheels_in_motion_analytics_spark.tables import table


@register(
    "map_in_arrow_scale",
    category="udf",
    doc="mapInArrow: columnar value scaling straight on Arrow RecordBatches "
    "(no pandas materialization). Deterministic arithmetic — oracle-checked.",
    oracle="""
SELECT event_id, ROUND(value * 100, 4) AS value_cents
FROM events
""",
)
def map_in_arrow_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.types as T

    def scale(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pc.round(pc.multiply(batch.column(1), pa.scalar(100.0)), ndigits=4),
                ],
                names=["event_id", "value_cents"],
            )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("value_cents", T.DoubleType()),
        ]
    )
    return table(spark, sf_dir, "events").select("event_id", "value").mapInArrow(scale, schema)


@register(
    "variant_json_extract",
    category="scalars",
    doc="VariantType path: parse_json(props) once → typed variant_get "
    "extraction (Spark 4's semi-structured column type).",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed
FROM events
""",
)
def variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .select("event_id", F.parse_json("props").alias("v"))
        .select(
            "event_id",
            F.expr("variant_get(v, '$.k', 'bigint')").alias("k_typed"),
        )
    )


@register(
    "apply_in_arrow_group_stats",
    category="udf",
    doc="applyInArrow (Spark 4 grouped-map WITHOUT the pandas layer): "
    "per-user event stats computed directly on the group's Arrow table "
    "with pyarrow.compute kernels — exact int64-cents arithmetic, so the "
    "result is engine-portable and fully oracle-checked. Grouping key is "
    "user_id (high cardinality ⇒ bounded per-group memory at scale; "
    "grouping the same op by a 5-value key would funnel 20% of the table "
    "into one Python worker).",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
       MIN(event_id) AS first_event_id,
       MAX(event_id) AS last_event_id
FROM events
GROUP BY user_id
""",
)
def apply_in_arrow_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.types as T

    def stats(tbl):
        import pyarrow as pa
        import pyarrow.compute as pc

        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(tbl.column("value"), pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        return pa.table(
            {
                "user_id": pa.array([tbl.column("user_id")[0].as_py()], pa.int64()),
                "n_events": pa.array([tbl.num_rows], pa.int64()),
                "sum_cents": pa.array([pc.sum(cents).as_py()], pa.int64()),
                "first_event_id": pa.array([pc.min(tbl.column("event_id")).as_py()], pa.int64()),
                "last_event_id": pa.array([pc.max(tbl.column("event_id")).as_py()], pa.int64()),
            }
        )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_cents", T.LongType()),
            T.StructField("first_event_id", T.LongType()),
            T.StructField("last_event_id", T.LongType()),
        ]
    )
    return (
        table(spark, sf_dir, "events")
        .select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInArrow(stats, schema)
    )
