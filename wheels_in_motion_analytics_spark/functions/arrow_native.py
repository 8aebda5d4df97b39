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
