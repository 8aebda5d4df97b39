"""Reference-faithful ETL pipelines, re-expressed Spark-first.

These reproduce the reference's two transform jobs over reference-shaped
inputs (FIXTURES.md):

* init pipeline — stations CSV + weather JSON → parquet dims
  (/root/reference/airflow/dags/scripts/init-data-transformation.py)
* journey pipeline — weekly journey CSVs → fact + datetime dim + station-dim
  augmentation (/root/reference/airflow/dags/scripts/journey-data-transformation.py)

Differences from the reference are deliberate engine policy (SURVEY.md §4.3):
declared schemas instead of inferSchema, a NULL-safe left_anti join instead
of NOT IN, deterministic dedup winners instead of dropDuplicates' arbitrary
row, and Spark-side JSON normalization instead of driver-side Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
import pyspark.sql.types as T

from wheels_in_motion_analytics_spark.functions.datetime_dim import build_datetime_dim
from wheels_in_motion_analytics_spark.operators.aggregates import null_profile
from wheels_in_motion_analytics_spark.operators.dedup import dedup_by_key
from wheels_in_motion_analytics_spark.operators.joins import anti_join
from wheels_in_motion_analytics_spark.operators.projection import (
    cast_columns,
    drop_if_exists,
    rename_columns,
)
from wheels_in_motion_analytics_spark.sinks import (
    write_parquet_append,
    write_parquet_overwrite,
)
from wheels_in_motion_analytics_spark.sources.readers import (
    normalize_json_payload,
    read_csv,
    read_parquet_or_empty,
)

# Target station-dim schema (journey-data-transformation.py:88-95).
STATION_DIM_SCHEMA = T.StructType(
    [
        T.StructField("station_id", T.LongType()),
        T.StructField("station_name", T.StringType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("easting", T.DoubleType()),
        T.StructField("northing", T.DoubleType()),
    ]
)

# Weather columns dropped outright (init-data-transformation.py:82-87).
WEATHER_DROP_COLS = [
    "cloudcover", "conditions", "datetimeEpoch", "description", "dew",
    "icon", "precipcover", "preciptype", "source", "stations",
    "sunriseEpoch", "sunsetEpoch",
]
# Sparse columns dropped after the null-profile probe (:97-100).
WEATHER_SPARSE_COLS = ["precipprob", "snow", "snowdepth", "severerisk"]

# Journey header-variant normalization (journey-data-transformation.py:63-71).
JOURNEY_RENAMES = {
    "Start Date": "start_date",
    "Start date": "start_date",
    "End Date": "end_date",
    "End date": "end_date",
}
# Columns dropped from the fact (:150-151).
JOURNEY_DROP_COLS = ["Start station", "End station", "Total duration", "Total duration (ms)"]

JOURNEY_TS_FORMAT = "dd/MM/yyyy HH:mm"  # day-first, minute precision (:76)


def transform_stations(raw: DataFrame) -> DataFrame:
    """Stations CSV → dim (init-data-transformation.py:49-73)."""
    df = rename_columns(raw, {"Station.Id": "station_id", "StationName": "station_name"})
    df = cast_columns(df, {"station_id": "bigint"})
    return df.select("station_id", "station_name", "longitude", "latitude", "easting", "northing")


def transform_weather(raw: DataFrame) -> DataFrame:
    """Weather records → dim: drops, date cast, sparse-column removal
    (init-data-transformation.py:79-118)."""
    df = drop_if_exists(raw, WEATHER_DROP_COLS)
    df = df.withColumn("weather_date", F.col("datetime").cast(T.DateType())).drop("datetime")
    return drop_if_exists(df, WEATHER_SPARSE_COLS)


def transform_journeys(journeys_raw: DataFrame) -> DataFrame:
    """Journey CSVs → typed fact rows (journey-data-transformation.py:63-87):
    header normalization, day-first timestamp parsing, weather_date derivation."""
    df = rename_columns(journeys_raw, JOURNEY_RENAMES)
    df = df.withColumns(
        {
            "start_date": F.to_timestamp("start_date", JOURNEY_TS_FORMAT),
            "end_date": F.to_timestamp("end_date", JOURNEY_TS_FORMAT),
        }
    )
    df = df.withColumn("weather_date", F.to_date("start_date"))
    df = cast_columns(
        df, {"Start station number": "bigint", "End station number": "bigint"}
    )
    return df


def discover_new_stations(journeys: DataFrame, station_dim: DataFrame) -> DataFrame:
    """J1: stations present in journeys but absent from the dim, with 0.0
    coordinate defaults (journey-data-transformation.py:110-135).

    The reference writes this as NOT IN — which silently returns nothing if
    the dim ever contains a NULL station_id; left_anti is the NULL-safe
    rewrite of the intent. Both legs (start/end) are set-unioned (D1).
    """
    start_leg = journeys.where(F.col("Start station number").isNotNull()).select(
        F.col("Start station number").alias("station_id"),
        F.col("Start station").alias("station_name"),
    )
    end_leg = journeys.where(F.col("End station number").isNotNull()).select(
        F.col("End station number").alias("station_id"),
        F.col("End station").alias("station_name"),
    )
    candidates = start_leg.union(end_leg).distinct()
    new_stations = anti_join(candidates, station_dim, ["station_id"])
    return new_stations.withColumns(
        {
            "longitude": F.lit(0.0).cast("double"),
            "latitude": F.lit(0.0).cast("double"),
            "easting": F.lit(0.0).cast("double"),
            "northing": F.lit(0.0).cast("double"),
        }
    )


def augment_station_dim(station_dim: DataFrame, new_stations: DataFrame) -> DataFrame:
    """D2+D3: dim ∪ discovered stations, keyed dedup with a deterministic
    winner — existing dim rows (real coordinates) beat discovered defaults
    (journey-data-transformation.py:137-141)."""
    merged = station_dim.withColumn("__prio", F.lit(0)).unionByName(
        new_stations.withColumn("__prio", F.lit(1)), allowMissingColumns=True
    )
    return dedup_by_key(
        merged, ["station_id"], [F.col("__prio").asc(), F.col("station_name").asc()]
    ).drop("__prio")


def build_journey_fact(journeys: DataFrame) -> DataFrame:
    """Fact projection: drop dim-extracted/noise columns, keep typed FKs
    (journey-data-transformation.py:150-151; FIXTURES.md §5)."""
    return drop_if_exists(journeys, JOURNEY_DROP_COLS)


def run_init_pipeline(
    spark: SparkSession, stations_csv: str, weather_json: str, out_dir: str
) -> dict[str, DataFrame]:
    """Init job: seed dims from stations CSV + (dict-root) weather JSON.

    The weather payload normalization (S8) runs inside the Spark plan via
    explode, not driver-side Python. Null profiles are computed as the
    reference does before each write (init-data-transformation.py:57-63,
    104-116) and returned for inspection instead of .show()-printed.
    """
    stations_raw = read_csv(spark, stations_csv, infer=True)
    stations = transform_stations(stations_raw)
    stations_profile = null_profile(stations)
    write_parquet_overwrite(stations, f"{out_dir}/cycling-dimension/stations", num_files=4)

    weather_raw = normalize_json_payload(spark, weather_json)
    weather = transform_weather(weather_raw)
    weather_profile = null_profile(weather)
    write_parquet_overwrite(weather, f"{out_dir}/cycling-dimension/weather", num_files=4)

    return {
        "stations": stations,
        "weather": weather,
        "stations_profile": stations_profile,
        "weather_profile": weather_profile,
    }


def run_journey_pipeline(
    spark: SparkSession, journeys_glob: str, out_dir: str
) -> dict[str, DataFrame]:
    """Production job: weekly journey CSVs → fact + datetime dim + station
    augmentation (journey-data-transformation.py end-to-end)."""
    journeys_raw = read_csv(spark, journeys_glob, infer=True)
    journeys = transform_journeys(journeys_raw)

    stations_path = f"{out_dir}/cycling-dimension/stations"
    station_dim = read_parquet_or_empty(spark, stations_path, STATION_DIM_SCHEMA)
    new_stations = discover_new_stations(journeys, station_dim)
    # The augmented dim both reads from and overwrites stations_path:
    # materialize it first (localCheckpoint cuts the lineage back to the
    # soon-to-be-deleted files), the standard self-overwrite guard.
    station_dim2 = augment_station_dim(station_dim, new_stations).localCheckpoint()
    write_parquet_overwrite(station_dim2, stations_path, num_files=4)

    datetime_dim = build_datetime_dim(
        journeys.where(F.col("start_date").isNotNull()), "start_date"
    )
    write_parquet_append(datetime_dim, f"{out_dir}/cycling-dimension/datetime", num_files=4)

    fact = build_journey_fact(journeys)
    write_parquet_append(fact, f"{out_dir}/cycling-fact/journey", num_files=4)

    return {"stations": station_dim2, "datetime": datetime_dim, "fact": fact}


def enriched_view(
    fact: DataFrame, stations: DataFrame, datetime_dim: DataFrame, weather: DataFrame
) -> DataFrame:
    """J2: the journeys_enriched serving table (README.md:224,321) — fact
    joined to dim_station in both roles, dim_datetime, and dim_weather.
    All dims broadcast: zero shuffles on the fact side."""
    start_st = stations.select(
        F.col("station_id").alias("Start station number"),
        F.col("station_name").alias("start_station_name"),
    )
    end_st = stations.select(
        F.col("station_id").alias("End station number"),
        F.col("station_name").alias("end_station_name"),
    )
    # The reference appends the datetime dim on every run (K2), so the PK
    # can hold duplicates after re-runs (SURVEY.md §4.3 wart); a serving
    # view must join a keyed dim exactly once per key or fact rows fan out.
    # distinct() is safe: every column is a function of datetime_id.
    dt = datetime_dim.select(
        F.col("datetime_id").alias("start_date"),
        "year", "month", "day", "week_day", "hour",
    ).distinct()
    return (
        fact.join(F.broadcast(start_st), "Start station number", "left")
        .join(F.broadcast(end_st), "End station number", "left")
        .join(F.broadcast(dt), "start_date", "left")
        .join(F.broadcast(weather), "weather_date", "left")
    )
