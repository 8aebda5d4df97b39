"""End-to-end test of the reference-faithful ETL over reference-shaped
fixtures (FIXTURES.md): init dims → journey fact/datetime/station-augmentation
→ enriched serving view. Covers S1-S5, S8, K1/K2, P2-P10, J1/J2, D1-D3, F1."""

from __future__ import annotations

import pytest

from tests.fixtures import write_journey_csvs, write_stations_csv, write_weather_json
from wheels_in_motion_analytics_spark.plans.reference_pipeline import (
    STATION_DIM_SCHEMA,
    enriched_view,
    run_init_pipeline,
    run_journey_pipeline,
)


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("refpipe")
    stations_csv = root / "stations.csv"
    weather_json = root / "weather.json"
    write_stations_csv(stations_csv, n=20)
    write_weather_json(weather_json, days=30, root_key="days")
    stats = write_journey_csvs(root, n_files=3, rows_per_file=200)
    out = str(root / "processed")

    init = run_init_pipeline(spark, str(stations_csv), str(weather_json), out)
    glob = str(root / "raw" / "cycling-journey" / "*" / "*.csv")
    prod = run_journey_pipeline(spark, glob, out)
    return {"init": init, "prod": prod, "stats": stats, "out": out, "root": root}


def test_station_dim_schema_and_rename(pipeline_run):
    stations = pipeline_run["init"]["stations"]
    assert [f.name for f in stations.schema.fields] == [
        "station_id", "station_name", "longitude", "latitude", "easting", "northing",
    ]
    assert dict(stations.dtypes)["station_id"] == "bigint"
    assert stations.count() == 20


def test_weather_normalization_and_drops(pipeline_run):
    weather = pipeline_run["init"]["weather"]
    cols = set(weather.columns)
    # dict-root payload was flattened to day records (S8)
    assert weather.count() == 30
    assert "weather_date" in cols and dict(weather.dtypes)["weather_date"] == "date"
    # hard drops and sparse drops applied
    for dropped in ("conditions", "stations", "preciptype", "snow", "severerisk", "precipprob"):
        assert dropped not in cols
    assert "temp" in cols and "humidity" in cols


def test_null_profile_probe(pipeline_run):
    profile = pipeline_run["init"]["stations_profile"].collect()[0]
    # some coordinates were generated empty -> nonzero null counts there
    assert profile["station_id"] == 0
    assert profile["longitude"] >= 0


def test_journey_fact_schema(pipeline_run):
    fact = pipeline_run["prod"]["fact"]
    dt = dict(fact.dtypes)
    assert dt["start_date"] == "timestamp"
    assert dt["end_date"] == "timestamp"
    assert dt["weather_date"] == "date"
    assert dt["Start station number"] == "bigint"
    # dim-extracted and noise columns dropped (P3)
    for dropped in ("Start station", "End station", "Total duration", "Total duration (ms)"):
        assert dropped not in dt
    # header variants normalized (P2): all three files landed
    assert fact.count() == pipeline_run["stats"]["rows"]


def test_station_discovery_anti_join(pipeline_run):
    stations = pipeline_run["prod"]["stations"]
    rows = {r.station_id: r for r in stations.collect()}
    # every unknown id from the journeys was discovered with 0.0 defaults
    for sid in pipeline_run["stats"]["unknown_ids"]:
        assert sid in rows, f"station {sid} not discovered"
        assert rows[sid].longitude == 0.0 and rows[sid].easting == 0.0
    # existing dim rows kept their real coordinates (deterministic winner)
    assert rows[15].easting != 0.0
    # no NULL keys, no duplicate keys
    assert stations.where("station_id IS NULL").count() == 0
    assert stations.count() == len(rows)


def test_datetime_dim_golden_schema(pipeline_run):
    dt = pipeline_run["prod"]["datetime"]
    assert [f.name for f in dt.schema.fields] == [
        "datetime_id", "year", "week_day", "month", "day", "hour", "minute", "second",
    ]
    types = dict(dt.dtypes)
    assert types["datetime_id"] == "timestamp"
    assert all(types[c] == "int" for c in ["year", "week_day", "month", "day", "hour", "minute", "second"])
    # deduped on the PK
    assert dt.count() == dt.select("datetime_id").distinct().count()


def test_idempotent_rerun_station_overwrite(spark, pipeline_run):
    """K1 overwrite semantics: re-running the journey pipeline must not grow
    the station dim (idempotency policy, README.md:83)."""
    root = pipeline_run["root"]
    out = pipeline_run["out"]
    glob = str(root / "raw" / "cycling-journey" / "*" / "*.csv")
    before = spark.read.parquet(f"{out}/cycling-dimension/stations").count()
    run_journey_pipeline(spark, glob, out)
    after = spark.read.parquet(f"{out}/cycling-dimension/stations").count()
    assert before == after


def test_enriched_serving_view(spark, pipeline_run):
    out = pipeline_run["out"]
    fact = spark.read.parquet(f"{out}/cycling-fact/journey")
    stations = spark.read.parquet(f"{out}/cycling-dimension/stations")
    dt = spark.read.parquet(f"{out}/cycling-dimension/datetime")
    weather = spark.read.parquet(f"{out}/cycling-dimension/weather")
    enriched = enriched_view(fact, stations, dt, weather)
    n = enriched.count()
    assert n == fact.count()  # left joins preserve the fact
    row = enriched.where("start_station_name IS NOT NULL").limit(1).collect()[0]
    assert row.start_station_name.startswith("Station ")
    # the physical plan must be all broadcast joins — no fact-side shuffle
    plan = enriched._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_empty_dim_fallback(spark, tmp_path):
    """S5: reading a not-yet-existing dim yields an empty frame with the
    declared schema (journey-data-transformation.py:98-105)."""
    from wheels_in_motion_analytics_spark.sources.readers import read_parquet_or_empty

    df = read_parquet_or_empty(spark, str(tmp_path / "missing"), STATION_DIM_SCHEMA)
    assert df.count() == 0
    assert df.schema == STATION_DIM_SCHEMA
