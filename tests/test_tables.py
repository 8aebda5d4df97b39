"""Schema-contract pins for the explicit-schema table loader (r10 opt).

``tables.table()`` reads every non-events table with the declared SCHEMAS
entry instead of paying a per-call footer-inference job (~10x the
DataFrame-construction cost, measured r10). That is only sound while the
declared contract matches what Spark would infer from the physical files —
this sweep compares the two for every table at every shipped scale factor,
so a testdata regeneration that changes a physical type (the events nanos
lesson, NOTES.md decision #2) fails HERE instead of silently misreading.
"""

from __future__ import annotations

import os

import pytest

from wheels_in_motion_analytics_spark.tables import SCHEMAS, TABLE_NAMES, table

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1") if os.path.isdir(d)]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_declared_schema_matches_inference(spark, sf_dir):
    mismatches = []
    for name in TABLE_NAMES:
        path = f"{sf_dir}/{name}.parquet"
        inferred = spark.read.parquet(path).schema
        declared = SCHEMAS[name]
        if [(f.name, f.dataType) for f in inferred.fields] != [
            (f.name, f.dataType) for f in declared.fields
        ]:
            mismatches.append(
                f"{sf_dir}/{name}: inferred {inferred.simpleString()} != "
                f"declared {declared.simpleString()}"
            )
    assert not mismatches, (
        "declared SCHEMAS diverged from physical files — fix SCHEMAS (or the "
        "events dispatch) before trusting the explicit-schema fast path:\n"
        + "\n".join(mismatches)
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_table_loader_types_unchanged(spark, sf_dir):
    """table() must yield exactly the inference-era types (NTZ timestamps)."""
    for name in TABLE_NAMES:
        got = table(spark, sf_dir, name).schema
        want = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
        assert [(f.name, f.dataType) for f in got.fields] == [
            (f.name, f.dataType) for f in want.fields
        ], f"{name}: loader changed column types"


@pytest.mark.skipif(not SF_DIRS, reason="no /root/testdata directories")
def test_events_fast_path_is_ntz(spark):
    df = table(spark, SF_DIRS[0], "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp_ntz"
    # fast path must be a plain scan (no inference-era withColumn rewrite)
    assert "convert_timezone" not in df._jdf.queryExecution().analyzed().toString()


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_derived_lake_declared_schema_matches_inference(spark, sf_dir):
    """r11 ADVICE fix: the `.derived/` month-partitioned lineitem lake is
    _SUCCESS-gated and never rebuilt, so its explicit-schema reads trusted
    a contract the base-table sweep never checked — a stale lake written
    under a different timestamp generation would be silently misread.
    Compare declared vs inference whenever the lake exists (builds it on
    first run, same as the queries do)."""
    from wheels_in_motion_analytics_spark.sources.partitioned import (
        _partitioned_lineitem_schema,
        ensure_partitioned_lineitem,
    )

    path = ensure_partitioned_lineitem(spark, sf_dir)
    inferred = spark.read.parquet(path).schema
    declared = _partitioned_lineitem_schema()
    assert sorted((f.name, f.dataType.simpleString()) for f in inferred.fields) == sorted(
        (f.name, f.dataType.simpleString()) for f in declared.fields
    ), (
        f"declared derived-lake schema diverged from {path} — rebuild the "
        "lake (delete .derived/) or fix _partitioned_lineitem_schema"
    )
