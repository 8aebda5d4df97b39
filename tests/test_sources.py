"""Tests for the custom Python streaming DataSource (synthetic tick feed)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from wheels_in_motion_analytics_spark.registry import load_all_queries
from wheels_in_motion_analytics_spark.sources.stream_datasource import (
    TICKS_SPLITS,
    TICKS_TOTAL,
    SyntheticTicksStreamReader,
    register_ticks_source,
    tick_row,
)


def test_partitions_tile_offset_range_exactly():
    """partitions() must cover [start, end) with no gaps or overlaps — the
    engine commits `end` as the batch offset, so a hole would lose rows."""
    r = SyntheticTicksStreamReader()
    parts = r.partitions({"seq": 0}, {"seq": TICKS_TOTAL})
    assert parts[0].start == 0 and parts[-1].end == TICKS_TOTAL
    for a, b in zip(parts, parts[1:]):
        assert a.end == b.start
    # the split count is the parallelism dial: exactly TICKS_SPLITS chunks
    # regardless of batch size (each Python-datasource partition costs a
    # worker handshake — r10 measurement: ~0.3-0.5 s each)
    assert len(parts) == TICKS_SPLITS
    # ragged range still tiles exactly
    parts = r.partitions({"seq": 37}, {"seq": 1003})
    assert parts[0].start == 37 and parts[-1].end == 1003
    assert all(a.end == b.start for a, b in zip(parts, parts[1:]))
    assert len(parts) <= TICKS_SPLITS
    # degenerate ranges never produce empty or overlapping chunks
    assert r.partitions({"seq": 5}, {"seq": 5}) == []
    tiny = r.partitions({"seq": 0}, {"seq": 3})
    assert [(p.start, p.end) for p in tiny] == [(0, 1), (1, 2), (2, 3)]


def test_stream_read_yields_every_tick_exactly_once(spark):
    """Raw availableNow read of the custom source: all TICKS_TOTAL rows,
    each exactly once, with the deterministic md5-derived content."""
    import tempfile
    import uuid

    register_ticks_source(spark)
    name = f"ticks_raw_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("synthetic_ticks")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ticks_raw_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    rows = spark.sql(f"SELECT seq, bucket, cents FROM {name}").collect()
    assert len(rows) == TICKS_TOTAL
    got = {(r.seq, r.bucket, r.cents) for r in rows}
    assert got == {tick_row(i) for i in range(TICKS_TOTAL)}


def test_registered_query_matches_batch_recompute(spark):
    out = {
        r.bucket: (r.n_ticks, r.sum_cents)
        for r in load_all_queries()["python_stream_datasource_read"].fn(spark, SF_SMALL).collect()
    }
    exp: dict[int, list[int]] = {}
    for i in range(TICKS_TOTAL):
        _, b, c = tick_row(i)
        n, s = exp.get(b, (0, 0))
        exp[b] = (n + 1, s + c)
    assert out == exp


def test_stream_sink_commit_replay_is_idempotent(tmp_path):
    """A re-executed commit() for the same epoch (crash after publish,
    before the checkpoint advanced) must supersede the prior attempt's
    part files — the readback ledger must name exactly one attempt's
    files (round-3 advice)."""
    import json
    import os

    from wheels_in_motion_analytics_spark.sources.stream_datasource import (
        JsonDirStreamWriter,
        _PartFile,
    )

    out = str(tmp_path / "sink")
    w = JsonDirStreamWriter({"path": out})
    staged = os.path.join(out, "_staged")
    os.makedirs(staged)

    def stage(rel, lines):
        with open(os.path.join(staged, rel), "w") as fh:
            for ln in lines:
                fh.write(json.dumps(ln) + "\n")
        return _PartFile(rel_path=rel, n_rows=len(lines))

    # first attempt at epoch 7 publishes, then the epoch replays with a
    # different uuid part name (same logical data)
    m1 = stage("part-0-aaaaaaaa.jsonl", [{"seq": 1}, {"seq": 2}])
    w.commit([m1], 7)
    m2 = stage("part-0-bbbbbbbb.jsonl", [{"seq": 1}, {"seq": 2}])
    w.commit([m2], 7)
    # an adjacent epoch whose prefix shares digits must survive (epoch-7- vs epoch-77-)
    m3 = stage("part-0-cccccccc.jsonl", [{"seq": 9}])
    w.commit([m3], 77)

    committed = sorted(os.listdir(os.path.join(out, "committed")))
    assert committed == [
        "epoch-7-part-0-bbbbbbbb.jsonl",
        "epoch-77-part-0-cccccccc.jsonl",
    ]
    with open(os.path.join(out, "_ledger-7.json")) as fh:
        ledger = json.load(fh)
    assert [p["file"] for p in ledger["parts"]] == ["epoch-7-part-0-bbbbbbbb.jsonl"]


def test_parquet_agg_pushdown_plans_footer_stats(spark):
    """Under the DSv2 parquet scan + aggregatePushdown the MIN/MAX/COUNT
    probe must plan a non-empty PushedAggregation (answered from footers),
    the registry query must return those same values, and the callable must
    leave the session confs as it found them."""
    import re

    from wheels_in_motion_analytics_spark.sources.scan_queries import (
        parquet_agg_pushdown_stats,
    )

    before = (
        spark.conf.get("spark.sql.parquet.aggregatePushdown", None),
        spark.conf.get("spark.sql.sources.useV1SourceList", None),
    )
    got = parquet_agg_pushdown_stats(spark, SF_SMALL).collect()[0]
    after = (
        spark.conf.get("spark.sql.parquet.aggregatePushdown", None),
        spark.conf.get("spark.sql.sources.useV1SourceList", None),
    )
    assert before == after
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set(
        "spark.sql.sources.useV1SourceList", "avro,csv,json,kafka,orc,text"
    )
    try:
        probe = spark.read.parquet(os.path.join(SF_SMALL, "orders.parquet")).agg(
            F.min("o_orderkey").alias("key_min"),
            F.max("o_orderkey").alias("key_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PushedAggregation: \[([^\]]*)\]", plan)
        assert m and m.group(1).strip(), plan[:500]
        row = probe.collect()[0]
        assert (got["key_min"], got["key_max"], got["n_rows"]) == tuple(row)
    finally:
        spark.conf.unset("spark.sql.parquet.aggregatePushdown")
        spark.conf.unset("spark.sql.sources.useV1SourceList")
