"""Custom Python STREAMING DataSource (Spark 4 API): a deterministic
synthetic tick feed as a first-class ``spark.readStream.format(...)``
source.

Completes the custom-source matrix next to the batch manifest DataSource
(read + write halves, sources/manifest_datasource.py): this is the
template for wrapping ANY external feed (queue, ledger, HTTP cursor) as a
structured stream — ``initialOffset``/``latestOffset`` define progress,
``partitions(start, end)`` splits each micro-batch's offset range so the
READ ITSELF distributes across executors, and ``read(partition)`` yields
typed rows for one split. Offsets are plain dicts checkpointed by Spark,
so recovery/exactly-once come from the engine, not the source.

The feed is md5-derived (seq → bucket, cents), so a DuckDB oracle can
replay the identical rows from ``range()`` — the registered query below is
fully value-checked despite being a from-nothing streaming source.
"""

from __future__ import annotations

import hashlib

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
import pyspark.sql.types as T

TICKS_TOTAL = 4000  # rows the bounded feed produces before going idle
TICKS_SPLITS = 4  # parallel read partitions per micro-batch
TICKS_BUCKETS = 16
TICKS_CENTS_MOD = 100000

TICKS_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("cents", T.LongType()),
    ]
)


def tick_row(seq: int) -> tuple[int, int, int]:
    """The deterministic feed content: md5-derived, engine-portable."""
    h = hashlib.md5(f"tick:{seq}".encode()).hexdigest()
    return (seq, int(h[:4], 16) % TICKS_BUCKETS, int(h[4:12], 16) % TICKS_CENTS_MOD)


@dataclass
class _TickRange(InputPartition):
    start: int
    end: int


class SyntheticTicksStreamReader(DataSourceStreamReader):
    def initialOffset(self) -> dict:
        return {"seq": 0}

    def latestOffset(self) -> dict:
        # bounded feed: availableNow drains to TICKS_TOTAL and terminates;
        # a live feed would return its current high-water mark here
        return {"seq": TICKS_TOTAL}

    def partitions(self, start: dict, end: dict) -> list[_TickRange]:
        # MUST tile [start, end) exactly — the engine records `end` as this
        # batch's committed offset, so dropping any sub-range here would
        # silently lose rows. Tile the RANGE into TICKS_SPLITS chunks (not
        # fixed-row chunks): every Python-datasource partition costs a
        # worker handshake (~0.3-0.5 s measured), so the split count — the
        # parallelism dial — must not silently multiply when the engine
        # hands one availableNow batch covering the whole feed. A
        # production source would target a rows/bytes budget per split
        # here; the dial is the same.
        lo, hi = start["seq"], end["seq"]
        step = max(-(-(hi - lo) // TICKS_SPLITS), 1)
        return [
            _TickRange(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition: _TickRange):
        for seq in range(partition.start, partition.end):
            yield tick_row(seq)

    def commit(self, end: dict) -> None:
        pass  # nothing external to acknowledge for the synthetic feed


class SyntheticTicksDataSource(DataSource):
    """``format("synthetic_ticks")``: bounded deterministic stream feed."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_ticks"

    def schema(self) -> T.StructType:
        return TICKS_SCHEMA

    def streamReader(self, schema: T.StructType) -> SyntheticTicksStreamReader:
        return SyntheticTicksStreamReader()


def register_ticks_source(spark) -> None:
    spark.dataSource.register(SyntheticTicksDataSource)


from wheels_in_motion_analytics_spark.registry import register  # noqa: E402


@register(
    "python_stream_datasource_read",
    category="sources",
    doc="Custom Python STREAMING DataSource run for real: the synthetic "
    "tick feed registers as format('synthetic_ticks'), streams under "
    "trigger availableNow with engine-managed offsets/checkpointing, the "
    "offset range of each batch is split into parallel read partitions "
    "(the read itself distributes), and a complete-mode aggregation lands "
    "in a memory sink. Fully oracle-checked: the feed is md5-derived, so "
    "DuckDB replays identical rows from range() — per-bucket counts and "
    "exact cent sums must match. Template for wrapping any external feed "
    "(queue / ledger / HTTP cursor) as a structured stream.",
    oracle=f"""
WITH t AS (
  SELECT CAST(('0x' || substr(md5('tick:' || CAST(i AS VARCHAR)), 1, 4))::BIGINT
              % {TICKS_BUCKETS} AS INTEGER) AS bucket,
         ('0x' || substr(md5('tick:' || CAST(i AS VARCHAR)), 5, 8))::BIGINT
              % {TICKS_CENTS_MOD} AS cents
  FROM (SELECT unnest(range({TICKS_TOTAL})) AS i)
)
SELECT bucket, COUNT(*) AS n_ticks, CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM t GROUP BY bucket
""",
)
def python_stream_datasource_read(spark, sf_dir: str):
    import shutil
    import tempfile
    import uuid

    import pyspark.sql.functions as F

    register_ticks_source(spark)
    ckpt = tempfile.mkdtemp(prefix="ticks_ckpt_")
    name = f"ticks_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("synthetic_ticks")
        .load()
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum("cents").alias("sum_cents"),
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("availableNow tick-feed stream did not finish in 300s")
    final = spark.sql(f"SELECT bucket, n_ticks, sum_cents FROM {name}").localCheckpoint()
    shutil.rmtree(ckpt, ignore_errors=True)
    return final


# --------------------------------------------------------------------------
# Custom Python STREAMING sink (DataSourceStreamWriter): exactly-once
# commit protocol in Python — completes the custom-source matrix
# (batch read/write: manifest_datasource.py; stream read: above).
# --------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamWriter, WriterCommitMessage  # noqa: E402


@dataclass
class _PartFile(WriterCommitMessage):
    rel_path: str
    n_rows: int


class JsonDirStreamWriter(DataSourceStreamWriter):
    """Epoch-committed JSON-lines sink: tasks stage part files, commit()
    atomically publishes the epoch's parts into a ledger — a crashed epoch
    leaves only invisible staged orphans (abort removes them), so replays
    are exactly-once at the file level.

    `path` must be storage every task AND the driver can reach (shared FS
    or object store via a fuse mount) — on local[...] any temp dir works;
    on a real cluster point it at the lake, same contract as any file sink.
    """

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("option 'path' is required")

    def write(self, iterator) -> _PartFile:
        import json as _json
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        staged_dir = os.path.join(self.path, "_staged")
        os.makedirs(staged_dir, exist_ok=True)
        rel = f"part-{ctx.partitionId()}-{uuid.uuid4().hex[:8]}.jsonl"
        n = 0
        with open(os.path.join(staged_dir, rel), "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _PartFile(rel_path=rel, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        import json as _json
        import os

        committed = os.path.join(self.path, "committed")
        os.makedirs(committed, exist_ok=True)
        # Replay idempotence: a re-executed commit for the same epoch (crash
        # after publishing part files but before the checkpoint advanced)
        # must not leave the prior attempt's uuid-named parts beside the new
        # ones — remove anything already published for this batchId first.
        # The trailing '-' keeps epoch-1- from matching epoch-10-*.
        for stale in os.listdir(committed):
            if stale.startswith(f"epoch-{batchId}-"):
                os.remove(os.path.join(committed, stale))
        names = []
        for m in messages:
            final = f"epoch-{batchId}-{m.rel_path}"
            os.replace(
                os.path.join(self.path, "_staged", m.rel_path),
                os.path.join(committed, final),
            )
            names.append({"file": final, "rows": m.n_rows})
        ledger = os.path.join(self.path, f"_ledger-{batchId}.json")
        tmp = ledger + ".tmp"
        with open(tmp, "w") as fh:
            _json.dump({"epoch": batchId, "parts": names}, fh)
        os.replace(tmp, ledger)  # atomic epoch publish

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None:
                p = os.path.join(self.path, "_staged", m.rel_path)
                if os.path.exists(p):
                    os.remove(p)


class JsonDirSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsondir_sink"

    def schema(self) -> T.StructType:  # sink: schema comes from the stream
        return TICKS_SCHEMA

    def streamWriter(self, schema: T.StructType, overwrite: bool) -> JsonDirStreamWriter:
        return JsonDirStreamWriter(self.options)


@register(
    "python_stream_datasource_write",
    category="sinks",
    doc="Custom Python STREAMING sink run for real: the tick feed streams "
    "availableNow through format('jsondir_sink') — a "
    "DataSourceStreamWriter whose tasks stage JSON-lines part files and "
    "whose per-epoch commit() atomically publishes them into a ledger "
    "(task failures leave only staged orphans; abort() reclaims them — "
    "the exactly-once file-commit protocol in Python). The committed "
    "files are read back and aggregated; DuckDB replays the identical "
    "feed from range(). Completes the custom-source matrix: batch "
    "read/write (manifest) + stream read (synthetic_ticks) + stream "
    "write (this).",
    oracle=f"""
WITH t AS (
  SELECT i AS seq,
         CAST(('0x' || substr(md5('tick:' || CAST(i AS VARCHAR)), 1, 4))::BIGINT
              % {TICKS_BUCKETS} AS INTEGER) AS bucket,
         ('0x' || substr(md5('tick:' || CAST(i AS VARCHAR)), 5, 8))::BIGINT
              % {TICKS_CENTS_MOD} AS cents
  FROM (SELECT unnest(range({TICKS_TOTAL})) AS i)
)
SELECT bucket, COUNT(*) AS n_ticks, MAX(cents) AS max_cents,
       CAST(MIN(seq) AS BIGINT) AS first_seq
FROM t GROUP BY bucket
""",
)
def python_stream_datasource_write(spark, sf_dir: str):
    import os
    import shutil
    import tempfile
    import uuid

    import pyspark.sql.functions as F

    register_ticks_source(spark)
    spark.dataSource.register(JsonDirSinkDataSource)
    out = tempfile.mkdtemp(prefix="ticks_sink_")
    ckpt = tempfile.mkdtemp(prefix="ticks_sink_ckpt_")
    q = (
        spark.readStream.format("synthetic_ticks")
        .load()
        .writeStream.format("jsondir_sink")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("availableNow tick-sink stream did not finish in 300s")
    # Read back ONLY the files the epoch ledgers name — the ledger is the
    # commit authority; a glob over committed/ could see parts from a
    # half-replayed epoch that never reached its ledger.
    import glob as _glob
    import json as _json

    ledger_files = []
    for lp in sorted(_glob.glob(os.path.join(out, "_ledger-*.json"))):
        with open(lp) as fh:
            for part in _json.load(fh)["parts"]:
                ledger_files.append(os.path.join(out, "committed", part["file"]))
    final = (
        spark.read.schema("seq BIGINT, bucket INT, cents BIGINT")
        .json(ledger_files)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.max("cents").alias("max_cents"),
            F.min("seq").alias("first_seq"),
        )
        .localCheckpoint()
    )
    for d in (out, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    return final
