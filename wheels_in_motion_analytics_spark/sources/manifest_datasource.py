"""Custom Python DataSource (Spark 4 API): the manifest as a first-class
``spark.read.format(...)`` source.

The reference materializes its S3-listing manifest as a JSON dict consumed
by driver-side Python (web_scraper.py:27-52, proc_0_ingest_to_GCP.dag.py:31-51).
Here the same manifest is a registered Spark data source: schema-declared,
partitioned by date-key hash so the listing parse itself distributes, and
composable with the whole DataFrame API (`spark.read.format("manifest")
.option("path", ...).load()`).

This is the template for wrapping ANY external listing/catalog API as a
scan: partitions() splits the key space; read() yields typed rows per split.
"""

from __future__ import annotations

import json
import zlib

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
import pyspark.sql.types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("date_key", T.StringType()),
        T.StructField("rel_path", T.StringType()),
        T.StructField("filename", T.StringType()),
    ]
)


class ManifestDataSource(DataSource):
    """``format("manifest")``: reads a links_dictionary-style JSON manifest
    ({date_key: relative_path}) as a distributed table."""

    @classmethod
    def name(cls) -> str:
        return "manifest"

    def schema(self) -> T.StructType:
        return MANIFEST_SCHEMA

    def reader(self, schema: T.StructType) -> "ManifestReader":
        return ManifestReader(self.options)

    def writer(self, schema: T.StructType, overwrite: bool) -> "ManifestWriter":
        return ManifestWriter(self.options, overwrite)


class ManifestReader(DataSourceReader):
    N_SPLITS = 4

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest source requires .option('path', <json file>)")

    def partitions(self):
        return [InputPartition(i) for i in range(self.N_SPLITS)]

    def read(self, partition: InputPartition):
        # Each split parses the (small) manifest and serves its hash slice —
        # the shape that lets a huge listing fan out across executors.
        with open(self.path) as f:
            links = json.load(f)
        for date_key, rel_path in links.items():
            # crc32, not hash(): Python's hash is seed-randomized per
            # process, so different executors would disagree on slice
            # membership (duplicate/lost rows on a real cluster)
            if zlib.crc32(date_key.encode()) % self.N_SPLITS == partition.value:
                yield (date_key, rel_path, rel_path.rsplit("/", 1)[-1])


@dataclass
class _PartMessage(WriterCommitMessage):
    part_path: str


class ManifestWriter(DataSourceWriter):
    """``df.write.format("manifest")``: the write half of the connector —
    each task serializes ITS partition's (date_key, rel_path) rows to a
    staged part file (executor-side, embarrassingly parallel), and
    ``commit`` merges the staged parts into the final single-file JSON
    manifest on the driver. This is the Spark 4 Python DataSource commit
    protocol: task writes are speculative until the driver-side commit, so
    a failed/aborted job leaves no torn manifest behind (``abort`` removes
    the staged parts)."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest sink requires .option('path', <json file>)")
        self.overwrite = overwrite

    def write(self, iterator) -> _PartMessage:
        import json as _json
        import os
        import uuid

        from pyspark import TaskContext

        part = dict()
        for row in iterator:
            part[row.date_key] = row.rel_path
        staged = f"{self.path}.part-{TaskContext.get().partitionId()}-{uuid.uuid4().hex[:8]}"
        os.makedirs(os.path.dirname(staged) or ".", exist_ok=True)
        with open(staged, "w") as f:
            _json.dump(part, f)
        return _PartMessage(part_path=staged)

    def commit(self, messages) -> None:
        import json as _json
        import os

        merged: dict = {}
        for m in messages:
            with open(m.part_path) as f:
                merged.update(_json.load(f))
            os.remove(m.part_path)
        if not self.overwrite and os.path.exists(self.path):
            with open(self.path) as f:
                existing = _json.load(f)
            existing.update(merged)
            merged = existing
        # atomic commit: write beside the target, then os.replace — a driver
        # crash mid-commit leaves either the old manifest or the new one,
        # never a torn file (task staging above only covers task failures)
        tmp = f"{self.path}.commit-{os.getpid()}"
        with open(tmp, "w") as f:
            _json.dump(merged, f, sort_keys=True)
        os.replace(tmp, self.path)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.part_path):
                os.remove(m.part_path)


def register_manifest_source(spark) -> None:
    spark.dataSource.register(ManifestDataSource)
