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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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


def register_manifest_source(spark) -> None:
    spark.dataSource.register(ManifestDataSource)
