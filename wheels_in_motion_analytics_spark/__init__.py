"""wheels_in_motion_analytics_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (Ola-20/Wheels-in-Motion-Analytics):
star-schema ETL operators, relational query surface, and large-scale
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing), all built on the DataFrame/SQL API so Catalyst and
Tungsten pick the physical strategy.

Layout:
  session    — SparkSession factory (AQE, Arrow, UTC, local-mode defaults)
  tables     — testdata star-schema loaders + view registration
  registry   — query registry powering the driver contract (__spark_entry__)
  operators/ — relational operators (projection, joins, aggregates, dedup,
               set ops, window functions)
  functions/ — scalar/datetime/text/similarity function suites
  sources/   — CSV/JSON/Parquet/manifest/binary readers with schema contracts
  sinks/     — parquet writers (overwrite/append/partitioned)
  plans/     — composed pipelines (enriched star join, reference ETL)
  streaming/ — Structured Streaming windows + batch-parity formulations
  multimodal/— binary-column plumbing with stubbed decoders
"""

from wheels_in_motion_analytics_spark.session import get_session
from wheels_in_motion_analytics_spark.registry import REGISTRY, load_all_queries

__all__ = ["get_session", "REGISTRY", "load_all_queries"]
