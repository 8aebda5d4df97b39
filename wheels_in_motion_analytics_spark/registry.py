"""Query registry — the spine of the driver contract.

Every engine operator family registers a named query here: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an equivalent
ANSI-SQL oracle string that DuckDB runs over the same parquet tables.
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this
registry.

Determinism conventions (required for the driver's order-insensitive
value-hash to match across engines — SURVEY.md §4.3, §7.5):

* Float SUM/AVG go through an exact decimal accumulator then cast back to
  double (helpers in :mod:`wheels_in_motion_analytics_spark.compat`), so
  accumulation order cannot change the result.
* Every top-k / LIMIT has a total-order tiebreak on a unique key.
* Dedup winners are defined by ``row_number()`` over an explicit order, never
  ``dropDuplicates``'s arbitrary row.
* libm-backed scalars (ln/sqrt/pow/stddev) are rounded before emission.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does a rows-only check
    category: str
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}

# Modules whose import populates REGISTRY.
_QUERY_MODULES = [
    "wheels_in_motion_analytics_spark.operators.projection",
    "wheels_in_motion_analytics_spark.operators.joins",
    "wheels_in_motion_analytics_spark.operators.aggregates",
    "wheels_in_motion_analytics_spark.operators.dedup",
    "wheels_in_motion_analytics_spark.operators.setops",
    "wheels_in_motion_analytics_spark.operators.windows",
    "wheels_in_motion_analytics_spark.operators.advanced",
    "wheels_in_motion_analytics_spark.operators.outer_joins",
    "wheels_in_motion_analytics_spark.operators.timeseries",
    "wheels_in_motion_analytics_spark.operators.spatial",
    "wheels_in_motion_analytics_spark.sinks",
    "wheels_in_motion_analytics_spark.functions.indexing",
    "wheels_in_motion_analytics_spark.sources.stream_datasource",
    "wheels_in_motion_analytics_spark.functions.udfs",
    "wheels_in_motion_analytics_spark.functions.arrow_native",
    "wheels_in_motion_analytics_spark.functions.datetime_dim",
    "wheels_in_motion_analytics_spark.functions.scalars",
    "wheels_in_motion_analytics_spark.functions.scalars_ext",
    "wheels_in_motion_analytics_spark.functions.text",
    "wheels_in_motion_analytics_spark.functions.text_pipeline",
    "wheels_in_motion_analytics_spark.functions.similarity",
    "wheels_in_motion_analytics_spark.functions.corpus_scale",
    "wheels_in_motion_analytics_spark.functions.embeddings",
    "wheels_in_motion_analytics_spark.functions.pq",
    "wheels_in_motion_analytics_spark.functions.curation",
    "wheels_in_motion_analytics_spark.functions.chunking",
    "wheels_in_motion_analytics_spark.functions.tokenizer",
    "wheels_in_motion_analytics_spark.functions.layout",
    "wheels_in_motion_analytics_spark.functions.graph",
    "wheels_in_motion_analytics_spark.functions.retrieval",
    "wheels_in_motion_analytics_spark.functions.linkage",
    "wheels_in_motion_analytics_spark.functions.integrity",
    "wheels_in_motion_analytics_spark.functions.stats",
    "wheels_in_motion_analytics_spark.functions.product_analytics",
    "wheels_in_motion_analytics_spark.functions.sql_surface",
    "wheels_in_motion_analytics_spark.functions.modern_sql",
    "wheels_in_motion_analytics_spark.functions.ml",
    "wheels_in_motion_analytics_spark.plans.enriched",
    "wheels_in_motion_analytics_spark.plans.analytics",
    "wheels_in_motion_analytics_spark.plans.analytics_deep",
    "wheels_in_motion_analytics_spark.plans.analytics_wide",
    "wheels_in_motion_analytics_spark.streaming.windows",
    "wheels_in_motion_analytics_spark.streaming.joins",
    "wheels_in_motion_analytics_spark.streaming.stateful",
    "wheels_in_motion_analytics_spark.streaming.sinks",
    "wheels_in_motion_analytics_spark.streaming.state_reader",
    "wheels_in_motion_analytics_spark.multimodal",
    "wheels_in_motion_analytics_spark.sources.manifest",
    "wheels_in_motion_analytics_spark.sources.partitioned",
    "wheels_in_motion_analytics_spark.sources.cdc",
    "wheels_in_motion_analytics_spark.sources.versioned",
    "wheels_in_motion_analytics_spark.sources.formats",
    "wheels_in_motion_analytics_spark.sources.scan_queries",
]


def register(
    name: str,
    oracle: str | None = None,
    category: str = "",
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, category=category, doc=doc or (fn.__doc__ or ""), tags=tags
        )
        return fn

    return deco


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return REGISTRY
