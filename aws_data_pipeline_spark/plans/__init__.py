"""The named-query registry.

Every operator from SURVEY.md §2 (and the north-star extensions) is exposed as
a named query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, where
expressible, a DuckDB-runnable ANSI-SQL oracle twin over the same tables.
``__spark_entry__.py`` serves the driver straight from this registry.

Contract rules (driver compares row-count + schema + order-insensitive value
hash, columns sorted by name):
- alias every computed column identically in Spark and SQL;
- no nondeterministic columns (no current_timestamp, no arbitrary-survivor
  dedup) in registered outputs;
- double aggregates routed through functions.exact for order-independence.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    sql: str | None  # DuckDB oracle; None => rows-only driver check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, sql: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a Spark query with its oracle SQL twin."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, spark_fn=fn, sql=sql, doc=fn.__doc__ or "")
        return fn

    return deco


_PLAN_MODULES = (
    "aws_data_pipeline_spark.plans.reference",
    "aws_data_pipeline_spark.plans.analytics",
    "aws_data_pipeline_spark.plans.tpch",
    "aws_data_pipeline_spark.plans.llm",
    "aws_data_pipeline_spark.plans.quality",
    "aws_data_pipeline_spark.plans.streaming_batch",
)


def load_registry() -> dict[str, Query]:
    """Import all plan modules (populating REGISTRY) and return it."""
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)
    return REGISTRY
