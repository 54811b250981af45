"""Driver contract for the spark-graft builder (PySpark target).

Served straight from the engine's query registry
(``aws_data_pipeline_spark.plans``): every registered query is a Spark
callable plus (where SQL-expressible) a DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_data_pipeline_spark.plans import load_registry

_REGISTRY = load_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (customer insights) on /root/testdata/sf0.001."""
    return _REGISTRY["customer_insights"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query."""
    return {name: q.sql for name, q in _REGISTRY.items() if q.sql is not None}
