"""Shared helpers for plan modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_data_pipeline_spark.catalog import load


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load(spark, sf_dir, name)


def dsum_sql(col: str) -> str:
    """DuckDB twin of functions.exact.dsum (order-independent decimal sum)."""
    return f"CAST(SUM(CAST({col} AS DECIMAL(30,2))) AS DOUBLE)"


def davg_sql(col: str) -> str:
    """DuckDB twin of functions.exact.davg."""
    return f"CAST(SUM(CAST({col} AS DECIMAL(30,2))) AS DOUBLE) / COUNT({col})"
