"""Partitioned parquet zone sinks — reference S3-S7.

Writer semantics per zone (reference sites in docstrings). Key scale
decisions baked in:

- ``partitionOverwriteMode=dynamic`` (session default): gold overwrites
  replace only the partitions present in the batch, not the whole table —
  the reference's full-table overwrite (``silver_to_gold.py:141-149``) is
  O(history) per run.
- partition-key guard before every partitioned write (reference P9):
  null keys would create ``__HIVE_DEFAULT_PARTITION__`` directories.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from aws_data_pipeline_spark.operators.cleanse import require_non_null


def write_zone(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "append",
    compression: str = "snappy",
) -> None:
    """Partitioned parquet sink (S4-S7): silver appends partitioned by
    year/month/day (``bronze_to_silver.py:138-143``); gold overwrites at
    its grain (``silver_to_gold.py:141-149``)."""
    if partition_by:
        df = require_non_null(df, partition_by)
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_zone(spark: SparkSession, path: str) -> DataFrame:
    """Partition-discovering parquet scan (S3, ``silver_to_gold.py:120``).
    Partition-key filters prune directories before any I/O."""
    return spark.read.parquet(path)
