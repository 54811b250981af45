"""CSV and ORC source/sink — format surface beyond the reference's
JSONL + Parquet (reference S1-S8), for interchange with warehouses that
export delimited files and ORC-based lakes.

Same rules as every other source here: explicit StructType (no inference
pass at 100 TB), recursive lookup for nested batch layouts, and
column/predicate pushdown preserved (ORC supports both natively; CSV scans
prune columns at parse time)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
    recursive: bool = True,
) -> DataFrame:
    """CSV scan with explicit schema. ``mode=FAILFAST`` — silent null-ing of
    malformed rows (the default PERMISSIVE) hides data-quality problems the
    cleanse operators are supposed to count."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("recursiveFileLookup", str(recursive).lower())
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_csv(
    df: DataFrame, path: str, header: bool = True, delimiter: str = ","
) -> None:
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).orc(path)


def write_orc(
    df: DataFrame, path: str, partition_by: Sequence[str] = (), mode: str = "overwrite"
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
