"""JSONL (newline-delimited JSON) source/sink — reference S1/S8.

Reference reads bronze JSONL with Glue DynamicFrame + schema inference
(``bronze_to_silver.py:108-116``); we read with an explicit StructType
(no inference pass — at 100 TB inference means an extra listing+sampling
job and nondeterministic types) and ``recursiveFileLookup`` for the
nested batch-file layout the generator produces
(``generate_test_data.py:49`` key pattern ``raw/transactions/batch_*``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    recursive: bool = True,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("multiLine", "false")
        .option("recursiveFileLookup", str(recursive).lower())
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, num_files: int | None = None) -> None:
    """Producer-side JSONL writer (fixture generation; reference S8)."""
    out = df.repartition(num_files) if num_files else df
    out.write.mode("overwrite").json(path)
