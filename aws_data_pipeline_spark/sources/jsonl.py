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
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT_COL = "_corrupt_record"


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


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    recursive: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """JSONL scan that QUARANTINES malformed lines instead of silently
    nulling them: returns ``(good, bad)`` — ``good`` with exactly the
    declared schema, ``bad`` carrying each unparseable line's raw text.

    The plain ``read_jsonl`` runs PERMISSIVE without a corrupt column, so
    a mangled line surfaces as an all-null row that the downstream
    null-validation gate drops ANONYMOUSLY — indistinguishable from a
    well-formed row with missing fields, and the raw bytes are gone. For
    third-party feeds at 100 TB the quarantine split is the right
    bronze-edge posture: route unparseable lines to a dead-letter sink
    with their original text (re-parseable after a schema fix), count
    them in QC, keep the job alive. Mirrors ``read_csv_quarantine``
    (sources/delimited.py) including its fine print: consume ``good``
    full-width (corruption detection is per-parsed-column — a pruned read
    cannot flag a type mismatch in a pruned field), ``good.count()``
    fails loudly (SPARK-21610), and the bad frame references EVERY schema
    column (full parse, so a line malformed in any field is captured) and
    is materialized eagerly so downstream counts work.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT_COL, T.StringType())]
    )
    raw = (
        spark.read.schema(full)
        .option("multiLine", "false")
        .option("recursiveFileLookup", str(recursive).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT_COL)
        .json(path)
    )
    from aws_data_pipeline_spark.sources.delimited import quarantine_split

    return quarantine_split(raw, schema, _CORRUPT_COL)


def write_jsonl(df: DataFrame, path: str, num_files: int | None = None) -> None:
    """Producer-side JSONL writer (fixture generation; reference S8)."""
    out = df.repartition(num_files) if num_files else df
    out.write.mode("overwrite").json(path)
