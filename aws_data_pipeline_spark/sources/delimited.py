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
from pyspark.sql import functions as F
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


CORRUPT_COL = "_corrupt_record"


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
    recursive: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """CSV scan that QUARANTINES malformed rows instead of failing the job:
    returns ``(good, bad)`` where ``good`` has exactly the declared schema
    and ``bad`` carries the raw text of each unparseable line.

    This is the other half of the ``read_csv`` FAILFAST trade: FAILFAST is
    right when any corruption means the export is broken and must be
    re-delivered; at 100 TB of third-party feeds, one mangled line must not
    kill a multi-hour job — route it to a quarantine sink, count it in QC,
    keep going. The two frames are independent scans over the same files —
    nothing is cached or pinned (an earlier draft cached the raw scan for
    the whole session; two parse passes are strictly cheaper than holding
    100 TB of parsed CSV in executor storage). Spark refuses plans whose
    scan references ONLY the corrupt column (SPARK-21610), so the bad
    frame carries one schema column through the filter and drops it after.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("recursiveFileLookup", str(recursive).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    good = raw.filter(raw[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    # the coalesce keeps one schema column referenced in the scan (plain
    # select-then-drop gets pruned back to corrupt-only and rejected);
    # values are unchanged — corrupt is always non-null under this filter
    first_field = schema.fieldNames()[0]
    bad = raw.filter(raw[CORRUPT_COL].isNotNull()).select(
        F.coalesce(
            F.col(CORRUPT_COL), F.col(first_field).cast("string")
        ).alias(CORRUPT_COL)
    )
    return good, bad


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
