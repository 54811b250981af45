"""Data-quality checks — the reference SHIPS these as 0-byte placeholders
(``src/glue_jobs/data_quality_checks.py`` and
``src/lambda_functions/data_validation.py`` are both empty files; its only
real QC is the validate/dedup filter in ``bronze_to_silver.py:26-51``).
This module is the real implementation of that intent.

Design: every check is expressed as ONE aggregation pass over the table
(conditional aggregates, not one scan per rule), so a 40-rule suite on
100 TB costs a single scan. Checks return data, not booleans — the caller
(or the driver oracle) decides pass/fail thresholds.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Single-pass column profile: rows, nulls, distinct, min/max per column.

    One wide aggregate -> one scan -> one row; unpivoted to a row per column
    (stack is a projection, not a shuffle).
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            # min/max in the column's NATIVE order, stringified after —
            # casting first would compare lexicographically ('999' > '1499')
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args: list[str] = []
    for c in cols:
        stack_args.append(f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max")
    stacked = wide.selectExpr(
        "__rows AS n_rows",
        f"stack({len(cols)}, {', '.join(stack_args)}) "
        "AS (column_name, null_count, distinct_count, min_value, max_value)",
    )
    return stacked.select(
        "column_name", "n_rows", "null_count", "distinct_count", "min_value", "max_value"
    )


def rule_violations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Named predicate rules -> violation counts, ONE pass.

    ``rules`` maps rule name -> a Column that is True when the row VIOLATES
    the rule. Output: (rule_name, violation_count, violation_fraction).
    """
    aggs = [F.count(F.lit(1)).alias("__rows")] + [
        F.sum(cond.cast("long")).alias(name) for name, cond in rules.items()
    ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{name}', {name}" for name in rules)
    return wide.selectExpr(
        "__rows AS n_rows",
        f"stack({len(rules)}, {stack_args}) AS (rule_name, violation_count)",
    ).select(
        "rule_name",
        "violation_count",
        (F.col("violation_count") / F.col("n_rows")).alias("violation_fraction"),
    )


def schema_drift(df: DataFrame, expected: dict[str, str]) -> list[tuple[str, str, str]]:
    """Compare actual (name -> type) against expected; returns
    (column, expected_type, actual_type) rows where they differ ('<missing>'
    marks absence). Driver-side metadata only — no Spark job."""
    actual = dict(df.dtypes)
    out: list[tuple[str, str, str]] = []
    for name, etype in expected.items():
        atype = actual.get(name, "<missing>")
        if atype != etype:
            out.append((name, etype, atype))
    for name, atype in actual.items():
        if name not in expected:
            out.append((name, "<missing>", atype))
    return out


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key-uniqueness audit: keys appearing more than once, with counts."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .filter(F.col("occurrences") > 1)
    )
