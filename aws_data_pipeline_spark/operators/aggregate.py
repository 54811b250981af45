"""Aggregation operators (reference parity: A2-A6 + the single-pass
GROUPING SETS improvement from SURVEY.md §4.2-2).

Reference sites: ``silver_to_gold.py:20-32`` (daily), ``:38-50`` (monthly),
``:56-64`` (customer lifetime).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_data_pipeline_spark.functions.exact import davg, dsum


def aggregate_transactions(
    df: DataFrame,
    group_cols: Sequence[str],
    amount_col: str,
    txn_id_col: str,
    level: str | None = None,
) -> DataFrame:
    """A3/A4 generalized: the reference's 6-aggregate bundle at any grain.

    ``count / sum / avg / min / max / countDistinct`` — Catalyst plans this as
    partial (map-side) + final hash aggregation: one shuffle keyed on
    ``group_cols``, combiner-reduced, which is the scalable shape for
    100 TB (no driver-side state, no extra pass per aggregate).
    """
    aggs = [
        F.count("*").alias("transaction_count"),
        dsum(amount_col).alias("total_amount"),
        davg(amount_col).alias("avg_amount"),
        F.min(amount_col).alias("min_amount"),
        F.max(amount_col).alias("max_amount"),
        F.countDistinct(txn_id_col).alias("unique_transactions"),
    ]
    out = df.groupBy(*group_cols).agg(*aggs)
    if level is not None:
        out = out.withColumn("aggregation_level", F.lit(level))
    return out


def customer_lifetime(
    df: DataFrame,
    customer_col: str,
    amount_col: str,
    date_col: str,
) -> DataFrame:
    """A5/A6: per-customer lifetime stats incl. multi-column distinct days.

    ``active_days`` = countDistinct over the calendar date (equivalent to the
    reference's ``countDistinct(year,month,day)``, ``silver_to_gold.py:63``,
    since the parts are non-null and jointly bijective with the date).
    """
    return df.groupBy(customer_col).agg(
        F.count("*").alias("lifetime_transactions"),
        dsum(amount_col).alias("lifetime_value"),
        davg(amount_col).alias("avg_transaction_amount"),
        F.min(date_col).alias("first_transaction_date"),
        F.max(date_col).alias("last_transaction_date"),
        F.countDistinct(F.to_date(date_col)).alias("active_days"),
    )


def multi_grain_rollup(
    df: DataFrame,
    customer_col: str,
    amount_col: str,
    txn_id_col: str,
    year_col: str = "year",
    month_col: str = "month",
    day_col: str = "day",
) -> DataFrame:
    """§4.2-2: daily+monthly+lifetime in ONE scan via GROUPING SETS.

    The reference computes three gold tables with three independent scans of
    silver (``silver_to_gold.py:126-128``); at 100 TB that is 3x the I/O.
    GROUPING SETS shares the scan and the partial aggregation; the
    ``aggregation_level`` discriminator is derived from which keys are
    non-null (all three part columns are non-null in the data itself, so a
    null can only come from the grouping-set padding).
    """
    df.createOrReplaceTempView("__txns")
    q = f"""
        SELECT
          {customer_col} AS customer_id,
          {year_col} AS year, {month_col} AS month, {day_col} AS day,
          CASE WHEN {day_col} IS NOT NULL THEN 'daily'
               WHEN {month_col} IS NOT NULL THEN 'monthly'
               WHEN {year_col} IS NOT NULL THEN 'yearly'
               ELSE 'lifetime' END AS aggregation_level,
          COUNT(*) AS transaction_count,
          CAST(SUM(CAST({amount_col} AS DECIMAL(30,2))) AS DOUBLE) AS total_amount,
          CAST(SUM(CAST({amount_col} AS DECIMAL(30,2))) AS DOUBLE) / COUNT({amount_col})
            AS avg_amount,
          MIN({amount_col}) AS min_amount,
          MAX({amount_col}) AS max_amount,
          COUNT(DISTINCT {txn_id_col}) AS unique_transactions
        FROM __txns
        GROUP BY GROUPING SETS (
          ({customer_col}, {year_col}, {month_col}, {day_col}),
          ({customer_col}, {year_col}, {month_col}),
          ({customer_col}, {year_col}),
          ({customer_col})
        )
    """
    return df.sparkSession.sql(q)
