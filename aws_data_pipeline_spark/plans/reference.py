"""Reference-parity queries (SURVEY.md §2.2/§2.3) over the driver testdata.

Role mapping (FIXTURES.md): ``orders`` plays the reference's ``transactions``
table — amount -> ``o_totalprice``, date -> ``o_orderdate``, customer ->
``o_custkey``; ``lineitem`` exercises dedup at higher row counts.

Bucketing/tier thresholds are scaled to the testdata value domains
(o_totalprice ~ [1.3k, 500k], lifetime value ~ [0.6M, 6M]) while keeping the
reference's exact comparison semantics (strict < / >).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_data_pipeline_spark.functions.exact import davg, dsum
from aws_data_pipeline_spark.operators import aggregate as agg_ops
from aws_data_pipeline_spark.operators import cleanse, derive
from aws_data_pipeline_spark.plans import register
from aws_data_pipeline_spark.plans.common import T, davg_sql, dsum_sql

# -- P1: type normalization projection ------------------------------------


@register(
    "normalize_types",
    sql="""
    SELECT CAST(o_orderkey AS VARCHAR) AS transaction_id,
           CAST(o_custkey AS VARCHAR) AS customer_id,
           CAST(o_totalprice AS DOUBLE) AS amount,
           o_orderdate AS transaction_date,
           o_orderstatus AS status
    FROM orders
    """,
)
def normalize_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 (reference bronze_to_silver.py:123-126): cast-normalize to the
    silver transaction shape."""
    o = T(spark, sf_dir, "orders")
    out = cleanse.normalize_types(o, casts={"o_totalprice": "double"})
    return out.select(
        F.col("o_orderkey").cast("string").alias("transaction_id"),
        F.col("o_custkey").cast("string").alias("customer_id"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderdate").alias("transaction_date"),
        F.col("o_orderstatus").alias("status"),
    )


# -- P2/P3: validation filters ---------------------------------------------


@register(
    "filter_valid_transactions",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
      AND o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
      AND o_totalprice > 0
    """,
)
def filter_valid_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+P3 (reference bronze_to_silver.py:35-42): null-rejection on the four
    required keys plus positive-amount predicate. Catalyst pushes the whole
    conjunction into the parquet scan."""
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    o = cleanse.require_non_null(
        o, ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    return cleanse.require_positive(o, "o_totalprice")


# -- P4/P5: constant + audit columns (clock injected for determinism) ------


@register(
    "audit_columns",
    sql="""
    SELECT o_orderkey, CAST(1.0 AS DOUBLE) AS data_quality_score,
           TIMESTAMP '2026-01-01 00:00:00' AS processed_timestamp
    FROM orders
    """,
)
def audit_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+P5 (reference bronze_to_silver.py:44-45): lit quality score +
    processing timestamp; the clock is injectable so the plan stays
    deterministic (the pipeline uses current_timestamp())."""
    o = T(spark, sf_dir, "orders").select("o_orderkey")
    return derive.add_audit_columns(
        o, clock=F.lit("2026-01-01 00:00:00").cast("timestamp")
    )


# -- P6: date-part extraction ----------------------------------------------


@register(
    "derive_date_parts",
    sql="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS year,
           CAST(month(o_orderdate) AS INTEGER) AS month,
           CAST(day(o_orderdate) AS INTEGER) AS day,
           CAST(hour(o_orderdate) AS INTEGER) AS hour
    FROM orders
    """,
)
def derive_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 (reference bronze_to_silver.py:57-60): year/month/day/hour parts —
    also the silver partition keys."""
    o = T(spark, sf_dir, "orders")
    return derive.add_date_parts(o, "o_orderdate").select(
        "o_orderkey", "year", "month", "day", "hour"
    )


# -- P7: CASE-WHEN bucketing ----------------------------------------------


@register(
    "amount_category",
    sql="""
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_totalprice < 100000.0 THEN 'small'
                WHEN o_totalprice < 300000.0 THEN 'medium'
                ELSE 'large' END AS amount_category
    FROM orders
    """,
)
def amount_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 (reference bronze_to_silver.py:62-65): strict-< bucket thresholds,
    scaled to the o_totalprice domain."""
    o = T(spark, sf_dir, "orders")
    return derive.add_amount_category(
        o, "o_totalprice", small_max=100_000.0, medium_max=300_000.0
    ).select("o_orderkey", "o_totalprice", "amount_category")


# -- P8: cast-compare derivation -------------------------------------------


@register(
    "whole_number_flag",
    sql="""
    SELECT o_orderkey, o_totalprice,
           CASE WHEN trunc(o_totalprice) = o_totalprice THEN 'whole_number'
                ELSE 'decimal' END AS transaction_type_derived
    FROM orders
    """,
)
def whole_number_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 (reference bronze_to_silver.py:67-69): whole_number iff the double
    equals its long truncation (positive domain, so trunc == cast-to-long)."""
    o = T(spark, sf_dir, "orders")
    return derive.add_type_derived(o, "o_totalprice").select(
        "o_orderkey", "o_totalprice", "transaction_type_derived"
    )


# -- A1: deterministic dedup ----------------------------------------------


@register(
    "dedup_by_key",
    sql="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice
    FROM (
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice
             ) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (reference bronze_to_silver.py:33) as the deterministic variant:
    first line per order under a TOTAL order — stable across re-runs, which
    the reference's dropDuplicates is not (SURVEY.md §4.2-6). The tiebreak
    spans every projected column because l_linenumber alone is not unique in
    the testdata (only fully-identical rows remain tied, and those are
    interchangeable)."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    return cleanse.dedup_deterministic(
        li,
        ["l_orderkey"],
        [
            F.col("l_linenumber"),
            F.col("l_partkey"),
            F.col("l_suppkey"),
            F.col("l_extendedprice"),
        ],
    )


# -- A3/A4: daily & monthly aggregations -----------------------------------

_AGG_SQL = f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
           {{month_part}}
           o_custkey AS customer_id,
           COUNT(*) AS transaction_count,
           {dsum_sql('o_totalprice')} AS total_amount,
           {davg_sql('o_totalprice')} AS avg_amount,
           MIN(o_totalprice) AS min_amount,
           MAX(o_totalprice) AS max_amount,
           COUNT(DISTINCT o_orderkey) AS unique_transactions,
           '{{level}}' AS aggregation_level
    FROM orders
    GROUP BY {{group_by}}
"""


@register(
    "daily_aggregations",
    sql=_AGG_SQL.format(
        month_part=(
            "CAST(month(o_orderdate) AS INTEGER) AS month,"
            " CAST(day(o_orderdate) AS INTEGER) AS day,"
        ),
        level="daily",
        group_by="1, 2, 3, 4",
    ),
)
def daily_aggregations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (reference silver_to_gold.py:20-32): the 6-aggregate bundle at
    (year, month, day, customer) grain. One shuffle, partial+final hash agg."""
    o = derive.add_date_parts(T(spark, sf_dir, "orders"), "o_orderdate")
    out = agg_ops.aggregate_transactions(
        o,
        ["year", "month", "day", "o_custkey"],
        "o_totalprice",
        "o_orderkey",
        level="daily",
    )
    return out.withColumnRenamed("o_custkey", "customer_id")


@register(
    "monthly_aggregations",
    sql=_AGG_SQL.format(
        month_part="CAST(month(o_orderdate) AS INTEGER) AS month,",
        level="monthly",
        group_by="1, 2, 3",
    ),
)
def monthly_aggregations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 (reference silver_to_gold.py:38-50): same bundle at month grain."""
    o = derive.add_date_parts(T(spark, sf_dir, "orders"), "o_orderdate")
    out = agg_ops.aggregate_transactions(
        o,
        ["year", "month", "o_custkey"],
        "o_totalprice",
        "o_orderkey",
        level="monthly",
    )
    return out.withColumnRenamed("o_custkey", "customer_id")


# -- A5/A6 + P10/P11: customer insights (the flagship) ---------------------

CUSTOMER_INSIGHTS_SQL = f"""
    SELECT o_custkey AS customer_id,
           COUNT(*) AS lifetime_transactions,
           {dsum_sql('o_totalprice')} AS lifetime_value,
           {davg_sql('o_totalprice')} AS avg_transaction_amount,
           MIN(o_orderdate) AS first_transaction_date,
           MAX(o_orderdate) AS last_transaction_date,
           COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS active_days,
           CAST(date_diff('day', CAST(MIN(o_orderdate) AS DATE),
                          CAST(MAX(o_orderdate) AS DATE)) AS INTEGER)
             AS customer_tenure_days,
           CASE WHEN {dsum_sql('o_totalprice')} > 4000000.0 THEN 'high_value'
                WHEN {dsum_sql('o_totalprice')} > 2000000.0 THEN 'medium_value'
                ELSE 'low_value' END AS customer_segment
    FROM orders
    GROUP BY o_custkey
"""


@register("customer_insights", sql=CUSTOMER_INSIGHTS_SQL)
def customer_insights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+A6+P10+P11 (reference silver_to_gold.py:56-78): per-customer
    lifetime stats, tenure days, and value tier. The flagship query —
    exercises scan, hash-agg, distinct-on-date, datediff, CASE tiers."""
    o = T(spark, sf_dir, "orders")
    out = agg_ops.customer_lifetime(o, "o_custkey", "o_totalprice", "o_orderdate")
    out = derive.add_tenure_and_segment(
        out,
        "first_transaction_date",
        "last_transaction_date",
        "lifetime_value",
        high_min=4_000_000.0,
        medium_min=2_000_000.0,
    )
    return out.withColumnRenamed("o_custkey", "customer_id")


# -- §4.2-2: single-pass multi-grain GROUPING SETS -------------------------


@register(
    "multi_grain_rollup",
    sql=f"""
    SELECT o_custkey AS customer_id,
           CAST(year(o_orderdate) AS INTEGER) AS year,
           CAST(month(o_orderdate) AS INTEGER) AS month,
           CAST(day(o_orderdate) AS INTEGER) AS day,
           CASE WHEN CAST(day(o_orderdate) AS INTEGER) IS NOT NULL THEN 'daily'
                WHEN CAST(month(o_orderdate) AS INTEGER) IS NOT NULL THEN 'monthly'
                WHEN CAST(year(o_orderdate) AS INTEGER) IS NOT NULL THEN 'yearly'
                ELSE 'lifetime' END AS aggregation_level,
           COUNT(*) AS transaction_count,
           {dsum_sql('o_totalprice')} AS total_amount,
           {davg_sql('o_totalprice')} AS avg_amount,
           MIN(o_totalprice) AS min_amount,
           MAX(o_totalprice) AS max_amount,
           COUNT(DISTINCT o_orderkey) AS unique_transactions
    FROM orders
    GROUP BY GROUPING SETS (
      (o_custkey, year(o_orderdate), month(o_orderdate), day(o_orderdate)),
      (o_custkey, year(o_orderdate), month(o_orderdate)),
      (o_custkey, year(o_orderdate)),
      (o_custkey)
    )
    """,
)
def multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY.md §4.2-2: daily+monthly+yearly+lifetime grains in ONE scan via
    GROUPING SETS, replacing the reference's three independent scans of
    silver (silver_to_gold.py:126-128)."""
    o = derive.add_date_parts(T(spark, sf_dir, "orders"), "o_orderdate")
    return agg_ops.multi_grain_rollup(
        o, "o_custkey", "o_totalprice", "o_orderkey"
    )


from aws_data_pipeline_spark.plans import REGISTRY as _REGISTRY  # noqa: E402


@register(
    "multi_grain_rollup_hierarchical",
    sql=_REGISTRY["multi_grain_rollup"].sql,  # SAME oracle: results identical
)
def multi_grain_rollup_hierarchical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-superior physical shape of multi_grain_rollup: aggregate the
    finest grain once, re-aggregate upward (no GROUPING SETS 4x row expand;
    ~4x less shuffled bytes at 100 TB). Shares multi_grain_rollup's oracle —
    the driver proves the two formulations value-identical."""
    o = derive.add_date_parts(T(spark, sf_dir, "orders"), "o_orderdate")
    return agg_ops.multi_grain_rollup_hierarchical(
        o, "o_custkey", "o_totalprice", "o_orderkey"
    )
