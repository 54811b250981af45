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
# P1/P4-P8 below are demoted r5 (VERDICT r4 consolidation): five
# single-projection queries folded into the one composed silver_projection
# query (end of this section), which replays transform_bronze's full
# projection chain end-to-end and carries the driver signal for all of
# them. Each stays oracled in the local parity suite via DEMOTED.


@register(
    "normalize_types",
    demoted=True,
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
    silver transaction shape.

    Demoted (r5 consolidation): driver signal carried by silver_projection (the composed P1-P8 chain).
    """
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
    demoted=True,
    sql="""
    SELECT o_orderkey, CAST(1.0 AS DOUBLE) AS data_quality_score,
           TIMESTAMP '2026-01-01 00:00:00' AS processed_timestamp
    FROM orders
    """,
)
def audit_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+P5 (reference bronze_to_silver.py:44-45): lit quality score +
    processing timestamp; the clock is injectable so the plan stays
    deterministic (the pipeline uses current_timestamp()).

    Demoted (r5 consolidation): driver signal carried by silver_projection (the composed P1-P8 chain).
    """
    o = T(spark, sf_dir, "orders").select("o_orderkey")
    return derive.add_audit_columns(
        o, clock=F.lit("2026-01-01 00:00:00").cast("timestamp")
    )


# -- P6: date-part extraction ----------------------------------------------


@register(
    "derive_date_parts",
    demoted=True,
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
    also the silver partition keys.

    Demoted (r5 consolidation): driver signal carried by silver_projection (the composed P1-P8 chain).
    """
    o = T(spark, sf_dir, "orders")
    return derive.add_date_parts(o, "o_orderdate").select(
        "o_orderkey", "year", "month", "day", "hour"
    )


# -- P7: CASE-WHEN bucketing ----------------------------------------------


@register(
    "amount_category",
    demoted=True,
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
    scaled to the o_totalprice domain.

    Demoted (r5 consolidation): driver signal carried by silver_projection (the composed P1-P8 chain).
    """
    o = T(spark, sf_dir, "orders")
    return derive.add_amount_category(
        o, "o_totalprice", small_max=100_000.0, medium_max=300_000.0
    ).select("o_orderkey", "o_totalprice", "amount_category")


# -- P8: cast-compare derivation -------------------------------------------


@register(
    "whole_number_flag",
    demoted=True,
    sql="""
    SELECT o_orderkey, o_totalprice,
           -- long-castability bounds mirror the engine's try_cast('long'):
           -- whole doubles outside [-2^63, 2^63) and NaN/Inf classify as
           -- 'decimal' on BOTH sides (DuckDB's trunc(x)=x alone would call
           -- them whole_number, and DuckDB NaN=NaN is true)
           CASE WHEN trunc(o_totalprice) = o_totalprice
                 AND isfinite(o_totalprice)
                 AND o_totalprice >= -9223372036854775808.0
                 AND o_totalprice <  9223372036854775808.0
                THEN 'whole_number'
                ELSE 'decimal' END AS transaction_type_derived
    FROM orders
    """,
)
def whole_number_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 (reference bronze_to_silver.py:67-69): whole_number iff the double
    equals its long truncation (positive domain, so trunc == cast-to-long).

    Demoted (r5 consolidation): driver signal carried by silver_projection (the composed P1-P8 chain).
    """
    o = T(spark, sf_dir, "orders")
    return derive.add_type_derived(o, "o_totalprice").select(
        "o_orderkey", "o_totalprice", "transaction_type_derived"
    )


# -- P1+P2+P3+P4+P5+P6+P7+P8: the composed silver projection ---------------


@register(
    "silver_projection",
    sql="""
    SELECT CAST(o_orderkey AS VARCHAR) AS transaction_id,
           CAST(o_custkey AS VARCHAR) AS customer_id,
           CAST(o_totalprice AS DOUBLE) AS amount,
           o_orderdate AS transaction_date,
           o_orderstatus AS status,
           CAST(1.0 AS DOUBLE) AS data_quality_score,
           TIMESTAMP '2026-01-01 00:00:00' AS processed_timestamp,
           CAST(year(o_orderdate) AS INTEGER) AS year,
           CAST(month(o_orderdate) AS INTEGER) AS month,
           CAST(day(o_orderdate) AS INTEGER) AS day,
           CAST(hour(o_orderdate) AS INTEGER) AS hour,
           CASE WHEN o_totalprice < 100000.0 THEN 'small'
                WHEN o_totalprice < 300000.0 THEN 'medium'
                ELSE 'large' END AS amount_category,
           CASE WHEN trunc(o_totalprice) = o_totalprice
                 AND isfinite(o_totalprice)
                 AND o_totalprice >= -9223372036854775808.0
                 AND o_totalprice <  9223372036854775808.0
                THEN 'whole_number'
                ELSE 'decimal' END AS transaction_type_derived
    FROM orders
    WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
      AND o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
      AND o_totalprice > 0
    """,
)
def silver_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P8 composed end-to-end: the full bronze->silver projection chain
    of ``pipeline.medallion.transform_bronze`` (reference
    bronze_to_silver.py:26-69) minus the A1 dedup, which ``dedup_by_key``
    carries separately. One query proves the normalize -> validate -> audit
    -> date-part -> bucket -> type-flag composition value-exact, replacing
    the five demoted single-projection queries (normalize_types,
    audit_columns, derive_date_parts, amount_category, whole_number_flag)
    in the driver window. The whole chain is a single narrow projection +
    one pushed-down filter — no shuffle, no exchange, WholeStageCodegen
    end to end."""
    o = T(spark, sf_dir, "orders")
    out = cleanse.normalize_types(o, casts={"o_totalprice": "double"})
    out = out.select(
        F.col("o_orderkey").cast("string").alias("transaction_id"),
        F.col("o_custkey").cast("string").alias("customer_id"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderdate").alias("transaction_date"),
        F.col("o_orderstatus").alias("status"),
    )
    out = cleanse.require_non_null(
        out, ["transaction_id", "customer_id", "amount", "transaction_date"]
    )
    out = cleanse.require_positive(out, "amount")
    out = derive.add_audit_columns(
        out, clock=F.lit("2026-01-01 00:00:00").cast("timestamp")
    )
    out = derive.add_date_parts(out, "transaction_date")
    out = derive.add_amount_category(
        out, "amount", small_max=100_000.0, medium_max=300_000.0
    )
    return derive.add_type_derived(out, "amount")


# -- A1: deterministic dedup ----------------------------------------------


@register(
    "dedup_by_key",
    demoted=True,
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
    interchangeable).

    Demoted round 13 (paired with golden_customer_records' promotion):
    A1's deterministic-survivor fold — groupBy key, min/max(struct(...))
    arg-pick under a total order — runs VERBATIM as every
    golden_customer_records survivorship rule AND as
    cdc_apply_batch_fold's latest-by-sequence collapse (both registered
    this round), so the reference-parity A1 signal stays driver-visible
    twice over. Full oracle stays in the pytest replica."""
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
    demoted=True,
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
    (year, month, day, customer) grain. One shuffle, partial+final hash agg.

    Demoted r12 (hash-green r11, full oracle stays in the pytest replica)
    to seat cohort_retention_daily under the named-demotion rule: the
    SAME aggregate_transactions bundle stays driver-visible at every
    grain — day included — via multi_grain_rollup_hierarchical (oracled,
    registered), exactly as monthly_aggregations' r5 demotion rode this
    entry."""
    o = derive.add_date_parts(T(spark, sf_dir, "orders"), "o_orderdate")
    out = agg_ops.aggregate_transactions(
        o,
        ["year", "month", "day", "o_custkey"],
        "o_totalprice",
        "o_orderkey",
        level="daily",
    )
    return out.withColumnRenamed("o_custkey", "customer_id")


# demoted r5: the monthly grain keeps driver signal via daily_aggregations
# (same 6-aggregate bundle, same operator) and the multi-grain rollup
@register(
    "monthly_aggregations",
    demoted=True,
    sql=_AGG_SQL.format(
        month_part="CAST(month(o_orderdate) AS INTEGER) AS month,",
        level="monthly",
        group_by="1, 2, 3",
    ),
)
def monthly_aggregations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 (reference silver_to_gold.py:38-50): same bundle at month grain.

    Demoted (r5 consolidation): driver signal carried by multi_grain_rollup_hierarchical (month grain included).
    """
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


@register("customer_insights_incremental_twin", sql=CUSTOMER_INSIGHTS_SQL, demoted=True)
def customer_insights_incremental_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalence proof for the incremental gold path
    (streaming/gold.py): the orders history split into two "micro-batches"
    (orderdate year <= 1995 / > 1995), each folded to the mergeable
    per-customer state (additive counts, decimal sums, least/greatest
    dates, HLL active-day sketch), merged with the SAME pure algebra the
    streaming sink applies (gold.merge_states), then presented to the
    customer_insights contract — and checked against customer_insights'
    OWN oracle SQL, so the driver proves merged state ==
    recompute-from-history.

    Demoted r12 (hash-green r10, full oracle stays in the pytest replica)
    to seat k_anonymity_customer_audit under the named-demotion rule: by
    construction this entry's value contract is IDENTICAL to
    customer_insights (registered, oracled — the least-information pair
    in the window), and the mergeable-state incremental path it proves
    stays pinned by the streaming gold pytest suite plus this oracle's
    every-run replica. The HLL estimate is exact at the testdata's
    per-customer active-day cardinalities (the sketch stays in exact
    coupon mode, far below its HLL-array promotion threshold); at 100 TB
    scale it is the documented ~2% estimate trade."""
    from aws_data_pipeline_spark.streaming import gold

    o = T(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderdate").alias("transaction_date"),
    )
    s1 = gold._batch_state(o.filter(F.year("transaction_date") <= 1995))
    s2 = gold._batch_state(o.filter(F.year("transaction_date") > 1995))
    st = gold.merge_states(s1, s2)
    out = st.select(
        "customer_id",
        F.col("txn_count").alias("lifetime_transactions"),
        # exact decimal sum -> one double cast == dsum; cast BEFORE the
        # divide so avg is the same single IEEE division as davg
        F.col("total_amount").cast("double").alias("lifetime_value"),
        (F.col("total_amount").cast("double") / F.col("txn_count")).alias(
            "avg_transaction_amount"
        ),
        "first_transaction_date",
        "last_transaction_date",
        F.hll_sketch_estimate("days_sketch").alias("active_days"),
    )
    return derive.add_tenure_and_segment(
        out,
        "first_transaction_date",
        "last_transaction_date",
        "lifetime_value",
        high_min=4_000_000.0,
        medium_min=2_000_000.0,
    )


# -- §4.2-2: single-pass multi-grain GROUPING SETS -------------------------


MULTI_GRAIN_SQL = f"""
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
    """


# demoted r5: multi_grain_rollup_hierarchical shares this EXACT oracle and
# is the scale-superior formulation (no GROUPING SETS 4x row expand), so it
# carries the capability's driver signal; this GROUPING SETS twin stays
# oracled locally via DEMOTED
@register("multi_grain_rollup", sql=MULTI_GRAIN_SQL, demoted=True)
def multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY.md §4.2-2: daily+monthly+yearly+lifetime grains in ONE scan via
    GROUPING SETS, replacing the reference's three independent scans of
    silver (silver_to_gold.py:126-128).

    Demoted (r5 consolidation): driver signal carried by multi_grain_rollup_hierarchical (same grains, fewer shuffles).
    """
    o = derive.add_date_parts(T(spark, sf_dir, "orders"), "o_orderdate")
    return agg_ops.multi_grain_rollup(
        o, "o_custkey", "o_totalprice", "o_orderkey"
    )


@register(
    "multi_grain_rollup_hierarchical",
    sql=MULTI_GRAIN_SQL,  # SAME oracle as multi_grain_rollup: results identical
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
