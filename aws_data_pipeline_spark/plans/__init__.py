"""The named-query registry.

Every operator from SURVEY.md §2 (and the north-star extensions) is exposed as
a named query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, where
expressible, a DuckDB-runnable ANSI-SQL oracle twin over the same tables.
``__spark_entry__.py`` serves the driver straight from this registry.

Contract rules (driver compares row-count + schema + order-insensitive value
hash, columns sorted by name):
- alias every computed column identically in Spark and SQL;
- no nondeterministic columns (no current_timestamp, no arbitrary-survivor
  dedup) in registered outputs;
- double aggregates routed through functions.exact for order-independence.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    sql: str | None  # DuckDB oracle; None => rows-only driver check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, sql: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a Spark query with its oracle SQL twin."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, spark_fn=fn, sql=sql, doc=fn.__doc__ or "")
        return fn

    return deco


_PLAN_MODULES = (
    "aws_data_pipeline_spark.plans.reference",
    "aws_data_pipeline_spark.plans.analytics",
    "aws_data_pipeline_spark.plans.tpch",
    "aws_data_pipeline_spark.plans.llm",
    "aws_data_pipeline_spark.plans.quality",
    "aws_data_pipeline_spark.plans.streaming_batch",
)

# Registry iteration order = driver check order, and the driver's
# CORRECTNESS gate covers a bounded prefix of it (50 entries per round).
# The window ROTATES each round so no query's hard driver signal goes more
# than one round stale (the local oracle replica tests/test_oracle_parity.py
# asserts hash parity over the FULL registry on every pytest run besides).
# Round-3 prefix = 3 new queries (first driver signal), 13 queries whose
# code or input handling changed this round (LSH/simhash/jaccard
# vectorization and oracle-cap mirroring, TPC-H broadcast-hint drops,
# stratified NULL-strata fix, events.ts type adaptation), then the queries
# whose last driver row is round 1 (the final three of those fall past the
# 50-entry window this round and rotate to the head next round).
_PRIORITY = (
    # new this round (first-ever driver signal)
    "quality_median_filter",
    "source_mixture_weights",
    "tfidf_top_terms",
    # changed this round
    "embedding_neardup_pairs",
    "simhash_hamming_pairs",
    "ngram_jaccard_pairs",
    "neardup_clusters",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q21_suppliers_kept_waiting",
    "stratified_sample_counts",
    "sessionize_events",
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_window_counts",
    # driver signal last refreshed in round 1
    "normalize_types",
    "filter_valid_transactions",
    "audit_columns",
    "derive_date_parts",
    "amount_category",
    "whole_number_flag",
    "monthly_aggregations",
    "multi_grain_rollup_hierarchical",
    "regional_revenue",
    "left_join_order_counts",
    "semi_join_active_customers",
    "anti_join_dormant_customers",
    "topk_orders_per_customer",
    "running_customer_spend",
    "order_gap_days",
    "top_orders_global",
    "order_year_set_ops",
    "string_normalize_parts",
    "pivot_event_values",
    "events_within_10min",
    "cube_priority_status",
    "global_table_stats",
    "approx_distinct_customers",
    "full_outer_nation_balance",
    "price_percentiles_by_priority",
    "customer_spend_quartiles",
    "salted_nation_order_stats",
    "sql_surface_order_status",
    "price_percentiles_approx",
    "trailing_30d_customer_spend",
    "unpivot_returnflag_measures",
    "q3_shipping_priority",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_effect",
    "q15_top_supplier",
)


def load_registry() -> dict[str, Query]:
    """Import all plan modules (populating REGISTRY), then reorder it so the
    priority prefix comes first (driver check order — see _PRIORITY)."""
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise ValueError(f"_PRIORITY names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in _PRIORITY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
