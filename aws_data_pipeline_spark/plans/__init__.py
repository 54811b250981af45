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
# CORRECTNESS gate covers a bounded prefix of it (50 entries in round 1).
# Priority therefore front-loads what most needs the hard oracle signal:
# the LLM north-star surface, the DQ + streaming batch twins, the TPC-H
# shapes unchecked in round 1, the three queries whose oracle typing was
# fixed this round, then ten flagship reference-parity queries. Everything
# else (all green in CORRECTNESS_r01.json, still covered by the local
# oracle replica tests/test_oracle_parity.py at every run) follows in
# registration order.
_PRIORITY = (
    # LLM north-star: dedup / similarity / text / multimodal / curation
    "dedup_exact_text",
    "ngram_jaccard_pairs",
    "minhash_lsh_dedup",
    "simhash_hamming_pairs",
    "neardup_clusters",
    "embedding_cosine_topk",
    "embedding_neardup_pairs",
    "embedding_ann_ivf",
    "embedding_ann_lsh",
    "lang_id_stopwords",
    "text_quality_scores",
    "token_counts",
    "doc_fingerprints",
    "multimodal_decode_features",
    "dataset_split_counts",
    "stratified_sample_counts",
    "vocabulary_top_tokens",
    "curated_corpus_stats",
    "pii_redaction_stats",
    "benchmark_decontamination",
    "text_repetition_stats",
    "heavy_hitter_tokens_approx",
    "sequence_packing",
    # data-quality profiling
    "dq_profile_orders",
    "dq_rule_violations_lineitem",
    "dq_duplicate_order_lines",
    # streaming-window batch twins
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_window_counts",
    # TPC-H shapes without a round-1 CORRECTNESS row
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q21_suppliers_kept_waiting",
    "q22_idle_rich_customers",
    # oracle-typing fixes needing re-verification
    "json_props_stats",
    "sessionize_events",
    "q12_priority_by_shipyear",
    # flagship reference-parity / analytics
    "customer_insights",
    "multi_grain_rollup",
    "q1_pricing_summary",
    "q18_large_volume_customers",
    "dedup_by_key",
    "daily_aggregations",
    "scd2_customer_segment_history",
    "asof_last_click_before_purchase",
    "daily_gapfill_nation_revenue",
    "funnel_view_click_purchase",
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
