"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship star-join query at sf0.001;
`queries()`/`oracle_sql()` expose the full operator registry from
sqldataintegrationfunctiontriggerapp_spark.plans (SURVEY.md §2 coverage), each
PySpark query paired with a DuckDB-runnable ANSI-SQL oracle where the
semantics are SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sqldataintegrationfunctiontriggerapp_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.QUERIES["q3_shipping_priority"](spark, "/root/testdata/sf0.001")


# Sweep priority: the driver checks queries in this dict's insertion order
# and has a finite per-round budget (~50/round). Order of evidence value for
# round 3 (VERDICT r02 "Next round" #1/#4): first the 11 queries with no
# correctness row in EITHER round plus embedding_centroids (red in r02 on
# the canonicalizer, reshaped this round), then queries whose code changed
# this round, then new round-3 queries, then rotation re-verification of
# everything green only on round-1 evidence, oldest-value first. Every
# entry is still registered regardless of budget.
_SWEEP_PRIORITY = [
    # never swept (r01 budget cut + r02 budget cut): no evidence yet
    "argmax_per_group", "null_safe_join", "window_time_range_avg",
    "funnel_analysis", "map_agg_event_counts", "histogram_value_buckets",
    "profile_events_table", "multimodal_chunk_energy",
    "interval_join_left_events", "event_transition_matrix",
    "retention_cohorts",
    # red in r02 (driver canonicalizer TypeError) -- flattened this round
    "embedding_centroids",
    # code changed this round: re-verify before anything long-green
    "dedup_embedding_cosine", "set_except", "join_anti", "dedup_components",
    # new round-3 queries go here (no correctness row can exist yet)
    "q6_forecast_revenue", "q14_promo_revenue", "dedup_duplicate_rate",
    "minhash_jaccard_estimate", "doc_length_histogram",
    "quantile_bands_per_type", "event_value_ntiles", "orders_pareto_share",
    "gap_fill_daily_counts", "sliding_dedup_window", "bursty_users",
    "daily_active_users", "stratified_sample", "pack_documents_greedy",
    "embedding_quantize_error", "ann_ivf_recall_sweep",
    "q4_order_priority", "q8_market_share", "q9_product_profit",
    "q15_top_supplier", "q16_part_supplier_variety",
    "q17_small_quantity_revenue", "q19_disjunctive_revenue",
    "q22_idle_customers", "span_dedup_rate", "mixture_sampling_weights",
    "doc_chunk_spans", "robust_outliers_mad", "window_percent_rank",
    "q12_priority_lines", "q21_waiting_supplier", "source_overlap_matrix",
    # rotation re-verification: green only on round-1 evidence
    # (CORRECTNESS_r01.json), heaviest/most-load-bearing families first
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_components",
    "dedup_simhash", "dedup_exact", "q1_pricing_summary",
    "q3_shipping_priority", "join_broadcast_star", "join_left_outer",
    "join_semi", "join_anti", "agg_rollup", "agg_cube", "agg_grouping_sets",
    "count_distinct", "between_filter", "top_limit", "cte_update_join",
    "minmax_agg", "percentiles", "percentile_approx", "q13_order_distribution",
    "correlated_subquery", "exists_semi_subquery", "in_subquery_large_orders",
    "not_exists_anti_subquery", "string_agg_ordered", "unpivot_part_metrics",
    "posexplode_terms", "fuzzy_levenshtein_pairs", "pandas_udf_quality",
    "grouped_applyinpandas_scale", "allowlist_projection",
    "identifier_normalization", "json_envelope", "error_truncation",
    "multimodal_media_metadata", "multimodal_frame_sample",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _SWEEP_PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(plans.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query; approximate or
    non-SQL-expressible ops (approx_count_distinct, ann_lsh_topk) are omitted
    and get the driver's rows-only check."""
    return _ordered(dict(plans.ORACLES))
