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
# and has a finite per-round budget (~50/round). Round-4 order (VERDICT r03
# "Next round" #1): first the queries that are new or whose code/oracle
# changed this round (no valid prior evidence), then the 33 queries whose
# only green row is round 1 (the stale-evidence rotation the judge asked
# for), then the round-2-only tail, freshest last. Every entry is still
# registered regardless of budget.
_SWEEP_PRIORITY = [
    # new round-4 queries (completing the TPC-H suite + the streaming
    # exactly-once parity entry; no evidence yet)
    "q2_min_cost_supplier", "q11_important_stock",
    "q18_large_volume_customer", "q20_potential_promotion",
    "streaming_windowed_counts",
    # newly oracle-checked (was rows-only) + changed-this-round re-verify:
    # the shared dedup stage rebuild, the q15 decimal-compare oracle, and
    # the IVF assign/probe split
    "ann_ivf_recall_sweep", "ann_lsh_topk", "ann_ivf_topk",
    "dedup_minhash_lsh", "minhash_jaccard_estimate",
    "dedup_ngram_jaccard", "dedup_components", "q15_top_supplier",
    "ann_cosine_topk",
    # rotation re-verification: the 33 queries green only on round-1
    # evidence (CORRECTNESS_r01.json), heaviest families first
    "dedup_simhash", "dedup_exact", "q1_pricing_summary",
    "q3_shipping_priority", "percentiles", "q13_order_distribution",
    "agg_rollup", "agg_cube", "agg_grouping_sets", "count_distinct",
    "join_broadcast_star", "join_left_outer", "join_semi",
    "between_filter", "top_limit", "cte_update_join", "minmax_agg",
    "correlated_subquery", "exists_semi_subquery", "in_subquery_large_orders",
    "not_exists_anti_subquery", "string_agg_ordered", "unpivot_part_metrics",
    "posexplode_terms", "fuzzy_levenshtein_pairs", "pandas_udf_quality",
    "grouped_applyinpandas_scale", "allowlist_projection",
    "identifier_normalization", "json_envelope", "error_truncation",
    "multimodal_media_metadata", "multimodal_frame_sample",
    # round-2-only tail (budget permitting), heaviest first
    "tfidf_top_terms", "contamination_check", "text_repetition",
    "sessionization", "q5_local_supplier_volume",
    "q7_nation_volume_shipping", "q10_returned_items", "scd2_history",
    "cdc_merge_upsert", "changefeed_watermark", "asof_join_prior_purchase",
    "asof_join_cogroup_pandas", "theta_range_join", "text_bpe_token_count",
    "text_quality_score", "text_lang_id", "text_fingerprint",
    "term_frequencies", "text_pii_scrub", "text_token_stats",
    "json_extract", "from_json_roundtrip", "retry_classification",
    "retry_backoff", "cdc_latest_state", "purge_retention",
    "join_full_outer", "set_union", "set_intersect", "pivot_status",
    "range_batching", "scalar_string_funcs", "timestamp_arithmetic",
    "monthly_order_trend", "train_val_split", "quota_per_source",
    "corpus_shards", "embedding_norms", "window_running_sum",
    "window_lag_lead", "window_rank", "topk_per_group",
    "time_window_tumbling", "time_window_sliding", "interval_join_events",
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
