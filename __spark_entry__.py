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
# and has a finite per-round budget (~50/round). Round-5 order (VERDICT r04
# "Next round" #1): first the queries that are new or whose code/oracle
# changed this round (no valid prior evidence), then the 42 queries whose
# latest green row is round 2 (the stale-evidence rotation: no query's
# evidence should age past two rounds), then the round-3 tail. The
# round-4-evidenced queries (freshest) follow in registry order. Every
# entry is still registered regardless of budget.
_SWEEP_PRIORITY = [
    # new/changed this round (no valid prior evidence -- changed code
    # ALWAYS jumps to the head, per the r4 verdict's rotation rule): the
    # four streaming parity queries (throttle and entity-stats parity are
    # NEW, and all four share the rebuilt TIME-SPLIT staging), the
    # feature-extract query upgraded from rows-only to an exact oracle,
    # the NEW CMS heavy-hitters sketch, the DQ gate, k-means, the two
    # sketch queries upgraded to accuracy-contract oracles, and the dedup
    # family rebuilt on the shared shingle stage
    "streaming_throttle_parity", "streaming_entity_stats_parity",
    "streaming_dedup_parity", "streaming_windowed_counts",
    "multimodal_feature_extract", "cms_heavy_hitters",
    "bloom_filter_probe",
    "dq_constraint_report", "kmeans_clusters",
    "approx_count_distinct", "percentile_approx",
    "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "minhash_jaccard_estimate", "dedup_components",
    # rotation re-verification: the 42 queries whose latest green evidence
    # is round 2 (VERDICT r04 "What's missing" #1), heaviest families
    # first. 15 changed/new + 42 stale = 57 candidates for a hard 50-entry
    # budget; changed code outranks stale-but-unchanged code, so the seven
    # overflow slots (51-57) go to the stale queries with the freshest
    # indirect evidence: time_window_tumbling (its oracle SQL is byte-for-
    # byte the oracle streaming_windowed_counts re-verifies in the head),
    # window_rank (pure rank/dense_rank/ntile window, plan-shape pinned,
    # untouched since r02), window_lag_lead (same single-window-shuffle
    # family as window_running_sum, which stays in the head), set_intersect
    # (sibling of set_union two lines up in the same file, re-verified in
    # the head this round), scalar_string_funcs, embedding_norms, and
    # timestamp_arithmetic (all stateless single-scan projections, zero
    # shuffles, the lowest-risk shape in the registry). Their direct rows
    # go one round staler; next round's rotation leads with them.
    "sessionization", "q5_local_supplier_volume",
    "q7_nation_volume_shipping", "q10_returned_items", "scd2_history",
    "cdc_merge_upsert", "changefeed_watermark", "asof_join_prior_purchase",
    "asof_join_cogroup_pandas", "theta_range_join", "text_bpe_token_count",
    "text_quality_score", "text_lang_id", "text_fingerprint",
    "term_frequencies", "text_pii_scrub", "text_token_stats",
    "json_extract", "from_json_roundtrip", "retry_classification",
    "retry_backoff", "cdc_latest_state", "purge_retention",
    "join_full_outer", "set_union", "pivot_status",
    "range_batching",
    "monthly_order_trend", "train_val_split", "quota_per_source",
    "corpus_shards", "window_running_sum",
    "topk_per_group",
    "time_window_sliding", "interval_join_events",
    # positions 51-57: the seven overflow stale entries (see block comment)
    "time_window_tumbling", "window_rank", "window_lag_lead",
    "set_intersect", "scalar_string_funcs", "embedding_norms",
    "timestamp_arithmetic",
    # round-3-evidenced tail (budget permitting), registry families
    # grouped; the round-4-evidenced queries (freshest, e.g.
    # tfidf_top_terms, contamination_check, text_repetition) follow in
    # registry order after this list
    "dedup_embedding_cosine", "dedup_duplicate_rate", "multimodal_chunk_energy",
    "q4_order_priority", "q6_forecast_revenue", "q8_market_share",
    "q9_product_profit", "q12_priority_lines", "q14_promo_revenue",
    "q16_part_supplier_variety", "q17_small_quantity_revenue",
    "q19_disjunctive_revenue", "q21_waiting_supplier", "q22_idle_customers",
    "argmax_per_group", "bursty_users", "daily_active_users",
    "doc_chunk_spans", "doc_length_histogram", "embedding_centroids",
    "embedding_quantize_error", "event_transition_matrix",
    "event_value_ntiles", "funnel_analysis", "gap_fill_daily_counts",
    "histogram_value_buckets", "interval_join_left_events", "join_anti",
    "map_agg_event_counts", "mixture_sampling_weights", "null_safe_join",
    "orders_pareto_share", "pack_documents_greedy", "profile_events_table",
    "quantile_bands_per_type", "retention_cohorts", "robust_outliers_mad",
    "set_except", "sliding_dedup_window", "source_overlap_matrix",
    "span_dedup_rate", "stratified_sample", "window_percent_rank",
    "window_time_range_avg",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _SWEEP_PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(plans.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY registered query -- zero rows-only
    entries. The deterministic-approximate ANN queries, the sketch
    accuracy-contract queries, the four streaming parity queries (batch
    oracles the engine's multi-batch replay must hash-equal), and the
    byte-deterministic multimodal feature stub (mirrored through ascii()
    on the pure-ASCII fixture) all carry exact oracles."""
    return _ordered(dict(plans.ORACLES))
