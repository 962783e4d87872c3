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
# and has a finite per-round budget (round 1 reached entry 50 of 83, leaving
# 33 with no correctness signal -- VERDICT.md "What's missing" #1). Order of
# evidence value: first the 9 queries that erred on the round-1 nanos bug
# (their flip to green is the headline fix), then the 33 with no round-1
# signal, then this round's new queries, then the long-green rest. Every
# entry is still registered regardless of budget.
_SWEEP_PRIORITY = [
    # erred in round 1 (events.parquet nanos, fixed in catalog.load_table):
    # record the flip
    "asof_join_prior_purchase", "asof_join_cogroup_pandas",
    "from_json_roundtrip", "retry_classification", "retry_backoff",
    "cdc_latest_state", "json_extract", "purge_retention",
    "changefeed_watermark",
    # no correctness row in CORRECTNESS_r01.json
    "join_full_outer", "theta_range_join", "set_union", "set_intersect",
    "set_except", "pivot_status", "range_batching", "scalar_string_funcs",
    "timestamp_arithmetic", "q5_local_supplier_volume",
    "q7_nation_volume_shipping", "q10_returned_items", "monthly_order_trend",
    "train_val_split", "quota_per_source", "ann_cosine_topk", "ann_lsh_topk",
    "ann_ivf_topk", "embedding_norms", "embedding_centroids",
    "text_token_stats", "text_bpe_token_count", "text_quality_score",
    "text_lang_id", "text_fingerprint", "term_frequencies",
    "window_running_sum", "window_lag_lead", "window_rank", "topk_per_group",
    "sessionization", "time_window_tumbling", "time_window_sliding",
    # new this round (no correctness row can exist yet)
    "text_pii_scrub", "text_repetition", "contamination_check",
    "tfidf_top_terms", "scd2_history", "corpus_shards",
    "interval_join_events", "cdc_merge_upsert", "argmax_per_group",
    "null_safe_join", "window_time_range_avg", "funnel_analysis",
    "map_agg_event_counts", "histogram_value_buckets", "profile_events_table",
    "multimodal_chunk_energy", "interval_join_left_events",
    "event_transition_matrix", "retention_cohorts",
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
