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
# and has a finite per-round budget (~50/round). Round-6 order (VERDICT r05
# "Next round" #1): first the queries that are new or whose code changed
# this round (no valid prior evidence -- changed code ALWAYS jumps to the
# head), then the 7 queries whose latest green row is round 2 (three rounds
# stale -- the rotation invariant says they lead), then the 44 round-3-
# evidenced queries. Every entry is still registered regardless of budget.
_SWEEP_PRIORITY = [
    # new/changed this round: streaming_pipeline_parity (NEW -- the
    # deployment-path foreachBatch parity), quantile_sketch_merge (NEW --
    # sixth sketch family, per-partition histogram merge), and the two
    # stateful parities whose engine path changed (now share ONE fused
    # applyInPandasWithState replay, plans/windows.py _fused_stateful_sink)
    "streaming_pipeline_parity", "quantile_sketch_merge",
    "streaming_throttle_parity", "streaming_entity_stats_parity",
    # the 7 three-round-stale entries (latest green = r02; they were the
    # documented budget-overflow of the r05 sweep and MUST clear this round)
    "time_window_tumbling", "window_rank", "window_lag_lead",
    "set_intersect", "scalar_string_funcs", "embedding_norms",
    "timestamp_arithmetic",
    # the 44 round-3-evidenced queries. 4 changed/new + 7 + 44 = 55
    # candidates for a hard 50-entry budget; changed code and three-round-
    # stale entries outrank two-round-stale ones, so the five overflow
    # slots (51-55) go to the r03 queries with the strongest sibling/
    # indirect evidence, each justified below. TPC-H tail and the heavier
    # behavioral/dedup families first:
    "q4_order_priority", "q6_forecast_revenue", "q8_market_share",
    "q9_product_profit", "q12_priority_lines", "q14_promo_revenue",
    "q16_part_supplier_variety", "q17_small_quantity_revenue",
    "q19_disjunctive_revenue", "q21_waiting_supplier", "q22_idle_customers",
    "dedup_embedding_cosine", "dedup_duplicate_rate", "multimodal_chunk_energy",
    "funnel_analysis", "retention_cohorts", "bursty_users",
    "daily_active_users", "event_transition_matrix", "event_value_ntiles",
    "argmax_per_group", "gap_fill_daily_counts", "histogram_value_buckets",
    "interval_join_left_events", "map_agg_event_counts",
    "mixture_sampling_weights", "orders_pareto_share",
    "pack_documents_greedy", "profile_events_table",
    "quantile_bands_per_type", "robust_outliers_mad", "sliding_dedup_window",
    "source_overlap_matrix", "span_dedup_rate", "stratified_sample",
    "window_time_range_avg", "doc_chunk_spans", "embedding_centroids",
    "embedding_quantize_error",
    # positions 51-55: the five overflow r03 entries. Justifications --
    # window_percent_rank: same single-window-shuffle family as window_rank
    # (position 6 this sweep, same file, untouched since r03);
    # set_except: sibling of set_intersect (this sweep's head) and
    # set_union (r05 green), registered two lines apart;
    # join_anti: single-join plan-shape sibling of join_full_outer (r05
    # green) with a plan-shape test pinning the anti join;
    # null_safe_join: stateless single equi-join on <=> , the lowest-risk
    # join shape, plan-pinned;
    # doc_length_histogram: stateless single-scan projection+groupBy,
    # zero joins, same shape as histogram_value_buckets (position ~33).
    "window_percent_rank", "set_except", "join_anti", "null_safe_join",
    "doc_length_histogram",
]
# Round-7 rotation preview: after the r06 sweep, the 45 r04-evidenced
# queries plus the 5 overflow entries above are exactly one 50-entry
# budget. Any planned refactor that touches r04-green query code (e.g. a
# shared token/vocab stage for the text family) should land in round 7,
# when those queries re-verify anyway -- doing it earlier would displace
# rotation slots for no extra evidence.


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _SWEEP_PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(plans.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY registered query -- zero rows-only
    entries. The deterministic-approximate ANN queries, the sketch
    accuracy-contract queries, the five streaming parity queries (batch
    oracles the engine's multi-batch replay must hash-equal), and the
    byte-deterministic multimodal feature stub (mirrored through ascii()
    on the pure-ASCII fixture) all carry exact oracles."""
    return _ordered(dict(plans.ORACLES))
