"""Repo-wide physical-plan lint over EVERY registered query.

Per-query plan-shape tests (test_plan_shapes.py) pin specific invariants;
this lint enforces the global 100 TB anti-pattern rules across the whole
registry, so a NEW query can't ship with a cartesian product, an
unjustified nested-loop join, or a row-at-a-time Python UDF without either
fixing it or justifying an allowlist entry here.

Plans are built (analyzed + physically planned), never executed -- except
that the shared-stage families (dedup minhash/ngram, IVF) eagerly
materialize their session-scoped localCheckpoint stage at construction
time, which is cheap at sf0.001.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

# Deliberate BroadcastNestedLoopJoin sites. Two legitimate classes:
#   1-row: a crossJoin against a single-row aggregate (scalar normalizer /
#          denominator) -- the broadcast side is one row, so the "nested
#          loop" is a constant-time append of literals at any scale.
#   gated: a cost-based dispatcher that only takes the broadcast
#          brute-force branch below a row threshold; the scale path is a
#          bucketed equi-join (operators/similarity.py).
_BNLJ_ALLOWED = {
    # dedup_embedding_cosine left this list in r08: its small/medium branch
    # is now the BLAS mapInPandas kernel (no join at all), so no BNLJ plans
    "ann_cosine_topk":           "gated: exact baseline, query set broadcast",
    "q11_important_stock":       "1-row: nation-total denominator",
    "q22_idle_customers":        "1-row: scalar average threshold",
    "not_exists_anti_subquery":  "1-row: scalar average threshold",
    "ann_ivf_recall_sweep":      "1-row: exact-hit-count denominator",
    "mixture_sampling_weights":  "1-row: weight normalizer",
    "gap_fill_daily_counts":     "1-row: date-spine min/max bounds",
    "daily_active_users":        "1-row: date-spine min/max bounds",
    "quantile_sketch_merge":     "1-row: histogram domain bounds (lo/hi)",
    "quantile_interpolated":     "1-row: histogram domain bounds (lo/hi)",
    "quantile_sketch_refined":   "1-row bounds + 3-row per-quantile params",
    "lm_bigram_score":           "1-row: vocabulary-size Laplace denominator",
    "zorder_layout":             "1-row: global min/max quantization bounds",
    "bpe_vocab_induction":       "1-row x5: per-round argmax merge pair",
    "bpe_apply_segmentation":    "1-row x5: per-round argmax merge pair",
    # bm25_topk's 1-row stats BNLJ moved into the session-staged
    # _bm25_scored build (OPTIMIZATION r16) -- the registered plan is a
    # window over the checkpointed scored table, so no BNLJ remains;
    # the build shape is pinned by test_bm25_is_postings_join_never_pairwise
    # frequent_term_pairs/_triples: the 1-row corpus-size BNLJ moved into
    # the truthful-checkpointed L1 build (OPTIMIZATION r16) -- the
    # registered plans are self-joins over the materialized L1, no BNLJ
    "hll_shard_merge":           "1-row: global-vs-merged estimate combine",
    "ann_pq_adc_topk":           "gated: ADC scan, fixed query set broadcast",
    "ann_pq_recall":             "gated: ADC + exact scans, query set broadcast",
    "ann_pq_dim_alloc_recall":   "gated: two ADC + one exact scan, query set broadcast",
    "contrastive_triplets":      "gated: exact scan, fixed query set broadcast",
    "vocab_coverage_cutoff":     "1-row: total token-mass denominator",
    "kmv_distinct_union":        "1-row x2: global/merged estimate combine",
    "kmv_jaccard_sources":       "gated: src<src pair enumeration over the bounded source list (sketch legs are equi-joins)",
    "gdpr_forget_propagation":   "1-row: per-table purge/retain count combine",
    "hybrid_rrf_fusion":         "gated: dense-branch query panel broadcast (blas kernel above 64 queries)",
    "group_kfold_components":    "1-row: straddling-pair audit count combine",
    "dedup_threshold_sweep":     "4-row: threshold frame broadcast over the materialized pair table",
    # ann_routed_topk's exact branch is the blas mapInPandas kernel since
    # OPTIMIZATION r16 (the regime the router's cost table models) -- no
    # BNLJ plans; the ivf branch consumes the checkpointed pair stage
}


# Queries whose fn() EXECUTES a pipeline rather than building a lazy plan.
# streaming_windowed_counts runs the streaming engine to completion and
# returns a memory-sink table whose plan is a LocalTableScan -- linting it
# would be both vacuous (a memory scan can't contain joins/UDFs) and
# expensive (a full streaming run per lint). Its aggregate shape is the
# same windowed_counts plan test_streaming.py exercises.
# NOT listed but PARTIALLY executing on build (ADVICE r05 #2):
# bloom_filter_probe runs its bitmap-build aggregate (one Spark job,
# bounded <=8 KB collect) inside the query constructor; the returned probe
# plan is still lazy and worth linting, so it stays in the build pass --
# plan-only consumers of the registry just pay that one small job.
_EXECUTES_ON_BUILD = {
    "streaming_windowed_counts",
    "streaming_sessions_parity",
    "streaming_dedup_parity",
    "streaming_throttle_parity",
    "streaming_entity_stats_parity",
    "streaming_pipeline_parity",
    "streaming_mg_parity",
    "streaming_ivm_parity",
    "streaming_ivm_retract_parity",
    "streaming_scd2_parity",
    # r10: the production BPE chain localCheckpoints best+cur per round
    # during construction (2R tiny eager jobs); the returned union of
    # checkpointed 1-row frames is the only lintable remainder
    "bpe_vocab_checkpointed",
    "streaming_curation_parity",
    "streaming_jsonl_ingest_parity",
    "streaming_late_data_parity",
    # r11: runs a full subprocess crash + checkpoint resume on build
    "streaming_crash_recovery_parity",
    # r11: runs the 2-batch ingestion replay + standing-index probes
    "streaming_minhash_dedup_parity",
}


def _all_built(spark, sf_dir):
    out = {}
    for name, fn in entrymod.queries().items():
        if name in _EXECUTES_ON_BUILD:
            continue
        df = fn(spark, sf_dir)
        out[name] = (
            df._jdf.queryExecution().executedPlan().toString(),
            list(df.columns),
        )
    return out


@pytest.fixture(scope="module")
def built(spark, sf_dir):
    return _all_built(spark, sf_dir)


@pytest.fixture(scope="module")
def plans(built):
    return {n: p for n, (p, _) in built.items()}


def test_oracle_columns_match_query_columns(built, sf_dir):
    # The driver's value compare sorts columns BY NAME before hashing, so a
    # Spark result named (l_returnflag, sum_qty) against an oracle emitting
    # (l_returnflag, "sum(l_quantity)") hash-mismatches even with identical
    # values. Column names are knowable at BIND time on both sides -- Spark
    # analysis above, DuckDB relation binding here -- so the whole registry
    # is checked without executing anything. The five streaming parity
    # queries (excluded from the build pass: their fn() runs the engine)
    # get this for free from their driver hash rows, which compare values
    # and hence names.
    import duckdb

    from sqldataintegrationfunctiontriggerapp_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    oracles = entrymod.oracle_sql()
    # bind each oracle ONCE (ADVICE r05 #3): DuckDB relation binding is
    # cheap but ~146 redundant binds are pure waste
    oracle_cols = {
        name: sorted(con.sql(oracles[name]).columns)
        for name, _ in built.items()
        if name in oracles
    }
    mismatches = {
        name: (sorted(cols), oracle_cols[name])
        for name, (_, cols) in built.items()
        if name in oracle_cols and sorted(cols) != oracle_cols[name]
    }
    assert mismatches == {}, mismatches


def test_no_cartesian_product_anywhere(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == [], offenders


def test_nested_loop_joins_are_allowlisted(plans):
    offenders = [
        n for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in _BNLJ_ALLOWED
    ]
    assert offenders == [], offenders


def test_no_row_at_a_time_python_udf(plans):
    # Arrow-vectorized pandas UDFs plan as ArrowEvalPython / MapInPandas /
    # FlatMapGroupsInPandas; BatchEvalPython is the 10-100x-slower
    # row-at-a-time path and must never appear
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert offenders == [], offenders


def test_allowlist_entries_still_needed(plans):
    # an allowlist row whose query no longer plans a BNLJ -- or no longer
    # exists under that name -- is stale; prune it so the list stays an
    # accurate inventory of deliberate sites
    unknown = [n for n in _BNLJ_ALLOWED if n not in plans]
    assert unknown == [], unknown
    stale = [
        n for n in _BNLJ_ALLOWED
        if "BroadcastNestedLoopJoin" not in plans[n]
    ]
    assert stale == [], stale


def _global_window_lines(plan: str) -> list[str]:
    """Physical-plan Window nodes with an EMPTY partition spec: the text
    form is `Window [exprs], [partCols], [sortOrder]` when partitioned and
    `Window [exprs], [sortOrder]` when global -- i.e. the bracket group
    right after the exprs holds ASC/DESC sort entries instead of columns."""
    out = []
    for ln in plan.splitlines():
        s = ln.strip().lstrip("+-: *")
        if not s.startswith("Window "):
            continue
        rest = s.split("], [", 1)
        if len(rest) < 2:
            continue
        nxt = rest[1].split("]", 1)[0]
        if " ASC" in nxt or " DESC" in nxt:
            out.append(s[:120])
    return out


# Global (unpartitioned) windows funnel their whole input through ONE task
# -- acceptable only when the input is provably bounded before the window.
_GLOBAL_WINDOW_ALLOWED = {
    "kmv_distinct_union":   "salted two-phase bottom-k: the global sort sees <= 64*k pruned survivors",
    "dataset_shuffle_deterministic": "position window over the already-limit(100)-bounded prefix (the corpus-scale sort is TakeOrderedAndProject)",
    "misra_gries_topk":     "final rank over <= k+1 surviving counters",
    "quantile_sketch_merge":   "cumulative count over K histogram bins",
    "quantile_sketch_refined": "cumulative count over K histogram bins",
    "quantile_interpolated":   "cumulative count over K histogram bins",
    "skyline_2d_parts":     "prefix-min over DISTINCT price points -- value-domain grain, far below corpus grain (and bounded by the currency domain), but the largest allowlisted input here",
    "vocab_coverage_cutoff":"rank + running mass over the term DICTIONARY -- vocabulary grain, not corpus grain",
}


def test_global_windows_are_allowlisted(plans):
    offenders = {
        n: _global_window_lines(p)
        for n, p in plans.items()
        if _global_window_lines(p) and n not in _GLOBAL_WINDOW_ALLOWED
    }
    assert offenders == {}, offenders


def test_global_window_allowlist_entries_still_needed(plans):
    unknown = [n for n in _GLOBAL_WINDOW_ALLOWED if n not in plans]
    assert unknown == [], unknown
    stale = [
        n for n in _GLOBAL_WINDOW_ALLOWED
        if not _global_window_lines(plans[n])
    ]
    assert stale == [], stale
