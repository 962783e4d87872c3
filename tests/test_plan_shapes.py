"""Plan-shape regressions: the properties that make these queries viable at
100 TB (pushdown, broadcast, top-k, no cartesian products) asserted against
the optimized physical plan -- so a refactor that silently loses them fails
CI even though results stay correct."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def plan_of(spark, sf_dir, name: str) -> str:
    df = entrymod.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filters_push_into_parquet_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "between_filter")
    assert "PushedFilters: [" in plan
    assert "IsNotNull(o_totalprice)" in plan or "GreaterThanOrEqual(o_orderkey" in plan


def test_projection_prunes_read_schema(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "allowlist_projection")
    # ReadSchema must carry only the three allowlisted columns
    read = [line for line in plan.splitlines() if "ReadSchema" in line][0]
    assert "o_orderkey" in read and "o_totalprice" not in read


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_broadcast_star")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_top_limit_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "top_limit")
    assert "TakeOrderedAndProject" in plan
    # no global sort materialization
    assert "Sort [o_totalprice" not in plan


def test_range_join_stays_equi_not_cartesian(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "theta_range_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semi_anti_joins_planned_as_such(spark, sf_dir):
    assert "LeftSemi" in plan_of(spark, sf_dir, "join_semi")
    assert "LeftAnti" in plan_of(spark, sf_dir, "join_anti")


def test_q1_is_partial_final_hash_aggregate(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert "HashAggregate" in plan
    # partial+final pair => map-side combine before the exchange
    assert plan.count("HashAggregate") >= 2


def test_lsh_candidates_avoid_cross_join(spark, sf_dir):
    # build from the operator internals: the registered query localCheckpoints
    # its (small) result to release the shingle cache, which hides the
    # interesting plan behind an RDD scan
    from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
    from sqldataintegrationfunctiontriggerapp_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    shingled = D.word_shingles(docs)
    cands = D.lsh_candidate_pairs(D.minhash_signatures(shingled))
    plan = D.verify_jaccard(cands, shingled, 0.7)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_cosine_dedup_never_cartesian(spark, sf_dir):
    """VERDICT r02 #7: the registered embedding near-dup query must never
    plan a CartesianProduct. At fixture scale the auto dispatcher correctly
    picks the broadcast pair join (a BroadcastNestedLoopJoin over a corpus
    that fits in one broadcast -- the fast small-side strategy, same logic
    as Spark's own broadcast threshold), so only Cartesian is banned here;
    the large-corpus branch is pinned by the test below."""
    plan = plan_of(spark, sf_dir, "dedup_embedding_cosine")
    assert "CartesianProduct" not in plan


def test_embedding_cosine_scale_path_is_bucketed_equi_join(spark, sf_dir):
    """The large-corpus branch (forced) must stay the pivot-partitioned
    angular EQUI-join: no CartesianProduct, no full-corpus broadcast. The
    only broadcast allowed is the K^2 cluster-admissibility grid (metadata,
    not data) -- so future constant tuning can't silently reintroduce the
    O(n^2) path."""
    from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
    from sqldataintegrationfunctiontriggerapp_spark.operators import (
        similarity as S,
    )

    e = load_table(spark, sf_dir, "embeddings")
    df = S.cosine_pairs_above_bucketed(e, 0.4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_probes_at_most_n_probe_lists(spark, sf_dir):
    """ann_ivf_topk must touch only n_probe inverted lists per query: every
    returned neighbor's list must be one of the query's n_probe nearest
    lists, recomputed independently here from the same deterministic
    md5-ordered pivot rule -- the contract that makes IVF a scan reduction,
    not a rename of brute force (VERDICT r02 #7)."""
    import hashlib

    from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
    from sqldataintegrationfunctiontriggerapp_spark.operators import (
        similarity as S,
    )
    from pyspark.sql import functions as F

    n_lists, n_probe = 16, 4
    e = load_table(spark, sf_dir, "embeddings")
    out = S.ivf_topk(e, e.where(F.col("vec_id") < 5), k=5,
                     n_lists=n_lists, n_probe=n_probe)

    rows = e.select("vec_id", "embedding").collect()
    vecs = {int(r.vec_id): [float(x) for x in r.embedding] for r in rows}
    pivot_ids = sorted(
        vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:n_lists]
    pivots = [vecs[i] for i in pivot_ids]

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    def nearest_lists(v, n):
        return [
            i for _, i in sorted((d2(v, p), i) for i, p in enumerate(pivots))
        ][:n]

    corpus_list = {vid: nearest_lists(v, 1)[0] for vid, v in vecs.items()}
    for r in out.collect():
        probed = set(nearest_lists(vecs[int(r.query_id)], n_probe))
        assert corpus_list[int(r.neighbor_id)] in probed, (
            f"query {r.query_id} returned neighbor {r.neighbor_id} from an"
            f" unprobed list"
        )


@pytest.mark.parametrize("name", [
    "scd2_history", "corpus_shards", "stratified_sample",
    "pack_documents_greedy", "event_value_ntiles", "orders_pareto_share",
    "sliding_dedup_window",
])
def test_window_queries_never_single_partition(spark, sf_dir, name):
    """Every windowed query must window over a real partition key -- a
    global row_number/lead/running-sum would serialize 100 TB through one
    task."""
    plan = plan_of(spark, sf_dir, name)
    assert "Window" in plan
    assert "SinglePartition" not in plan


@pytest.mark.parametrize("name", ["q3_shipping_priority", "cdc_latest_state"])
def test_whole_stage_codegen_present(spark, sf_dir, name):
    # AQE shows codegen spans only in the final (post-execution) plan
    df = entrymod.queries()[name](spark, sf_dir)
    df.collect()  # finalize THIS queryExecution's adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes are the WholeStageCodegen markers in compact plan text
    assert "*(" in plan


def test_exists_subquery_is_semi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "exists_semi_subquery")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_not_exists_is_anti_join_with_pushed_filter(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "not_exists_anti_subquery")
    assert "LeftAnti" in plan
    # the urgent-orders filter must reach the scan below the anti join,
    # not run as a post-join filter over the whole orders table
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan


def test_in_subquery_is_semi_join_no_distinct_blowup(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "in_subquery_large_orders")
    assert "LeftSemi" in plan


def test_q5_broadcasts_dimension_chain(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q5_local_supplier_volume")
    # region->nation->supplier chain rides broadcasts; the only shuffle
    # joins are the order/customer/lineitem fact joins
    assert plan.count("BroadcastHashJoin") >= 3


def test_q4_exists_is_semi_join_with_pushed_quarter(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q4_order_priority")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    # the quarter predicate must reach the orders scan below the semi join
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q8_single_fact_shuffle_all_dims_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q8_market_share")
    # lineitem-orders is the one shuffle join; customer/nation/region/
    # supplier all ride broadcasts
    assert plan.count("BroadcastHashJoin") >= 3
    n_shuffle_joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert n_shuffle_joins <= 1, plan


def test_q19_disjunction_joins_broadcast_not_cartesian(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q19_disjunctive_revenue")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_q22_anti_join_with_prefiltered_build(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q22_idle_customers")
    assert "LeftAnti" in plan
    # the recent-orders date filter sits on the orders scan under the anti
    # join, not above it
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_span_dedup_is_postings_join_not_pairwise(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "span_dedup_rate")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q21_decorrelated_no_cartesian(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q21_waiting_supplier")
    # the double-EXISTS must decorrelate to equi-joins + aggregate,
    # never a correlated re-scan or cartesian fallback
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan


def test_q12_single_fact_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q12_priority_lines")
    n_shuffle_joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    n_joins = n_shuffle_joins + plan.count("BroadcastHashJoin")
    assert n_joins == 1, plan


def test_source_overlap_is_postings_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "source_overlap_matrix")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_minhash_stage_pipeline_is_equi_joins_only(spark, sf_dir):
    """VERDICT r03 #5: the registered dedup_minhash_lsh /
    minhash_jaccard_estimate queries serve filters/joins over the shared
    localCheckpointed stage (plans/dedup.py _minhash_stage), which hides the
    interesting joins behind RDD scans -- so pin the shape of the exact
    pipeline the stage materializes: signatures -> candidate self-join ->
    exact-Jaccard verify must plan as hash equi-joins, never a cartesian or
    broadcast nested loop."""
    from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
    from sqldataintegrationfunctiontriggerapp_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    shingled = D.word_shingles(docs, n=3)
    sigs = D.minhash_signatures(shingled, n_bands=8)
    cands = D.lsh_candidate_pairs(sigs)
    jacc0 = D.verify_jaccard(cands, shingled, threshold=0.0)
    plan = _physical(jacc0)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_estimate_band_agreement_is_equi_join(spark, sf_dir):
    """The estimate's extra stage -- candidate pairs joined back to both
    docs' band signatures -- must key on (doc, band), not degenerate into a
    pairwise comparison."""
    from pyspark.sql import functions as F

    from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
    from sqldataintegrationfunctiontriggerapp_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(D.word_shingles(docs, n=3), n_bands=8)
    cands = D.lsh_candidate_pairs(sigs)
    sa = sigs.select(F.col("doc_id").alias("doc_a"), "band",
                     F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), "band",
                     F.col("sig").alias("sig_b"))
    agree = (
        cands.join(sa, "doc_a")
        .join(sb, ["doc_b", "band"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.when(F.col("sig_a") == F.col("sig_b"), 1).otherwise(0))
             .cast("int").alias("n_bands_agree"))
    )
    plan = _physical(agree)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the band-agreement aggregate must combine map-side (partial+final)
    assert plan.count("HashAggregate") >= 2


def test_q2_broadcasts_dims_and_takes_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q2_min_cost_supplier")
    # region/nation/supplier chain and the filtered part dim all broadcast;
    # the only shuffle joins are the fact-derived cost-vs-min join
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    # top-100 by acctbal is TakeOrderedAndProject, never a global sort
    assert "TakeOrderedAndProject" in plan


def test_q18_single_fact_shuffle_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q18_large_volume_customer")
    assert "TakeOrderedAndProject" in plan
    # customer broadcasts; lineitem is aggregated then joined -- the fact
    # table must not be scanned twice
    assert plan.count("FileScan parquet") <= 3  # lineitem, orders, customer
    assert "CartesianProduct" not in plan


def test_q20_having_agg_then_semi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q20_potential_promotion")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_approx_count_distinct_sketch_not_keyed_per_value(spark, sf_dir):
    # Regression: countDistinct + approx_count_distinct in ONE agg makes the
    # distinct-rewrite compute partial HLL sketches keyed by
    # (l_returnflag, l_orderkey) -- one ~10KB rsd=0.01 buffer PER DISTINCT
    # ORDERKEY, which OOMed at sf0.1. The fixed shape dedupes first, so the
    # only aggregate that evaluates the HLL function must be keyed by the
    # flag alone.
    plan = plan_of(spark, sf_dir, "approx_count_distinct")
    # plan_of returns the TREE-format string: each HashAggregate line
    # carries its grouping inline as `keys=[...], functions=[...]`. The agg
    # node evaluating the partial HLL must be keyed by the flag alone --
    # l_orderkey in its keys is exactly the per-distinct-value buffer
    # explosion. (Verified to FAIL against the old single-agg shape, whose
    # line reads `HashAggregate(keys=[l_returnflag, l_orderkey],
    # functions=[partial_approx_count_distinct(...)])`.)
    hll_lines = [
        ln for ln in plan.splitlines()
        if "partial_approx_count_distinct" in ln and "keys=[" in ln
    ]
    assert hll_lines, "HLL partial aggregate missing from plan"
    for ln in hll_lines:
        keys = ln.split("keys=[", 1)[1].split("]", 1)[0]
        assert "l_orderkey" not in keys, ln.strip()


def test_dq_constraint_report_single_scan_no_joins(spark, sf_dir):
    # all six constraints fold into ONE pass: a second scan or a join per
    # constraint is the anti-pattern this query's docstring rules out
    plan = plan_of(spark, sf_dir, "dq_constraint_report")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "stack(6" in plan  # the 1-row unpivot to the report shape


def test_kmeans_final_assignment_is_pure_map(spark, sf_dir):
    # the returned assignment must be a map over broadcast centroid
    # literals: no shuffle, no join -- the property that makes the
    # per-iteration cost one scan at 100 TB (the iteration's mean-update
    # jobs have already executed by the time this plan exists)
    plan = plan_of(spark, sf_dir, "kmeans_clusters")
    assert plan.count("Scan parquet") == 1
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_cms_heavy_hitters_single_scan_broadcast_probe(spark, sf_dir):
    """CMS must stay one token scan (the sketch build and the estimate
    probe both consume the vocabulary exchange -- ReusedExchange), the
    <=768-cell sketch must come back as a broadcast (never a shuffled join
    against the vocabulary), and the top-20 must be TakeOrdered, not a
    global sort."""
    # exchange reuse is an AQE decision -- it only appears in the FINAL
    # adaptive plan, so execute first and assert on isFinalPlan=true
    df = entrymod.queries()["cms_heavy_hitters"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # the adaptive plan string appends the pre-execution "Initial Plan"
    # section, which legitimately shows the un-reused second scan -- the
    # invariant is on the FINAL plan, so cut there before counting
    plan = plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in plan
    assert plan.count("Scan parquet") == 1
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_bloom_probe_fact_side_is_shuffle_free_map(spark, sf_dir):
    """The bloom probe's value at 100 TB is the asymmetry: the bitmap ships
    to the fact table, never the reverse. The orders side must therefore be
    scan -> expression probe -> broadcast membership join -> partial agg
    with NO exchange before the final (3-group) aggregate, and the member
    dim must arrive as a BroadcastHashJoin, never a SortMergeJoin."""
    plan = plan_of(spark, sf_dir, "bloom_filter_probe")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # exactly one shuffle in the whole plan: the final tiny groupBy (the
    # build-side bitmap aggregate ran to completion inside the query
    # constructor's bounded collect and is not part of this plan; the
    # member dim arrives as a BroadcastExchange, which is not a shuffle)
    assert plan.count("Exchange hashpartitioning") == 1


def test_quantile_sketch_shuffles_only_bounded_metadata(spark, sf_dir):
    """quantile_sketch_merge's 100 TB claim: after the single fact scan,
    every exchange carries bounded metadata -- per-(pid,bucket) cells
    (<= partitions x 128 rows), per-pid sketch arrays (<= partitions rows),
    and 1-row bounds. Pin the shape: one allowlisted 1-row BNLJ for the
    domain bounds, map-side partial aggregation before both hash
    exchanges, the posexplode read-off, and no extra exchange after the
    single-partition merge (the 128-row window runs where the merge
    landed)."""
    plan = plan_of(spark, sf_dir, "quantile_sketch_merge")
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "Generate posexplode" in plan
    # partial aggregation precedes the (pid, idx) exchange: the sketch is
    # built map-side, the shuffle ships cells not rows
    assert "partial_count" in plan
    assert plan.count("Exchange hashpartitioning(pid") == 2
    # merge is one single-partition exchange; the window and final agg
    # reuse it (no exchange between Window and the merge aggregate). Match
    # on the broad "Aggregate" token so a Spark-version rename
    # (ObjectHashAggregate vs HashAggregate vs SortAggregate) fails the
    # presence assertion readably instead of raising ValueError from index()
    assert "Window " in plan
    window_at = plan.index("Window ")
    assert "Aggregate" in plan[window_at:], plan[window_at:]
    agg_at = plan.index("Aggregate", window_at)
    assert "Exchange" not in plan[window_at:agg_at]


def test_salted_agg_is_two_phase_with_map_side_combine(spark, sf_dir):
    """skew_salted_agg's whole point is the two-phase shape: a (key, salt)
    exchange where the hot key spreads over n_salt reducers, then a key-only
    exchange over the <= keys x n_salt partials. Pin both exchanges (and
    only those two), and pin map-side partial aggregation before each --
    without the partials the salting just renames the straggler."""
    plan = plan_of(spark, sf_dir, "skew_salted_agg")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "_salt" in plan.split("Exchange hashpartitioning")[1]
    # key-only second exchange: the partial-combine phase ends at the key
    assert "partial" in plan  # map-side combine in both phases
    assert "CartesianProduct" not in plan


def test_salted_join_spreads_on_key_and_salt(spark, sf_dir):
    """skew_salted_join must join on (key, salt) -- if the salt column falls
    out of the join keys the explode-replication was pure overhead and the
    hot key still lands on one reducer. The replicated dimension side stays
    an explode (Generate), never a cartesian."""
    plan = plan_of(spark, sf_dir, "skew_salted_join")
    assert "Generate explode" in plan
    assert "_salt" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_colocated_join_is_shuffle_free(spark, sf_dir):
    """join_bucketed_colocated's whole claim: the bucket layout satisfies
    the sort-merge join's distribution requirement, so NEITHER side
    exchanges -- the only Exchange in the plan is the final <=5-group
    aggregate. Losing this (bucket-count drift, a lost sortBy, bucketing
    disabled) silently reintroduces the 100 TB fact shuffle."""
    plan = plan_of(spark, sf_dir, "join_bucketed_colocated")
    assert "SortMergeJoin" in plan
    join_at = plan.index("SortMergeJoin")
    # nothing below the join exchanges: both inputs come straight off the
    # bucketed scans
    assert "Exchange hashpartitioning" not in plan[join_at:]
    # exactly one exchange anywhere -- the partial/final aggregate above
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SelectedBucketsCount" in plan  # both scans read bucket layout


def test_bm25_is_postings_join_never_pairwise(spark, sf_dir):
    # the query-term fan-out must be term-keyed equi-joins over the
    # inverted index; the only nested-loop is the 1-row stats broadcast.
    # Linted on the BUILDER's lazy plan: the registered entries consume the
    # session-staged checkpoint of this subtree (OPTIMIZATION r16), so the
    # postings-join shape lives in the build, not the consumer plans.
    from sqldataintegrationfunctiontriggerapp_spark.plans.retrieval import (
        _bm25_scored_plan,
    )

    df = _bm25_scored_plan(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    # explode-descended sides are merge-hinted (size-estimate poisoning)
    assert "SortMergeJoin" in plan


def test_frequent_pairs_self_join_is_doc_keyed(spark, sf_dir):
    # A-priori candidate generation: the basket self-join must stay an
    # equi-join on doc_id (the t1 < t2 triangle filter rides post-join).
    # Since OPTIMIZATION r16 the L1 subtree (with its 1-row corpus-size
    # nested-loop) is truthful-checkpointed once, so the registered plan
    # is the self-join + aggregate over the materialized L1 -- no BNLJ
    # remains in the consumer plan.
    plan = plan_of(spark, sf_dir, "frequent_term_pairs")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 0


def test_crossdoc_span_runs_is_postings_join(spark, sf_dir):
    # substring-level dedup must be the positional-postings equi-join +
    # diagonal-window shape, never pairwise document comparison
    plan = plan_of(spark, sf_dir, "crossdoc_span_runs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan  # merge-hinted explode-descended sides
    assert "Window" in plan


def test_hll_shard_merge_dedupes_before_sketching(spark, sf_dir):
    # the distinct-rewrite trap (see approx_count_distinct): sketch
    # buffers must exist once per shard, never once per (shard, user) --
    # deduping first means no Expand/per-value partial sketch stage
    plan = plan_of(spark, sf_dir, "hll_shard_merge")
    assert "Expand" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_pq_encoding_is_scan_speed_map(spark, sf_dir):
    # PQ codes must be a pure map (m argmin expressions over codebook
    # literals): no shuffle, no join anywhere in the encode plan
    from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
    from sqldataintegrationfunctiontriggerapp_spark.operators import (
        similarity as S,
    )

    e = load_table(spark, sf_dir, "embeddings")
    books = S.pq_fit(e, m=4, k=16, iters=2, dim=64)
    plan = S.pq_codes(e, books)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_ivfpq_is_list_pruned_equi_join(spark, sf_dir):
    # IVF+PQ must join the probe frame onto the code table by list_id --
    # an equi-join, never the flat ADC scan's nested loop; scoring reads
    # codes, so no full-vector corpus column survives into the join
    plan = plan_of(spark, sf_dir, "ann_ivfpq_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin [list_id" in plan


def test_partitioned_scan_prunes_statically(spark, sf_dir):
    """partition_pruned_revenue's claim: the month predicate resolves
    against hive directory names at planning time. The scan node must
    carry non-empty PartitionFilters on ship_month (and the data filter
    list stays empty -- there is nothing to evaluate per row)."""
    plan = plan_of(spark, sf_dir, "partition_pruned_revenue")
    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan_lines, plan
    ln = scan_lines[0]
    filters = ln.split("PartitionFilters: [", 1)[1]
    assert "ship_month" in filters.split("]")[0], ln
    assert "PartitionFilters: []" not in ln


def test_dpp_join_prunes_partitions_dynamically(spark, sf_dir):
    """dpp_quarter_revenue: no static month filter exists, so the
    partitioned scan must carry a dynamicpruningexpression fed by the
    broadcast calendar dim -- losing this silently reads all ~84 months
    and filters after the join."""
    plan = plan_of(spark, sf_dir, "dpp_quarter_revenue")
    assert "dynamicpruningexpression" in plan, plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_span_removal_is_postings_join_and_doc_keyed(spark, sf_dir):
    # the remove half must inherit the detect half's shape: positional
    # postings equi-join, never pairwise; the coverage join and the
    # rebuild aggregate stay doc-keyed
    plan = plan_of(spark, sf_dir, "crossdoc_span_removal")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate" in plan  # token/sequence explodes


def test_minhash_shard_merge_is_two_level_aggregate(spark, sf_dir):
    # the merge under test IS the plan shape: per-shard wide partials,
    # then the global fold -- no joins other than the final 16-row
    # salt equi-join, no nested loop
    plan = plan_of(spark, sf_dir, "minhash_shard_merge")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # map-side partial aggregation before every exchange (the merge under
    # test IS this combine); Spark plans the wide string-min aggregates as
    # SortAggregate, so match the partial marker, not the agg impl
    assert "partial_min(md5(" in plan
    # two-level tree on the sharded side: per-shard partials, global fold
    assert plan.count("partial_min(h0") >= 1


def test_quality_classifier_is_scan_and_single_aggregate(spark, sf_dir):
    # scan-speed scorer: explode + literal lookup + one doc-keyed hash
    # aggregate; no joins at all
    plan = plan_of(spark, sf_dir, "quality_classifier_linear")
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1
