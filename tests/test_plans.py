"""Physical-plan assertions (the 100 TB posture, SURVEY.md §4):
correctness tests prove the answer is right; these prove the PLAN is
the one that survives a 1000-executor scale-up — filters reach the
parquet scan, projections prune columns, small dims broadcast, top-k
never materializes a full sort.
"""

from __future__ import annotations

import pytest

from batchprocessor_spark.plans.registry import load_all
from tests.conftest import SF_ORACLE

REGISTRY = load_all()


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].builder(spark, SF_ORACLE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "q_filter_pred")
    assert "PushedFilters: [" in plan
    # The conjunctive range/in predicates must be pushed, not just IsNotNull.
    assert "GreaterThanOrEqual(l_quantity" in plan or "In(l_returnflag" in plan, plan


def test_projection_prunes_columns(spark):
    plan = plan_of(spark, "q_scan_project")
    # ReadSchema must contain only the 4 projected columns.
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_quantity" in read_schema
    for dropped in ("l_shipdate", "l_returnflag", "l_tax", "l_comment"):
        assert dropped not in read_schema, read_schema


def test_small_dim_broadcasts(spark):
    plan = plan_of(spark, "q_join_inner_broadcast")
    assert "BroadcastHashJoin" in plan, plan
    # The fact side must NOT shuffle for the join itself: no Exchange
    # between the lineitem scan and the join (only the post-agg one).
    join_part = plan.split("BroadcastHashJoin")[1]
    assert "Scan parquet" in join_part


def test_sort_limit_is_take_ordered(spark):
    plan = plan_of(spark, "q_sort_limit")
    assert "TakeOrderedAndProject" in plan, plan


def test_topk_uses_window_group_limit(spark):
    plan = plan_of(spark, "q_topk_per_group")
    assert "WindowGroupLimit" in plan, plan


def test_fact_fact_join_is_sortmerge_at_scale(spark):
    """With broadcast disabled (≈ both sides too big to broadcast, the
    100 TB situation) the orders⋈lineitem join must be a sort-merge
    join, not a nested loop."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, "q_join_inner_sortmerge")
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_asof_join_is_single_window_no_product(spark):
    """The as-of join must be the union+window idiom: one shuffle on
    user_id, no join operator at all (the naive ts<=ts join explodes
    quadratically)."""
    plan = plan_of(spark, "q_join_asof")
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning(user_id") >= 1, plan


def test_whole_stage_codegen_everywhere(spark):
    """Scalar-function queries must stay inside whole-stage codegen —
    no Python evaluation nodes in the hot path."""
    for name in ("q_fn_string", "q_fn_math", "q_fn_json", "q_llm_text_stats"):
        plan = plan_of(spark, name)
        # "*(n)" prefixes mark whole-stage-codegen spans in plan strings.
        assert "WholeStageCodegen" in plan or "*(" in plan, name
        assert "BatchEvalPython" not in plan, f"{name} fell back to row-Python"
        assert "ArrowEvalPython" not in plan, f"{name} uses a pandas UDF needlessly"


def test_udf_is_arrow_not_row_python(spark):
    """The UDF queries must use Arrow exchange (vectorized), never
    row-at-a-time Python."""
    plan = plan_of(spark, "q_udf_scalar")
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_correlated_subquery_decorrelates(spark):
    """The correlated scalar subquery must plan as aggregate + join
    (decorrelated), never as a per-row subquery node."""
    plan = plan_of(spark, "q_subq_correlated")
    assert "Join" in plan or "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan
    assert "InSubquery" not in plan and "ScalarSubquery" not in plan.split("Filter")[0], plan


def test_minhash_no_cartesian(spark):
    """LSH candidate generation must join on (band, minhash) buckets —
    a cartesian/nested-loop product over documents would be the
    O(n²) plan LSH exists to avoid."""
    plan = plan_of(spark, "q_llm_dedup_minhash")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_multiway_join_scale_posture(spark):
    """Five-table star join: with auto-broadcast off (the 100 TB
    situation where only EXPLICIT broadcasts survive), the fact-fact
    joins become shuffles while nation/region stay broadcast; the
    order-date filter reaches the orders scan."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, "q_join_multiway")
        assert plan.count("BroadcastHashJoin") == 2, plan   # nation, region only
        assert "SortMergeJoin" in plan, plan                # l⋈o, ⋈c shuffle joins
        assert "CartesianProduct" not in plan, plan
        assert "GreaterThanOrEqual(o_orderdate" in plan, plan  # pushed to scan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_fuzzy_join_no_cartesian(spark):
    """The fuzzy edit-distance join must be an equi-join on length
    buckets (lossless |len(a)-len(b)| <= T prune) — with broadcast
    off (the 100 TB situation) it must be a sort-merge join, never a
    cartesian / nested-loop all-pairs."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, "q_join_fuzzy_editdist")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_scd2_single_exchange(spark):
    """SCD2 build: the lag-filter and the lead/row_number windows all
    share one user_id partitioning — exactly ONE Exchange in the
    plan (a second would mean the change-filter broke sort reuse)."""
    plan = plan_of(spark, "q_scd2_dimension")
    assert plan.count("Exchange") == 1, plan


def test_funnel_no_join(spark):
    """The ordered funnel is the nested-window formulation: one
    shuffle on user_id, no self-joins (the chained-join formulation
    re-shuffles events once per stage)."""
    plan = plan_of(spark, "q_funnel_conversion")
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_profile_single_scan(spark):
    """The column profiler must read the table ONCE (a per-column
    UNION of aggregates would scan k times)."""
    plan = plan_of(spark, "q_profile_columns")
    assert plan.count("Scan parquet") == 1, plan


def test_partitioned_read_prunes_partitions(spark):
    """The partitioned-parquet read-back must carry the status filter
    as a PartitionFilter (pruned at planning time — 1/3 of the
    directories never read), not a post-scan row filter."""
    plan = plan_of(spark, "q_source_partitioned")
    scan = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "o_orderstatus" in scan, plan


def test_weighted_sample_is_take_ordered(spark):
    """Priority sampling must plan as TakeOrderedAndProject (per-
    partition heaps + k-row driver merge) — a global Sort before the
    limit would be the scale-killer formulation."""
    plan = plan_of(spark, "q_llm_sample_weighted")
    assert "TakeOrderedAndProject" in plan, plan


def test_trailing_time_window_single_exchange(spark):
    """The trailing 1-hour RANGE window must reuse ONE hash exchange
    on user_id — a second Exchange would mean the frame and the
    partitioning disagree."""
    plan = plan_of(spark, "q_win_trailing_time")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_bloom_probe_broadcasts_filter_words(spark):
    """The Bloom decontamination probe must broadcast the word table
    (constant KBs) — the corpus side must never shuffle for the
    membership test."""
    plan = plan_of(spark, "q_llm_decontaminate_bloom")
    assert "BroadcastHashJoin" in plan, plan
    # No sort-merge join anywhere: both probe joins are broadcast.
    assert "SortMergeJoin" not in plan, plan


def test_anomaly_fences_broadcast_back(spark):
    """IQR fences (a per-type row) must broadcast onto the events
    scan; the events side shuffles only for the quartile aggregate,
    never for the fence join."""
    plan = plan_of(spark, "q_anomaly_iqr")
    assert "BroadcastHashJoin" in plan, plan


def test_streaks_single_exchange(spark):
    """Gaps-and-islands must carry the whole query on ONE user_id
    exchange: the distinct, row_number, island aggregate, and final
    per-user fold all reuse the same partitioning."""
    plan = plan_of(spark, "q_streaks_gaps_islands")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_nullsafe_join_stays_hash_joinable(spark):
    """<=> keys must still plan as a hash join (broadcast or SMJ),
    never a nested loop — null-safe comparison is an equi-key to
    Catalyst."""
    plan = plan_of(spark, "q_join_nullsafe")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan
    assert "NestedLoop" not in plan, plan


def test_shuffle_hash_hint_respected(spark):
    """The SHUFFLE_HASH hint must produce a ShuffledHashJoin (no sort
    phases), not fall back to sort-merge."""
    plan = plan_of(spark, "q_join_shuffle_hash")
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_sql_front_end_same_physical_strategy(spark):
    """The pure-SQL TPC-H Q3 must get the same physical treatment a
    DataFrame formulation would: pushed filters, hash joins, and a
    TakeOrderedAndProject top-10 (never a global sort)."""
    plan = plan_of(spark, "q_sql_shipping_priority")
    assert "TakeOrderedAndProject" in plan, plan
    assert "PushedFilters" in plan, plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan


def test_sql_q5_twin_physical_strategy(spark):
    """Pure-SQL TPC-H Q5: dims broadcast, fact join hash/SMJ, date
    filter pushed to the orders scan, never a nested loop."""
    plan = plan_of(spark, "q_sql_local_supplier_volume")
    assert "PushedFilters" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_sql_q10_twin_physical_strategy(spark):
    """Pure-SQL TPC-H Q10: pushed returnflag/date filters, broadcast
    nation, TakeOrderedAndProject top-20 (no global sort)."""
    plan = plan_of(spark, "q_sql_returned_items")
    assert "TakeOrderedAndProject" in plan, plan
    assert "PushedFilters" in plan, plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_fuzzy_dedup_is_blocked_equijoin(spark):
    """Fuzzy dedup must join on the block key — levenshtein runs as a
    post-join projection, never as a join condition that forces a
    nested loop over all DOC pairs. The one permitted nested loop is
    hot_key_salted_equi_join's salt replication: a cross join against
    a BROADCAST of salt_n literal rows, data-size-independent."""
    import re

    plan = plan_of(spark, "q_llm_dedup_fuzzy")
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[blk", plan), plan
    assert "levenshtein" in plan, plan
    assert plan.count("NestedLoopJoin") <= 1, plan
    assert "CartesianProduct" not in plan, plan


def test_semantic_dedup_plan_shape(spark):
    """Semantic dedup: centroid assignment is a broadcast argmin (the
    only nested-loop is the 1-row centroid-array cross join), and the
    pair stage is an equi-join on the cluster id."""
    plan = plan_of(spark, "q_llm_dedup_semantic")
    import re

    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[cid", plan), plan
    # The centroid broadcast is a single collected row; no data×data product.
    assert "CartesianProduct" not in plan, plan


def test_running_distinct_single_exchange(spark):
    """Both windows of the running-distinct query must share the one
    user_id hash exchange (prefix-partitioning reuse)."""
    plan = plan_of(spark, "q_win_running_distinct")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_interval_overlap_is_bucketed_equijoin(spark):
    """The interval-overlap join must plan the BULK path as an EQUI
    join on the hour bucket (hash-joinable, AQE-splittable) — never a
    broadcast-nested-loop over data-sized sides. Exactly ONE BNL is
    permitted: the >48 h long-tail fallback, whose build side is the
    duration-filtered (rare-by-construction) interval set broadcast
    against the window table — the r4 fan-out cap (ADVICE r3) that
    keeps a pathological duration from exploding the bucket
    sequence."""
    plan = plan_of(spark, "q_join_interval_overlap")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    # The long-tail filter must actually guard that branch: the
    # 48-hour horizon appears as a pushed filter in the plan.
    assert "INTERVAL '48' HOUR" in plan, plan


def test_mode_windows_over_counts_not_facts(spark):
    """Deterministic mode: the row_number window must run over the
    (group, value) count table, after a partial+final hash aggregate
    of the fact scan — the Window's child is the aggregate, so the
    per-group sort touches value-cardinality rows, never fact rows."""
    plan = plan_of(spark, "q_agg_mode")
    assert "WindowGroupLimit" in plan or "Window" in plan, plan
    win_child = plan.split("Window")[-1]
    assert "HashAggregate" in win_child, plan


def test_zscore_single_user_exchange(spark):
    """The rolling z-score carries scan → window → filter on ONE
    user_id exchange; the arithmetic is all codegen (no Python)."""
    plan = plan_of(spark, "q_ts_zscore_anomaly")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_entropy_two_combined_exchanges_no_python(spark):
    """Token entropy: exactly TWO exchanges — (doc_id, token) partial
    counts, then one row per (doc, partial) for the rollup — each fed
    by a map-side partial HashAggregate. hash(doc_id, token)
    partitioning cannot serve a doc_id-only aggregate, so 2 is the
    minimum for the combined shape (1 would mean shuffling raw
    uncombined token rows); >2 means a lost combine. No Python
    anywhere."""
    plan = plan_of(spark, "q_llm_token_entropy")
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("HashAggregate") == 4, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_twap_single_exchange(spark):
    """TWAP: the lead() window and the weighted aggregate share ONE
    event_type hash exchange (the groupBy reuses the window's
    partitioning)."""
    plan = plan_of(spark, "q_ts_twap")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_chunking_is_shuffle_free(spark):
    """Document chunking must be a pure codegen'd Project+Generate —
    embarrassingly parallel, zero exchanges, no Python."""
    plan = plan_of(spark, "q_llm_chunk_documents")
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_ratio_to_report_windows_over_rollup(spark):
    """Ratio-to-report: the nation dim broadcasts, and the share
    window runs over the per-(region, nation) aggregate — the Window
    operator's subtree must contain the HashAggregate, meaning it
    sorts rollup rows, not customer rows."""
    plan = plan_of(spark, "q_win_ratio_to_report")
    assert "BroadcastHashJoin" in plan, plan
    win_child = plan.split("Window")[-1]
    assert "HashAggregate" in win_child, plan


def test_bucketed_join_has_no_join_exchange(spark):
    """Bucketed layout: the orders⋈lineitem SMJ over bucketBy(8, key)
    tables must read the bucket layout directly — the ONLY exchange in
    the plan is the final aggregate's (a sort may remain when a bucket
    holds >1 file; the shuffle elimination is the scale win)."""
    plan = plan_of(spark, "q_layout_bucketed")
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_sql_q1_twin_matches_dataframe_strategy(spark):
    """Pure-SQL TPC-H Q1 and the q_agg_basic DataFrame builder must
    share the physical strategy: one pushed-down scan, partial+final
    hash aggregate, no join, no sort."""
    for name in ("q_sql_pricing_summary", "q_agg_basic"):
        plan = plan_of(spark, name)
        assert "PushedFilters" in plan, (name, plan)
        assert plan.count("HashAggregate") == 2, (name, plan)
        assert "Join" not in plan and "Sort" not in plan, (name, plan)


def test_sql_q6_twin_full_pushdown(spark):
    """Pure-SQL TPC-H Q6: every conjunct reaches the parquet reader
    and the plan is scan → partial agg → 1-row exchange → final agg —
    no join anywhere."""
    plan = plan_of(spark, "q_sql_forecast_revenue")
    assert "PushedFilters:" in plan, plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed, plan
    assert "Join" not in plan, plan


def test_lateral_subquery_decorrelates_to_group_limit(spark):
    """The LATERAL per-customer top-2 must decorrelate to the same
    WindowGroupLimit shape as q_topk_per_group — never a per-row
    nested-loop subquery execution."""
    plan = plan_of(spark, "q_subq_lateral")
    assert "WindowGroupLimit" in plan, plan
    assert "NestedLoop" not in plan, plan


def test_m4_downsample_single_combined_aggregate(spark):
    """M4 downsampling must be ONE partial+final hash aggregate — a
    single exchange carrying 4 values per (series, bucket) — with no
    Window operator (a rank-based first/last formulation would sort
    fact rows)."""
    plan = plan_of(spark, "q_ts_downsample_m4")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" not in plan, plan


def test_lm_perplexity_model_joins_stay_hash(spark):
    """Bigram-LM scoring: doc bigrams equi-join the vocabulary-sized
    model tables (hash/SMJ, never cartesian/nested-loop); the V scalar
    broadcasts; no Python anywhere."""
    plan = plan_of(spark, "q_llm_lm_perplexity")
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # the 1-row V crossJoin only
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_spatial_grid_join_is_equijoin(spark):
    """The ε-neighbor spatial join must be an EQUI join on grid cells
    (the only nested-loop is the broadcast 9-row offset expansion) —
    never a cartesian over the point set."""
    plan = plan_of(spark, "q_sim_spatial_grid_join")
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_naive_bayes_model_broadcasts(spark):
    """Naive Bayes scoring: the (lang, token) likelihood lookup must
    broadcast onto the test-token stream (model tables are
    vocabulary-sized) — the corpus side never shuffles for the lookup;
    no sort-merge join anywhere."""
    plan = plan_of(spark, "q_ml_naive_bayes")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_rolling_median_single_exchange_no_python(spark):
    """Rolling median: one user_id exchange carries collect+sort+index
    — all JVM array expressions, no Python, no self-join."""
    plan = plan_of(spark, "q_win_rolling_median")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_partition_pruned_scan_has_dpp(spark):
    """q_layout_partition_pruned must show a dynamicpruning subquery in
    the fact scan's PartitionFilters — proof the year directories are
    pruned by the joined dim at RUN time, not scanned and filtered.
    Uses the lazy helper (the registered builder freezes its result
    and removes the scratch copy, so its plan is a LocalTableScan)."""
    import shutil

    from batchprocessor_spark.operators.relational import partition_pruned_lazy

    df, loc = partition_pruned_lazy(spark, SF_ORACLE)
    try:
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruningexpression(" in plan, plan
        assert "dynamicpruning#" in plan, plan
    finally:
        shutil.rmtree(loc, ignore_errors=True)


def test_triangle_count_is_equijoin_only(spark):
    """Triangle counting must stay equi-join shaped end-to-end: the
    epsilon-edge build is the 3x3 grid equi-join and the wedge/close
    hops are hash/SMJ equi-joins — never a cartesian or data-sized
    nested loop (the offsets crossJoin is a broadcast of 9 rows)."""
    plan = plan_of(spark, "q_graph_triangle_count")
    assert "CartesianProduct" not in plan, plan


def test_changepoint_windows_share_one_series_exchange(spark):
    """q_ts_changepoint's prefix/total windows and final argmax must
    all run on the event_type partitioning — the dense grid join and
    the three window specs may not multiply exchanges on the series
    key beyond the hash aggregate + one window exchange."""
    plan = plan_of(spark, "q_ts_changepoint")
    assert "CartesianProduct" not in plan, plan
    import re

    # every hashpartitioning exchange must be on event_type (plus at
    # most the pre-aggregate on (event_type, h))
    parts = re.findall(r"Exchange hashpartitioning\(([^,)]+)", plan)
    assert parts and all(p.startswith("event_type") for p in parts), (parts, plan)


def test_cross_correlation_is_integer_moments(spark):
    """q_ts_cross_correlation must reduce to ONE final hash aggregate
    of integer moment sums per lag (partial+final), with the lag fan
    -out as a broadcast of 6 rows — no window, no sort of the series."""
    plan = plan_of(spark, "q_ts_cross_correlation")
    assert "Window" not in plan, plan
    assert plan.count("Sort ") <= 2, plan  # SMJ sorts only, no global sort


def test_bloom_runtime_filter_reaches_fact_scan(spark):
    """q_join_bloom_pruned with the bloom thresholds scaled to fixture
    size must show the injected runtime filter: a bloom_filter_agg on
    the selective orders side and a might_contain() predicate on the
    lineitem scan — rows die at the scan, not in the join shuffle."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = REGISTRY["q_join_bloom_pruned"].builder(spark, SF_ORACLE)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_tfcos_is_inverted_index_equijoin(spark):
    """The TF-cosine pair join must be a hash/SMJ equi-join on the
    term key — never a nested-loop/cartesian — and the scoring UDF
    surface must stay empty (pure JVM expressions)."""
    plan = plan_of(spark, "q_llm_tfcos_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_bitmap_distinct_single_fact_scan(spark):
    """The exact-bitmap re-grain must touch the events parquet ONCE:
    weekly partials are materialized once (the persisted-layout-table
    pattern) and BOTH re-grains read that aggregate state — the final
    plan contains no parquet scan at all, only the checkpointed
    partials."""
    plan = plan_of(spark, "q_agg_bitmap_distinct")
    assert plan.count("Scan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan, plan


def test_countmin_grid_broadcasts(spark):
    """The count-min probe join must broadcast the 192-cell counter
    grid, never shuffle the key side for it."""
    plan = plan_of(spark, "q_sketch_countmin")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # Grid build = ONE fact scan (explode into d cells, not d union
    # arms); the second scan is the exact-truth oracle scaffolding.
    assert plan.count("Scan parquet") == 2, plan


def test_bfs_frontier_rounds_are_checkpointed(spark):
    """BFS must not re-derive earlier rounds: the plan over the final
    union reads localCheckpoint scans for the per-round frontiers
    instead of replaying the 4-join cascade."""
    plan = plan_of(spark, "q_graph_bfs_layers")
    assert "Scan ExistingRDD" in plan, plan


def test_ignore_nulls_single_exchange(spark):
    """All three IGNORE-NULLS analytics must share ONE user_id
    exchange (same partitioning, frames differ)."""
    plan = plan_of(spark, "q_win_ignore_nulls")
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_sql_q14_twin_broadcasts_part_and_pushes_month(spark):
    """The Q14-shape twin must read ONE ship-month (date conjunction
    in PushedFilters) and broadcast the part dimension."""
    plan = plan_of(spark, "q_sql_promo_share")
    assert "BroadcastHashJoin" in plan, plan
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters:")[1].splitlines()[0], plan


def test_gini_rank_is_partition_local(spark):
    """The Gini rank must be the two-phase shape: a pid-partitioned
    window (partition-LOCAL row_number over the range-repartitioned
    key table), never an unpartitioned global-order window. The only
    SinglePartition exchange allowed is the final 1-row fold."""
    plan = plan_of(spark, "q_agg_gini_concentration")
    assert "Exchange hashpartitioning(pid" in plan, plan
    assert "windowspecdefinition(pid" in plan, plan


def test_ohlc_resample_single_exchange(spark):
    """q_ts_resample_ohlc: both row_number windows and the bucket
    aggregate share ONE (event_type, hour) exchange — no second
    shuffle, no self-join for open/close."""
    plan = plan_of(spark, "q_ts_resample_ohlc")
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_markov_transitions_one_scan_no_join(spark):
    """q_events_markov_transitions: row totals come from a window over
    the (types × types) aggregate, never a join that re-scans the
    fact table — one parquet scan, ≤3 exchanges (user_id window →
    pair agg → from_type window)."""
    plan = plan_of(spark, "q_events_markov_transitions")
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    assert "Join" not in plan, plan


def test_welch_ttest_single_pass(spark):
    """q_ab_welch_ttest: one conditional aggregate over ONE fact scan
    with the arm filter pushed to parquet — no per-arm branch, no
    join."""
    plan = plan_of(spark, "q_ab_welch_ttest")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert "In(event_type" in plan, plan


def test_collocation_lift_materialized_counts(spark):
    """q_text_collocation_lift: the final plan reads the MATERIALIZED
    unigram/bigram count tables (zero parquet scans — the two corpus
    scans happened once at build time), joins unigram counts by
    broadcast, and the only nested-loop joins are the two 1-row
    totals crossJoins."""
    df = REGISTRY["q_text_collocation_lift"].builder(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 0, plan
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 2, plan


def test_auc_windows_only_the_score_histogram(spark):
    """q_ml_auc: the cumulative window runs over the MATERIALIZED
    distinct-score histogram, never the document table — one parquet
    scan, no join, and the Window sits above the score aggregate
    (plan order: Scan .. HashAggregate .. Window), so its input is
    histogram-sized at any SF."""
    plan = plan_of(spark, "q_ml_auc")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    # toString prints output-first: Window (downstream) must appear
    # BEFORE the per-score aggregate that materializes its input.
    win_pos = plan.find("Window")
    score_agg_pos = plan.find("HashAggregate(keys=[score")
    assert 0 <= win_pos < score_agg_pos, plan


def test_cuped_single_pass(spark):
    """q_ab_cuped: per-user features then one global 12-column fold —
    one fact scan, no join, no second pass."""
    plan = plan_of(spark, "q_ab_cuped")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan


def test_attribution_one_exchange_no_self_join(spark):
    """q_events_attribution: both attribution models come from ONE
    user_id window pass (single hashpartitioning exchange feeding the
    shared sort), then a stack + aggregate — never the
    purchases-to-touches self-join."""
    plan = plan_of(spark, "q_events_attribution")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert plan.count("Window") == 1, plan


def test_corr_matrix_single_scan_fold(spark):
    """q_agg_corr_matrix: all 15 moment sums fold in ONE partial+final
    aggregate over ONE scan; the 6 matrix cells explode from the
    single moment row (no per-pair corr() passes, no join)."""
    plan = plan_of(spark, "q_agg_corr_matrix")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") == 2, plan  # partial + final


def test_market_share_broadcasts_dims_pushes_filters(spark):
    """q_sql_market_share (TPC-H Q8 shape): region/part/date filters
    reach their scans; all six dimension hops broadcast (the fact
    side never shuffles for a dim — at sf0.01 even orders broadcasts;
    at scale AQE keeps the 6 dims broadcast and promotes
    lineitem-orders to SMJ, either is accepted)."""
    plan = plan_of(spark, "q_sql_market_share")
    n_bhj = plan.count("BroadcastHashJoin")
    n_smj = plan.count("SortMergeJoin")
    assert n_bhj + n_smj == 7, plan
    assert n_bhj >= 6, plan
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan
    assert "EqualTo(r_name,AMERICA)" in plan, plan
    assert "EqualTo(p_type,STANDARD)" in plan, plan


def test_calibration_model_broadcasts(spark):
    """q_ml_calibration: the trained bucket model and the 1-row prior
    broadcast onto the test scan (one BroadcastHashJoin + one 1-row
    BroadcastNestedLoopJoin); no sort-merge join, and the ECE window
    runs over the ≤5-row bin aggregate (Window printed before the
    bin HashAggregate)."""
    plan = plan_of(spark, "q_ml_calibration")
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    win_pos = plan.find("Window")
    bin_agg_pos = plan.find("HashAggregate(keys=[bin")
    assert 0 <= win_pos < bin_agg_pos, plan


def test_asof_tolerance_is_single_window_no_product(spark):
    """q_join_asof_tolerance: the forward as-of must be the reverse-
    order union+window idiom — no Join operator (the naive
    ts BETWEEN ts AND ts+1h join is quadratic under hot users), one
    user_id exchange."""
    plan = plan_of(spark, "q_join_asof_tolerance")
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_linreg_single_scan_fold(spark):
    """q_ml_linreg_normal_eq: one scan, one partial+final aggregate to
    the 10-moment row, scalar math after — no join, no second pass."""
    plan = plan_of(spark, "q_ml_linreg_normal_eq")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") == 2, plan


def test_balanced_classes_broadcasts_min_count(spark):
    """q_sample_balanced_classes: the minority-count scalar reaches
    the ranked rows as a 1-row broadcast (BroadcastNestedLoopJoin),
    never a shuffle join; the class rank is one lang exchange."""
    plan = plan_of(spark, "q_sample_balanced_classes")
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning(lang") >= 1, plan


def test_url_parse_stays_jvm_side(spark):
    """q_fn_url: parse_url plans as a JVM invoke(ParseUrlEvaluator)
    expression — outside whole-stage codegen in Spark 4 but still
    JVM-evaluated and vectorizable; the gate is that NO Python
    evaluation node appears (row-Python URL parsing is the 100x-slow
    formulation) and the rollup is one scan + one aggregate."""
    plan = plan_of(spark, "q_fn_url")
    assert "ParseUrlEvaluator" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan


def test_mahalanobis_two_pass_broadcast(spark):
    """q_dq_mahalanobis: the classic moment-then-score two-pass shape —
    group moments aggregate once and BROADCAST back onto the second
    fact scan; rows never shuffle (no group window over the fact
    table, no sort-merge join)."""
    plan = plan_of(spark, "q_dq_mahalanobis")
    assert plan.count("Scan parquet") == 2, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Window" not in plan, plan


def test_kfold_cv_single_scan_loo_windows(spark):
    """q_ml_kfold_cv: all 5 train/test splits come from ONE scan via
    leave-one-fold-out sufficient statistics — no join, and the LOO
    window runs over the (bucket, fold) cell aggregate, not the
    documents table."""
    plan = plan_of(spark, "q_ml_kfold_cv")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    win_pos = plan.find("Window")
    cell_agg_pos = plan.find("HashAggregate(keys=[bucket")
    assert 0 <= win_pos < cell_agg_pos, plan


def test_rfm_reads_materialized_user_table(spark):
    """q_events_rfm_segmentation: the purchaser table materializes
    ONCE (localCheckpoint after one fact scan); the three histogram/
    threshold branches and the scoring pass all read that
    materialization — the final plan contains ZERO parquet scans and
    only broadcast joins (3 threshold rows + the scan-free scored
    rows)."""
    plan = plan_of(spark, "q_events_rfm_segmentation")
    assert plan.count("Scan parquet") == 0, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan or "Checkpoint" in plan, plan


def test_datetime_ext_stays_jvm_side(spark):
    """q_fn_datetime_ext: every calendar function is a JVM intrinsic
    (the string-buffered min/max aggregates plan as SortAggregate,
    which sits outside whole-stage codegen — acceptable); the gate is
    no Python evaluation node and one scan + one partial+final
    aggregate."""
    plan = plan_of(spark, "q_fn_datetime_ext")
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("SortAggregate") == 2, plan


def test_path_analysis_takeordered_over_bounded_paths(spark):
    """q_events_path_analysis: both leads share one user_id exchange,
    the path count has map-side combine over <= |event_types|^3 keys,
    and the top-10 is TakeOrderedAndProject — never a global Sort."""
    plan = plan_of(spark, "q_events_path_analysis")
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, plan


def test_delta_method_single_pass(spark):
    """q_ab_delta_method: one fact scan, one user fold, one 12-column
    conditional global fold — no join, no second pass."""
    plan = plan_of(spark, "q_ab_delta_method")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan


def test_top_supplier_scalar_subquery_pushdown(spark):
    """q_sql_top_supplier (TPC-H Q15 shape): the quarter filter
    reaches the fact scan, supplier joins by broadcast, and the
    max-revenue scalar subquery plans as a one-shot Subquery (reused
    aggregate), never a per-row evaluation."""
    plan = plan_of(spark, "q_sql_top_supplier")
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Subquery" in plan or "ReusedExchange" in plan or "subquery" in plan, plan


def test_assortativity_joins_on_checkpointed_edges(spark):
    """q_graph_assortativity: the edge list materializes once
    (localCheckpoint) — the final plan reads ZERO parquet and joins
    degree aggregates back by key (no window over the edge list)."""
    plan = plan_of(spark, "q_graph_assortativity")
    assert plan.count("Scan parquet") == 0, plan
    assert "Window" not in plan, plan


def test_random_walk_three_joins_group_limit(spark):
    """q_graph_random_walk: the 3-step traversal is ONE lineage —
    exactly 3 frontier-onto-edges equi-joins over the checkpointed
    edge list (zero parquet scans in the final plan), each argmin
    pruned by WindowGroupLimit, never a cartesian neighbor product."""
    plan = plan_of(spark, "q_graph_random_walk")
    assert plan.count("Scan parquet") == 0, plan
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") == 3, plan
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ht_estimator_single_scan_no_join(spark):
    """q_sample_ht_estimator: the sample is never materialized — one
    scan, one conditional aggregate, no join."""
    plan = plan_of(spark, "q_sample_ht_estimator")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan


def test_distinctive_terms_vocab_sized_state(spark):
    """q_llm_distinctive_terms: the (source, token) count table
    materializes once (zero parquet scans in the final plan), the
    token/source/grand totals join back by BROADCAST, and the top-3
    is WindowGroupLimit per source — never a corpus re-scan per
    statistic."""
    plan = plan_of(spark, "q_llm_distinctive_terms")
    assert plan.count("Scan parquet") == 0, plan
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan  # 1-row grand total
    assert "SortMergeJoin" not in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_asof_nearest_one_exchange_two_sorts(spark):
    """q_join_asof_nearest: backward and forward candidates come from
    two windows over the SAME user_id partitioning — one Exchange,
    two Sorts, no Join operator (the naive +/-1h band join is
    quadratic under hot users)."""
    plan = plan_of(spark, "q_join_asof_nearest")
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan
    assert plan.count("Window") == 2, plan


def test_stickiness_single_distinct_then_expand(spark):
    """q_events_stickiness: one scan, one distinct on the
    (month, day, user) triple, one multi-distinct aggregate — no
    join of granularities."""
    plan = plan_of(spark, "q_events_stickiness")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert "Expand" in plan, plan


def test_priority_count_decorrelates_exists(spark):
    """q_sql_priority_count (TPC-H Q4 shape): the correlated EXISTS
    must decorrelate to a semi join on o_orderkey (never a per-row
    probe), with the quarter filter pushed into the orders scan."""
    plan = plan_of(spark, "q_sql_priority_count")
    assert "LeftSemi" in plan or "Semi" in plan, plan
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan
    assert "InSubquery" not in plan, plan


def test_waiting_orders_broadcast_supplier_pushed_date(spark):
    """q_sql_waiting_orders (TPC-H Q21 shape): supplier broadcasts,
    the late-ship filter reaches its lineitem scan, no cartesian."""
    plan = plan_of(spark, "q_sql_waiting_orders")
    assert "BroadcastHashJoin" in plan, plan
    assert "GreaterThan(l_shipdate" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_big_orders_aggregated_in_becomes_join(spark):
    """q_sql_big_orders (TPC-H Q18 shape): the IN-subquery over the
    grouped+HAVING lineitem aggregate plans as a join against the
    aggregate (semi or reused-exchange inner), never a per-row
    InSubquery probe; customer broadcasts."""
    plan = plan_of(spark, "q_sql_big_orders")
    assert "InSubquery" not in plan, plan
    assert "LeftSemi" in plan or plan.count("HashAggregate") >= 4, plan
    assert "BroadcastHashJoin" in plan, plan


def test_emb_standardize_moment_broadcast(spark):
    """q_emb_standardize: per-dim moments aggregate once and
    BROADCAST back onto the second exploded pass — never a dim
    window over the exploded fact."""
    plan = plan_of(spark, "q_emb_standardize")
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Window" not in plan, plan


def test_control_chart_windows_daily_table(spark):
    """q_ts_control_chart: the lag window runs over the daily
    aggregate (printed before the day HashAggregate), and the stats
    row reaches the flag pass as a 1-row broadcast — no sort-merge
    join, no window over raw events."""
    plan = plan_of(spark, "q_ts_control_chart")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    # Column pruning removes the lag from the flag branch entirely
    # (it only needs x); the single Window lives in the stats branch
    # and consumes ITS daily aggregate (the _groupingexpression
    # HashAggregate printed after the Window line).
    assert plan.count("Window") == 1, plan
    win_pos = plan.find("Window")
    assert plan.find("HashAggregate(keys=[_groupingexpression", win_pos) > 0, plan


def test_group_size_histogram_window_on_k_table(spark):
    """q_agg_group_size_histogram: the cumulative share runs over the
    |distinct k|-sized histogram, not the per-key sizes table — the
    Window prints before the k-keyed aggregate; one fact scan."""
    plan = plan_of(spark, "q_agg_group_size_histogram")
    assert plan.count("Scan parquet") == 1, plan
    win_pos = plan.find("Window")
    k_agg_pos = plan.find("HashAggregate(keys=[k")
    assert 0 <= win_pos < k_agg_pos, plan


def test_survivorship_group_local(spark):
    """q_dedup_survivorship: blend aggregate, lang-mode rollup and
    the final join all key on the group fingerprint — no cross-group
    operator (no cartesian/BNLJ), mode argmax via WindowGroupLimit."""
    plan = plan_of(spark, "q_dedup_survivorship")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_tpch_q7_volume_shipping_dims_broadcast(spark):
    """q_sql_volume_shipping (TPC-H Q7): both nation roles plus
    supplier/customer broadcast; the two-year ship-date range is
    pushed into the lineitem scan; the nation-pair disjunction stays
    a residual on a broadcast join (never a cartesian)."""
    plan = plan_of(spark, "q_sql_volume_shipping")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin") == 5, plan
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan


def test_tpch_q9_profit_part_filter_before_broadcast(spark):
    """q_sql_product_type_profit (TPC-H Q9 shape): the p_name LIKE
    filter prunes part BEFORE its broadcast (StringContains pushed to
    the part scan), and all four dimension hops are hash joins."""
    plan = plan_of(spark, "q_sql_product_type_profit")
    assert "StringContains(p_name,gear)" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin") == 4, plan


def test_tpch_q11_two_linear_passes(spark):
    """q_sql_important_parts (TPC-H Q11 shape): the threshold is a
    SCALAR SUBQUERY (evaluated once, not per-row) and every exchange
    is partkey- or single-row-sized — two linear passes, no
    quadratic shape."""
    plan = plan_of(spark, "q_sql_important_parts")
    assert "Subquery subquery" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Exchange hashpartitioning(l_partkey") == 2, plan


def test_tpch_q13_left_join_keeps_zero_order_customers(spark):
    """q_sql_customer_distribution (TPC-H Q13): the priority filter
    lives on the JOIN (pushed to the orders side only) and the join
    stays LeftOuter — zero-order customers must survive to the
    c_count=0 bucket."""
    plan = plan_of(spark, "q_sql_customer_distribution")
    assert "LeftOuter" in plan, plan
    # The exclusion filter applies to the orders scan, never customer.
    assert "Not(EqualTo(o_orderpriority,4-NOT SPECIFIED))" in plan, plan


def test_tpch_q16_not_in_is_hash_anti_join(spark):
    """q_sql_supplier_part_counts (TPC-H Q16 shape): the NOT IN
    supplier exclusion plans as a (null-aware) broadcast HASH anti
    join — not the nested-loop fallback — and the distinct count
    expands to a two-phase aggregate, no row explosion."""
    plan = plan_of(spark, "q_sql_supplier_part_counts")
    assert "LeftAnti" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tpch_q17_decorrelated_avg_no_product(spark):
    """q_sql_small_qty_revenue (TPC-H Q17): the per-part average
    lives in a grouped CTE joined back on partkey with the integer
    cross-multiplied predicate as a join residual — no correlated
    re-execution, no cartesian; part's brand/size filters are pushed
    to its scan before broadcast."""
    plan = plan_of(spark, "q_sql_small_qty_revenue")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "StartsWith(p_brand,Brand#1)" in plan, plan


def test_tpch_q20_nested_semi_chain(spark):
    """q_sql_promotion_suppliers (TPC-H Q20 shape): the nested IN
    chain plans as two LeftSemi hash joins (part names into lineitem,
    aggregated suppliers into supplier) — never a correlated re-scan;
    the 1996 date range is pushed to the lineitem scan."""
    plan = plan_of(spark, "q_sql_promotion_suppliers")
    assert plan.count("LeftSemi") == 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan


def test_tpch_q22_anti_join_prunes_orders_scan(spark):
    """q_sql_global_sales_opportunity (TPC-H Q22 shape): the NOT
    EXISTS is a hash ANTI join whose orders side is pruned by the
    pushed date filter BEFORE the join; the only nested-loop is the
    1-row avgbal broadcast (the scalar-aggregate cross join)."""
    plan = plan_of(spark, "q_sql_global_sales_opportunity")
    assert "LeftAnti" in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "GreaterThanOrEqual(o_orderdate,2000-01-01" in plan, plan


def test_tpch_q2_min_subquery_decorrelated(spark):
    """q_sql_min_balance_supplier (TPC-H Q2 shape): the correlated
    MIN subquery decorrelates into a per-part aggregate joined back
    (one SortMergeJoin on the (balance, partkey) pair) with a
    tie-broken TakeOrderedAndProject — no per-row re-execution, no
    cartesian, no global sort."""
    plan = plan_of(spark, "q_sql_min_balance_supplier")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_zipf_windows_on_vocab_table(spark):
    """q_text_zipf_slope: the rank window runs over the vocab-sized
    aggregate (Window prints before the token HashAggregate), and the
    corpus is scanned once."""
    plan = plan_of(spark, "q_text_zipf_slope")
    assert plan.count("Scan parquet") == 1, plan
    win_pos = plan.find("Window")
    tok_agg_pos = plan.find("HashAggregate(keys=[token")
    assert 0 <= win_pos < tok_agg_pos, plan


def test_bleu_no_self_join_no_window(spark):
    """q_text_bleu_pairs: n-gram construction is per-row array math —
    the only joins are the two 1-row aggregate broadcasts (no
    SortMergeJoin, no row windows)."""
    plan = plan_of(spark, "q_text_bleu_pairs")
    assert "SortMergeJoin" not in plan, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_url_dedup_single_shuffle_jvm_side(spark):
    """q_llm_dedup_urls: canonicalization stays JVM-side (no Python
    eval nodes) and the dedup is one exchange on the canonical key
    plus the final order."""
    plan = plan_of(spark, "q_llm_dedup_urls")
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, plan
    assert plan.count("Exchange hashpartitioning(canonical_url") == 1, plan


def test_sax_window_on_segment_table(spark):
    """q_ts_sax: the ntile window runs over the bounded segment
    aggregate, never the orders scan (Window before the segment_id
    HashAggregate in plan print order)."""
    plan = plan_of(spark, "q_ts_sax")
    win_pos = plan.find("Window")
    seg_agg_pos = plan.find("HashAggregate(keys=[segment_id")
    assert 0 <= win_pos < seg_agg_pos, plan


def test_exists_flag_is_existence_join(spark):
    """q_subq_exists_flag: the projected EXISTS plans as an
    ExistenceJoin (hash join emitting the match bit), never a per-row
    subquery or nested loop; the priority filter is pushed to the
    orders scan."""
    plan = plan_of(spark, "q_subq_exists_flag")
    assert "ExistenceJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan, plan


def test_xml_extraction_jvm_side(spark):
    """q_fn_xml: xpath evaluators stay JVM-side — no Python eval
    nodes; one scan, one aggregate."""
    plan = plan_of(spark, "q_fn_xml")
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, plan
    assert plan.count("Scan parquet") == 1, plan


def test_pr_auc_window_on_histogram(spark):
    """q_ml_pr_auc: the cumulative window runs over the bounded
    score histogram (the q_ml_auc discipline), never the corpus."""
    plan = plan_of(spark, "q_ml_pr_auc")
    win_pos = plan.find("Window")
    hist_agg_pos = plan.find("HashAggregate(keys=[score")
    assert 0 <= win_pos < hist_agg_pos, plan


def test_burstiness_two_keyed_aggregates_no_window(spark):
    """q_ts_burstiness: fact → (type, minute) counts → per-type
    moments; no windows, no joins."""
    plan = plan_of(spark, "q_ts_burstiness")
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan


def test_sq_ann_broadcast_scan_group_limit(spark):
    """q_llm_simsearch_sq: the grid is a 1-row broadcast, the 5 query
    codes broadcast onto the corpus scan (BroadcastNestedLoopJoin on
    the != predicate — the corpus itself never shuffles), ranking is
    WindowGroupLimit, and everything is JVM expressions (no Python
    nodes)."""
    plan = plan_of(spark, "q_llm_simsearch_sq")
    # 3 = the query-codes broadcast onto the corpus + the 1-row grid
    # cross under EACH self-join branch (the two grid BroadcastExchange
    # subtrees are identical; exchange reuse collapses them at runtime)
    assert plan.count("BroadcastNestedLoopJoin") == 3, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert "Python" not in plan, plan


def test_scd2_pointintime_no_join_two_user_exchanges(spark):
    """q_join_scd2_pointintime: the temporal as-of read plans with ZERO
    join operators — exactly two user_id hash Exchanges (change-detect
    lag window + the post-union carry window; a union cannot inherit
    partitioning). The oracle's interval-containment join is the
    range-exploding formulation the engine avoids."""
    plan = plan_of(spark, "q_join_scd2_pointintime")
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning(user_id") == 2, plan
    assert "Window" in plan, plan
    assert "Python" not in plan, plan


def test_holt_is_single_exchange_jvm_fold(spark):
    """q_ts_holt: the per-series fold is a catalyst higher-order
    function — one event_type exchange for the collect_list, zero
    Python nodes, no window, no join (the whole recurrence is inside
    the aggregate projection)."""
    plan = plan_of(spark, "q_ts_holt")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning(event_type") >= 1, plan
    # day pre-aggregate + series aggregate only — no third shuffle key.
    import re

    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"event_type"}, keys


def test_snapshot_diff_shares_user_id_partitioning(spark):
    """q_merge_snapshot_diff: both as-of windows and the diff join run
    on user_id hash partitioning (no other join key appears), the
    cutoff aggregate broadcasts, and nothing degenerates to a
    cartesian product."""
    import re

    plan = plan_of(spark, "q_merge_snapshot_diff")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert "user_id" in keys, keys
    # change_type agg is the only non-user_id shuffle.
    assert keys <= {"user_id", "change_type"}, keys


def test_emb_dim_drift_is_one_aggregate_no_join(spark):
    """q_emb_dim_drift: explode + a single partial/final hash
    aggregate pair on dim — no join, no window, no Python in the hot
    path (contrast q_emb_standardize, which legitimately needs the
    moment broadcast-back for its per-value output)."""
    plan = plan_of(spark, "q_emb_dim_drift")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning(dim") == 1, plan
    assert "partial_sum" in plan, plan


def test_funnel_time_window_single_exchange_no_join(spark):
    """q_funnel_time_window: the EXISTS-over-triples semantics must
    run as cascaded carry windows on ONE user_id exchange — no join
    operator anywhere, both windows inside the same partitioning."""
    plan = plan_of(spark, "q_funnel_time_window")
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rolling_active_users_bounded_fanout_shape(spark):
    """q_events_rolling_active_users: no window operator (the rolling
    distinct is the bounded explode + re-distinct, never per-day sets
    in window state), no Python, and the day-bounds filter arrives by
    broadcast."""
    plan = plan_of(spark, "q_events_rolling_active_users")
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "Explode" in plan or "Generate" in plan, plan


def test_power_mde_single_aggregate_pushed_filter(spark):
    """q_ab_power_mde: one partial/final aggregate pair over a pushed
    IN filter; the formula stage is 1-row scalar math — no join, no
    window, no second pass."""
    plan = plan_of(spark, "q_ab_power_mde")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "In(event_type" in plan or "PushedFilters: [" in plan, plan
    assert plan.count("Exchange") <= 2, plan  # single-partition final agg


def test_cohort_ltv_small_window_broadcast_sizes(spark):
    """q_events_cohort_ltv: the running sum windows over the tiny
    (cohort, age) triangle, never the event table; cohort sizes join
    by broadcast; user-side join and cohort aggregate share the
    user_id partitioning."""
    plan = plan_of(spark, "q_events_cohort_ltv")
    assert "Window" in plan, plan
    # the window consumes the (cohort_week, week_idx) AGGREGATE output,
    # not raw events: the aggregate appears below the window
    assert plan.find("Window") < plan.find(
        "HashAggregate(keys=[cohort_week"
    ), plan
    assert "BroadcastExchange" in plan, plan
    assert plan.count("Exchange hashpartitioning(user_id") >= 1, plan


def test_winnowing_single_exchange_no_join(spark):
    """q_llm_winnowing (VERDICT r7 #2: the winnowing family was the
    only r7 addition without a plan gate): the whole fingerprint
    selection — explode, both windows, the distinct, the per-doc
    aggregate — must share ONE doc_id exchange (the distinct on
    (doc_id, skey) and the final groupBy reuse the window's
    partitioning); no join, no Python nodes."""
    plan = plan_of(spark, "q_llm_winnowing")
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1, plan
    assert "Exchange hashpartitioning(doc_id" in plan, plan


def test_winnowing_pairs_single_subtree_no_forced_broadcast(spark):
    """q_llm_winnowing_pairs plan shape (VERDICT r7 #1): built through
    the same helpers as the registered builder, pre-checkpoint. The
    fingerprint subtree must be computed ONCE (a cached relation all
    three consumers scan — r7's plan re-ran the explode+window subtree
    4x); pair generation must be the capped in-array expansion (no
    CartesianProduct / nested-loop, no fp-side self-join); and the
    corpus-cardinality sizes joins must carry NO broadcast hint (AQE
    may still pick broadcast at fixture scale — that's its call, and
    it can demote at 10^9 docs; a forced hint can't be demoted)."""
    from batchprocessor_spark.functions.text import (
        winnowing_distinct_fingerprints,
        winnowing_pair_matches,
    )
    from batchprocessor_spark.sources.catalog import load_table

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    fp = winnowing_distinct_fingerprints(docs).cache()
    try:
        df = winnowing_pair_matches(fp)
        qe = df._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        optimized = qe.optimizedPlan().toString()
    finally:
        fp.unpersist()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # every consumer reads the cache: pair-gen + s1 + s2 = 3 scans of
    # ONE InMemoryRelation; outside its (printed) build plan there is
    # no other source — the subtree can only run once.
    assert plan.count("InMemoryTableScan") == 3, plan
    # ... and nothing else reads the source: each printed
    # InMemoryRelation block contains exactly one FileScan (its build
    # plan), so any EXTRA FileScan would be an uncached re-read of the
    # explode+window subtree (r7's plan had 4 independent ones).
    assert plan.count("FileScan parquet") == plan.count("InMemoryRelation"), plan
    assert "InMemoryRelation" in plan, plan
    # no forced broadcast anywhere in the builder (AQE-chosen
    # broadcasts appear only in the physical plan, never as a
    # strategy hint on the optimized logical join).
    assert "strategy=broadcast" not in optimized, optimized


def test_dup_token_mass_single_scan_no_join(spark):
    """q_llm_dup_token_mass: ONE parquet scan, two hash aggregates,
    and the grand total is an unpartitioned window over the tiny
    multiplicity histogram — no join of any kind (a self-joined total
    would re-scan the corpus), no Python nodes."""
    plan = plan_of(spark, "q_llm_dup_token_mass")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert "Window" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_normalize_gain_single_aggregate(spark):
    """q_llm_normalize_dedup_gain: one scan, one (expanded)
    multi-distinct aggregate, no join, no window."""
    plan = plan_of(spark, "q_llm_normalize_dedup_gain")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "Expand" in plan, plan  # the two-distinct rewrite
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_split_leakage_no_cartesian(spark):
    """q_llm_split_leakage rides the inverted-index pair path: never
    doc x doc, no Python nodes. The single nested-loop allowed is the
    bounded salt-range cross (a 16-row spark.range broadcast) inside
    hot_key_salted_equi_join's hot-shingle lane."""
    plan = plan_of(spark, "q_llm_split_leakage")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pq_adc_broadcast_lut_no_corpus_reread(spark):
    """q_llm_simsearch_pq post-fit shape, gated through the SAME
    helper the registered builder calls (_pq_adc_rank) on the scoped
    cache: the codebook and the ADC lookup table arrive by broadcast
    (never a corpus-side shuffle), the encode + LUT consumers read
    ONE cached relation (no parquet re-read of the explode+slice
    subtree), the only corpus-sized exchanges are the (qid, vec_id)
    ADC partial-sum and the per-query rank, and nothing is a
    cartesian/nested-loop join or a Python node."""
    import re

    from batchprocessor_spark.operators.similarity import (
        _PQ_K,
        _PQ_M,
        _PQ_SUBD,
        _pq_adc_rank,
        _pq_cents_df,
        _pq_subvectors,
    )

    sub = _pq_subvectors(spark, SF_ORACLE).cache()
    try:
        cdf = _pq_cents_df(
            spark,
            [
                (s, c, [s + c + j for j in range(_PQ_SUBD)])
                for s in range(_PQ_M)
                for c in range(_PQ_K)
            ],
        )
        plan = (
            _pq_adc_rank(sub, cdf)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        sub.unpersist()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # codes + LUT both read the cache; no extra parquet scan outside
    # the InMemoryRelation's own build plan.
    assert plan.count("InMemoryTableScan") == 2, plan
    assert plan.count("FileScan parquet") == plan.count("InMemoryRelation"), plan
    # LUT lands on the code table via broadcast-hash, and the only
    # corpus-sized hash exchanges are the ADC sum + per-query rank.
    assert "BroadcastHashJoin" in plan, plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"qid", "s"}, keys


def test_random_projection_jvm_fold_single_exchange(spark):
    """q_emb_random_projection: the 64x16 projection must be a
    constant-folded JVM array expression (no Python nodes, no
    window), and the adjacent-pair audit ONE self-join on vec_id —
    a single corpus-sized hash exchange key, no cartesian."""
    import re

    plan = plan_of(spark, "q_emb_random_projection")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan, plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"vec_id"}, keys


def test_lexical_richness_two_aggregates_no_join(spark):
    """q_text_lexical_richness: explode -> (source, w) pre-aggregate
    (map-side combined — the corpus collapses to vocab-sized rows at
    the first shuffle) -> (source) aggregate. No join, no window, no
    Python nodes, exactly the two hash exchanges."""
    import re

    plan = plan_of(spark, "q_text_lexical_richness")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan or "partial_sum" in plan, plan
    keys = re.findall(r"Exchange hashpartitioning\((\w+)[,#]", plan)
    assert sorted(keys) == ["source", "source"], keys


def test_readability_single_aggregate_codegen(spark):
    """q_text_readability: per-row regexp counting feeding ONE
    enum-sized (source) partial/final aggregate pair — no
    join/window/Python (the AQE pre-execution print doesn't show
    codegen spans, so the structural shape is the gate)."""
    plan = plan_of(spark, "q_text_readability")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning(source") == 1, plan
    assert "partial_sum" in plan, plan


def test_dhash_single_arrow_pass_one_exchange(spark):
    """q_llm_multimodal_dhash: decode+hash must be Arrow-batched
    mapInPandas passes (the sanctioned Python path for binary
    decode — never row-at-a-time UDFs), with the bucket-size window
    on dhash as the ONLY hash exchange and no join."""
    import re

    plan = plan_of(spark, "q_llm_multimodal_dhash")
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "MapInPandas" in plan, plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"dhash", "doc_id"}, keys
    assert plan.count("Exchange hashpartitioning(dhash") == 1, plan


def test_tokenizer_fertility_single_aggregate(spark):
    """q_llm_tokenizer_fertility: one scan, one enum-sized (source)
    partial/final aggregate — no join/window/Python."""
    plan = plan_of(spark, "q_llm_tokenizer_fertility")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning(source") == 1, plan
    assert "partial_sum" in plan, plan


def test_gopher_rules_single_aggregate(spark):
    """q_llm_gopher_rules: per-row rule bitmap inside codegen feeding
    ONE enum-sized (lang, source) partial/final aggregate — no
    join/window/Python."""
    plan = plan_of(spark, "q_llm_gopher_rules")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning(lang") == 1, plan
    assert "partial_sum" in plan, plan


def test_sorted_neighborhood_window_then_equijoin(spark):
    """q_dedup_sorted_neighborhood: candidate generation is ONE lead
    window over skinny (doc_id, n_chars) rows (rank adjacency — the
    O(n·w) guarantee), verification is equi-joins on doc_id over
    candidates only. Never a cartesian/theta product, no Python."""
    plan = plan_of(spark, "q_dedup_sorted_neighborhood")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Window") == 1, plan
    # the window sorts only the skinny key projection, not the texts
    assert plan.count("Exchange hashpartitioning(lang") == 1, plan


def test_bipartite_projection_no_join_two_exchanges(spark):
    """q_graph_bipartite_projection: the hub cap is a sorted-slice of
    the per-part collect_set and the <= C(8,2) pair expansion is pure
    array combinatorics — the plan has ZERO join operators, exactly
    two shuffle keys (part, then the pair key), no Python, and the
    top-20 is TakeOrderedAndProject, never a global sort."""
    import re

    plan = plan_of(spark, "q_graph_bipartite_projection")
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan, plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys == {"part", "supp_a"}, keys


def test_holt_winters_is_single_exchange_jvm_fold(spark):
    """q_ts_holt_winters: same posture as q_ts_holt — the triple
    recurrence (including the 7-slot seasonal queue) is one catalyst
    higher-order fold; one event_type shuffle lineage, no Python, no
    join, no window."""
    import re

    plan = plan_of(spark, "q_ts_holt_winters")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"event_type"}, keys


def test_kaplan_meier_windows_over_histogram_not_facts(spark):
    """q_ml_kaplan_meier: the subjects pass is ONE user_id exchange
    (window + collapse share it); the suffix-sum window and the
    survival fold run over the BOUNDED duration histogram only (its
    unpartitioned window is over <= observation-window-days rows, the
    value-table discipline); no Python, no cartesian."""
    import re

    plan = plan_of(spark, "q_ml_kaplan_meier")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan, plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"user_id", "dur"}, keys
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_fellegi_sunter_governed_pairs_broadcast_ustats(spark):
    """q_dedup_fellegi_sunter: candidate pairs come from the
    capped_bucket_pairs governor (one blk shuffle + array expansion —
    no bucket self-join), attribute flags are skinny equi-joins on
    doc ids, and every u-statistic rides as a broadcast 1-row frame.
    No cartesian on corpus-sized frames (the 1-row u-stat cross joins
    plan as BroadcastNestedLoop over ONE row), no Python."""
    import re

    plan = plan_of(spark, "q_dedup_fellegi_sunter")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    # blk: governor bucket shuffle; d1/d2: flag joins; field names:
    # the four u value-histograms; ag_lang: the 16-row pattern agg
    assert keys <= {
        "blk", "d1", "d2", "lang", "source", "wbucket", "fp3",
        "doc_id", "ag_lang",
    }, keys
    assert "BroadcastExchange" in plan, plan


def test_bootstrap_ci_map_side_replicates(spark):
    """q_ab_bootstrap_ci: the 40 replicates explode map-side from the
    filtered fact scan and combine to 40 rows BEFORE any shuffle (the
    only fact-derived exchange key is rep); the rank window runs over
    the 40-row replicate table; the CI row broadcasts onto the 1-row
    observed aggregate. No Python, no cartesian on corpus frames."""
    import re

    plan = plan_of(spark, "q_ab_bootstrap_ci")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan, plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"rep"}, keys
    assert "BroadcastExchange" in plan, plan
    assert "partial_sum" in plan, plan


def test_lang_confusion_windows_over_cells(spark):
    """q_llm_lang_confusion: the prediction pass is codegen regex
    votes; the confusion matrix collapses to <= |langs|^2 rows before
    the precision/recall windows run. No join, no Python; every
    exchange key is a lang column."""
    import re

    plan = plan_of(spark, "q_llm_lang_confusion")
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"lang_actual", "lang_pred"}, keys


def test_quantified_subquery_decorrelates_to_broadcast(spark):
    """q_subq_quantified: the ALL/ANY rewrite plans as ONE nation-keyed
    aggregate broadcast onto the customer scan — never a per-row
    subquery probe, never a cartesian."""
    plan = plan_of(spark, "q_subq_quantified")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Scan parquet") == 2, plan


def test_lifecycle_single_user_pass(spark):
    """q_events_lifecycle: the distinct + all three windows share ONE
    user_id exchange lineage; churn emission is a filter off the same
    windowed frame (never a week-to-week self-join); the max-day
    horizon broadcasts as one row; the final aggregate is day-keyed."""
    import re

    plan = plan_of(spark, "q_events_lifecycle")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan, plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"user_id", "day"}, keys
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_page_hinkley_single_exchange_jvm_fold(spark):
    """q_ts_page_hinkley: the q_ts_holt posture — the detector fold is
    a catalyst higher-order function over the per-series day array,
    one event_type exchange lineage, no Python, no join, no window."""
    import re

    plan = plan_of(spark, "q_ts_page_hinkley")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"event_type"}, keys


def test_layout_sorted_skipping_pushdown(spark):
    """q_layout_sorted_skipping: the month predicate is pushed into
    BOTH scratch-layout scans, and the audit is 2 aggregate rows —
    no join, no Python."""
    plan = plan_of(spark, "q_layout_sorted_skipping")
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate") == 2, plan


def test_layout_sorted_skipping_file_counts(spark):
    """The exact file accounting the hash-checked unit counts
    summarize: at the parity SF the clustered layout contributes rows
    from EXACTLY 1 of its 8 files and the bucket-scattered one from
    all 8 bucket dirs (each dir exactly one physical file -- the
    pre-write repartition(8, bucket) guarantees one writing task per
    bucket)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from batchprocessor_spark.operators import layout as L

    REGISTRY["q_layout_sorted_skipping"].builder(spark, SF_ORACLE).collect()
    base = L._SKIP_SCRATCH[SF_ORACLE]

    month = (F.col("o_orderdate") >= "1995-03-01") & (
        F.col("o_orderdate") < "1995-04-01"
    )
    clustered = os.path.join(base, "clustered")
    total = len([f for f in os.listdir(clustered) if f.endswith(".parquet")])
    assert total == 8, total
    read = (
        spark.read.parquet(clustered)
        .where(month)
        .select(F.input_file_name().alias("fn"))
        .agg(F.count_distinct("fn"))
        .collect()[0][0]
    )
    assert read == 1, read

    shuffled = os.path.join(base, "shuffled")
    dirs = sorted(d for d in os.listdir(shuffled) if d.startswith("bucket="))
    assert dirs == sorted(f"bucket={i}" for i in range(8)), dirs
    files = glob.glob(os.path.join(shuffled, "bucket=*", "*.parquet"))
    assert len(files) == 8, files  # one physical file per bucket dir
    hit = (
        spark.read.parquet(shuffled)
        .where(month)
        .agg(F.count_distinct("bucket"))
        .collect()[0][0]
    )
    assert hit == 8, hit


def test_hits_edges_checkpointed_once_no_collect_loop(spark):
    """q_graph_hits: each half-step is one equi-join of scores onto
    the CHECKPOINTED edge list + one aggregate; the L1 masses ride as
    1-row broadcasts; top-10s are TakeOrderedAndProject. The edge
    list itself must appear as an in-memory scan (localCheckpoint),
    never re-derived from parquet inside the loop."""
    plan = plan_of(spark, "q_graph_hits")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "Scan ExistingRDD" in plan, plan
    assert "Scan parquet" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_span_removal_gram_equijoin_no_broadcast_dupset(spark):
    """q_llm_dedup_span_removal: the duplicated-gram set is
    corpus-scale and must flow back through a shuffled gram EQUI-join
    (never a forced broadcast), coverage/reassembly run on (doc, pos)
    keys, and there is no cartesian and no Python anywhere."""
    import re

    plan = plan_of(spark, "q_llm_dedup_span_removal")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"gram", "doc_id", "pos"}, keys


def test_cross_table_rules_two_join_lineages_no_python(spark):
    """q_dq_cross_table_rules: each rule branch is scan → equi-join →
    1-row conditional aggregate (the line⋈order join for the row
    rules, the per-order aggregate LEFT join for the header rules) —
    no cartesian, no window, no Python."""
    plan = plan_of(spark, "q_dq_cross_table_rules")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_croston_single_exchange_jvm_fold(spark):
    """q_ts_croston: the q_ts_holt posture on a per-part key — the
    (size, interval, prev_day) fold is one catalyst higher-order
    function, one part exchange lineage, no Python, no join, no
    window."""
    import re

    plan = plan_of(spark, "q_ts_croston")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"part"}, keys


def test_brier_and_mcc_broadcast_model_single_aggregate(spark):
    """q_ml_brier_score / q_ml_mcc: the bucket model and the 1-row
    prior broadcast onto the scoring scan; the reduction is ONE
    conditional aggregate — no window, no Python, no shuffled join."""
    import re

    for name in ("q_ml_brier_score", "q_ml_mcc"):
        plan = plan_of(spark, name)
        assert "Window" not in plan, (name, plan)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "SortMergeJoin" not in plan, (name, plan)
        assert "BroadcastExchange" in plan, (name, plan)
        keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
        # expression group-bys surface as _groupingexpression
        assert keys <= {"bucket", "_groupingexpression"}, (name, keys)


def test_weekday_effect_bounded_aggregates(spark):
    """q_ts_weekday_effect: day aggregate → 7-row weekday aggregate →
    1-row total broadcast back. No window, no Python."""
    import re

    plan = plan_of(spark, "q_ts_weekday_effect")
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"day_no", "dow7", "_groupingexpression"}, keys
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_time_split_windows_over_bounded_tables(spark):
    """q_sample_time_split: the rank window runs over the DISTINCT
    day table and the share windows over the ≤|event-type| report —
    never the fact; the boundary broadcasts as one row."""
    import re

    plan = plan_of(spark, "q_sample_time_split")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan, plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"day", "event_type"}, keys
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_sorted_neighborhood_sharded_no_single_language_sort(spark):
    """q_dedup_sorted_neighborhood (VERDICT r8 #1): the rank window
    must partition by (blk, lang), never lang alone, so a
    single-language 100 TB corpus sorts across all range blocks. The
    checkpoint=False internal form exposes the full plan: the range
    shard exchange is present, the corpus rank/lead windows carry blk
    in their partition spec, and the ONLY lang-partitioned window is
    the boundary pass above the segment-edge subset filter. The
    registered builder pins the block assignment (Scan ExistingRDD
    from the localCheckpoint)."""
    import re

    import pandas as pd

    from batchprocessor_spark.operators.dedup import _snm_candidates_blocked

    # Adversarial shape: EVERY row one language.
    pdf = pd.DataFrame(
        {"doc_id": range(200), "lang": ["en"] * 200, "n_chars": [100] * 200}
    )
    k = spark.createDataFrame(pdf)
    plan = (
        _snm_candidates_blocked(k, 16, checkpoint=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning(lang" in plan, plan  # the shard exchange
    assert "windowspecdefinition(blk" in plan, plan
    # the corpus-wide rank window is per-(block, lang) ...
    assert re.search(r"row_number\(\) windowspecdefinition\(blk", plan), plan
    # ... and NEVER per-lang alone (the r8 single-task finding)
    assert not re.search(r"row_number\(\) windowspecdefinition\(lang", plan), plan
    # lang-only windows exist exactly once: the boundary pass over the
    # first-3/last-3 subset (lead-only, behind the rn/cnt filter)
    lang_windows = re.findall(r"lead\(doc_id#\d+L?, 1, null\) windowspecdefinition\((\w+)#", plan)
    assert lang_windows and all(c in ("blk", "lang") for c in lang_windows), plan
    assert lang_windows.count("lang") == 1, lang_windows

    plan_reg = plan_of(spark, "q_dedup_sorted_neighborhood")
    assert "Scan ExistingRDD" in plan_reg, plan_reg
    assert "rangepartitioning" not in plan_reg  # materialized pre-plan


def test_script_mix_pure_projection(spark):
    """q_text_script_mix: a per-row projection off the scan — no
    exchange, no window, no join, no Python anywhere."""
    plan = plan_of(spark, "q_text_script_mix")
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_emb_isotropy_bounded_aggregates(spark):
    """q_emb_isotropy: explode -> two bounded aggregates (labels×dims,
    then labels) + one labels-sized join — no window, no Python, and
    every exchange keys on label(+dim), never per-vector."""
    import re

    plan = plan_of(spark, "q_emb_isotropy")
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)#\d+L?(?:, (\w+)#\d+L?)?", plan))
    flat = {k for pair in keys for k in pair if k}
    # label(+dim) only: the vector count comes off the PRE-explode
    # frame, so no per-vector key may appear in any exchange
    assert flat <= {"label", "dim"}, (flat, plan)


def test_sprt_window_on_day_grain_only(spark):
    """q_ab_sprt: the cumulative LLR window runs on the bounded
    day-grain value table (the aggregate sits BELOW the window), and
    the verdict side is a 1-row relation — no fact-table windows, no
    Python."""
    plan = plan_of(spark, "q_ab_sprt")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the window's child must be the day aggregate, not the scan:
    # every Window node in the plan appears above a HashAggregate
    import re

    w_idx = [m.start() for m in re.finditer(r"\bWindow\b", plan)]
    assert w_idx, plan
    agg_idx = [m.start() for m in re.finditer(r"HashAggregate", plan)]
    assert agg_idx and min(agg_idx) > min(w_idx) - 4000, plan
    assert "rangepartitioning(day" in plan or "SinglePartition" in plan, plan


def test_isotonic_pairs_join_on_day_table_only(spark):
    """q_ml_isotonic: the n^2 segment-mean stage is a broadcast range
    join of the CALENDAR-BOUNDED day aggregate with itself — the fact
    table contributes exactly one aggregate (below the join) and is
    never windowed or cartesian-joined."""
    plan = plan_of(spark, "q_ml_isotonic")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the day-grain windows sit above the day aggregate, not the scan
    import re

    w = plan.index("Window")
    agg = [m.start() for m in re.finditer("HashAggregate", plan)]
    assert any(a > w for a in agg), plan


# ---------------- round-9 second-session operators (waves 1-5) ----------------

_NO_PY = ("BatchEvalPython", "ArrowEvalPython")


def _assert_no_python(plan: str) -> None:
    for node in _NO_PY:
        assert node not in plan, plan


def test_kruskal_wallis_window_on_value_histogram_only(spark):
    """q_ml_kruskal_wallis: the midrank window runs on the bounded
    distinct-cents histogram (an aggregate sits below it), never the
    fact table; no Python, no cartesian beyond the 1-row totals."""
    import re

    plan = plan_of(spark, "q_ml_kruskal_wallis")
    _assert_no_python(plan)
    assert "CartesianProduct" not in plan, plan
    w = plan.index("Window")
    aggs = [m.start() for m in re.finditer("HashAggregate", plan)]
    assert any(a > w for a in aggs), plan


def test_tukey_hsd_pairs_on_seven_row_frames(spark):
    """q_ml_tukey_hsd: no windows at all — the pair expansion is a
    nested-loop join of the 7-row weekday aggregate with itself plus
    a 1-row total; the fact table contributes exactly one aggregate
    lineage. No Python."""
    plan = plan_of(spark, "q_ml_tukey_hsd")
    _assert_no_python(plan)
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_theta_forecast_single_exchange_jvm_fold(spark):
    """q_ts_theta_forecast: day aggregate -> one event_type exchange
    -> catalyst folds. No join, no window, no Python."""
    plan = plan_of(spark, "q_ts_theta_forecast")
    _assert_no_python(plan)
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


def test_source_divergence_enum_pair_expansion(spark):
    """q_text_source_divergence: the source-pair expansion joins the
    |sources|-row totals frame (never documents), and the per-pair
    cell aggregate runs on equi-joined token rows — no cartesian, no
    Python."""
    plan = plan_of(spark, "q_text_source_divergence")
    _assert_no_python(plan)
    assert "CartesianProduct" not in plan, plan


def test_phonetic_block_equijoin_on_block_code(spark):
    """q_dedup_phonetic_block: candidates come from an EQUI-join on
    the phonetic block code over the distinct-name aggregate — no
    cartesian/NL join anywhere, no Python (the code derivation is
    pure catalyst string ops)."""
    plan = plan_of(spark, "q_dedup_phonetic_block")
    _assert_no_python(plan)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "block_code" in plan, plan


def test_clustering_coeff_no_cartesian_no_python(spark):
    """q_graph_clustering_coeff: wedge/close equi-joins + vertex-sized
    degree/triangle joins + a 1-row total broadcast — no cartesian,
    no Python."""
    plan = plan_of(spark, "q_graph_clustering_coeff")
    _assert_no_python(plan)
    assert "CartesianProduct" not in plan, plan


def test_ljung_box_windows_above_aggregates(spark):
    """q_ts_ljung_box: both float windows (the lag alignment runs as
    an equi-join; the cumulative Q runs on the 7-row report) sit
    above aggregates, never on the orders scan; no Python."""
    import re

    plan = plan_of(spark, "q_ts_ljung_box")
    _assert_no_python(plan)
    w = plan.index("Window")
    aggs = [m.start() for m in re.finditer("HashAggregate", plan)]
    assert any(a > w for a in aggs), plan


def test_rake_top15_is_take_ordered(spark):
    """q_llm_keyword_rake: the top-15 cut is TakeOrderedAndProject
    (never a global sort of all phrases); the phrase-segmentation
    window partitions by doc_id (bounded per-document state); no
    Python."""
    plan = plan_of(spark, "q_llm_keyword_rake")
    _assert_no_python(plan)
    assert "TakeOrderedAndProject" in plan, plan
    assert "hashpartitioning(doc_id" in plan, plan


def test_burrows_delta_top20_cut_and_enum_grid(spark):
    """q_text_burrows_delta: the function-word vocabulary is a
    TakeOrderedAndProject top-20 cut; everything after runs on
    sources×20 frames. No cartesian, no Python."""
    plan = plan_of(spark, "q_text_burrows_delta")
    _assert_no_python(plan)
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ahash_single_arrow_pass_window_on_hash(spark):
    """q_llm_multimodal_ahash: ONE Arrow-batched python stage (the
    decode+hash mapInPandas) and the only exchange after it keys the
    bucket window on the hash value."""
    plan = plan_of(spark, "q_llm_multimodal_ahash")
    assert plan.count("MapInPandas") == 2, plan  # media gen + decode/hash
    assert "hashpartitioning(ahash" in plan, plan


def test_effect_size_and_f1_windows_on_histograms(spark):
    """q_ab_effect_size / q_ml_f1_threshold: cumulative windows run
    on bounded value/score histograms (aggregate below window), 1-row
    scalars join back; no Python."""
    import re

    for name in ("q_ab_effect_size", "q_ml_f1_threshold"):
        plan = plan_of(spark, name)
        _assert_no_python(plan)
        w = plan.index("Window")
        aggs = [m.start() for m in re.finditer("HashAggregate", plan)]
        assert any(a > w for a in aggs), (name, plan)


def test_decay_score_single_aggregate_no_window(spark):
    """q_events_decay_score: one scan + a 1-row anchor joined back +
    one user aggregate — no windows, no Python."""
    plan = plan_of(spark, "q_events_decay_score")
    _assert_no_python(plan)
    assert "Window" not in plan, plan


def test_ppr_no_cartesian_no_python(spark):
    """q_graph_ppr: per-round equi-joins over the checkpointed edge
    list with 1-row dangling broadcasts — no cartesian, no Python in
    the final-round plan."""
    plan = plan_of(spark, "q_graph_ppr")
    _assert_no_python(plan)
    assert "CartesianProduct" not in plan, plan


def test_learning_curve_and_holdout_no_fact_windows(spark):
    """q_ml_learning_curve / q_sample_group_holdout: pure aggregate
    pipelines over enum/bucket-sized frames — no windows at all, no
    Python."""
    for name in ("q_ml_learning_curve", "q_sample_group_holdout"):
        plan = plan_of(spark, name)
        _assert_no_python(plan)
        assert "Window" not in plan, (name, plan)


def test_cramers_v_enum_grid_only(spark):
    """q_agg_cramers_v: one corpus aggregate, then the langs×sources
    enum grid — margin windows run over the grid (aggregate below
    every window), no Python."""
    import re

    plan = plan_of(spark, "q_agg_cramers_v")
    _assert_no_python(plan)
    w = plan.index("Window")
    aggs = [m.start() for m in re.finditer("HashAggregate", plan)]
    assert any(a > w for a in aggs), plan


def test_coverage_curve_window_on_vocab(spark):
    """q_text_coverage_curve: the rank/cumulative window runs over
    the vocabulary aggregate (never raw tokens) — aggregate below the
    window; no joins beyond the 1-row total; no Python."""
    import re

    plan = plan_of(spark, "q_text_coverage_curve")
    _assert_no_python(plan)
    w = plan.index("Window")
    aggs = [m.start() for m in re.finditer("HashAggregate", plan)]
    assert any(a > w for a in aggs), plan
    assert "CartesianProduct" not in plan, plan


def test_stl_strength_windows_on_hour_table(spark):
    """q_ts_stl_strength: the trend window runs per event_type over
    the bounded hourly aggregate; the variance stage is one moment
    aggregate — no fact-table windows, no Python."""
    import re

    plan = plan_of(spark, "q_ts_stl_strength")
    _assert_no_python(plan)
    w = plan.index("Window")
    aggs = [m.start() for m in re.finditer("HashAggregate", plan)]
    assert any(a > w for a in aggs), plan
    assert "hashpartitioning(event_type" in plan, plan


def test_ann_recall_audit_composes_registered_paths(spark):
    """q_llm_ann_recall_audit: both component searches keep their
    registered shapes inside the audit plan (query broadcasts, the
    corpus never shuffles before scoring) — WindowGroupLimit top-k on
    both branches, no cartesian beyond the tiny broadcast NL joins,
    no Python."""
    plan = plan_of(spark, "q_llm_ann_recall_audit")
    _assert_no_python(plan)
    assert "CartesianProduct" not in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_nelson_aalen_windows_on_duration_table(spark):
    """q_ml_nelson_aalen: both windows (reverse risk-set sum, running
    hazard) run over the bounded duration-grain value table —
    aggregates sit below every window; no Python."""
    import re

    plan = plan_of(spark, "q_ml_nelson_aalen")
    _assert_no_python(plan)
    w = plan.index("Window")
    aggs = [m.start() for m in re.finditer("HashAggregate", plan)]
    assert any(a > w for a in aggs), plan


def test_theil_sen_pairs_on_day_table_only(spark):
    """q_ts_theil_sen: the n² pair stage is a nested-loop join of the
    CALENDAR-BOUNDED day aggregate with itself (the q_ml_isotonic
    class) — the fact table contributes exactly one aggregate below
    it, never a cartesian product, no Python. r12: the registered
    builder materializes the slopes and selects the median with a
    distributed two-phase rank-k (pack_by_cumsum idiom), so the pair
    stage is gated on the factored helper and the REGISTERED plan is
    gated on the selection shape: the cum window + final aggregate
    run over a single range partition of the materialized slopes
    (Filter on pid over the ExistingRDD scan — NOT a global window
    over every pair), no Python anywhere."""
    import re

    from batchprocessor_spark.operators import timeseries as TS
    from batchprocessor_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    daily = (
        load_table(spark, SF_ORACLE, "orders")
        .groupBy(F.expr("CAST(o_orderkey % 7 AS BIGINT)").alias("day_no"))
        .agg(F.count(F.lit(1)).cast("long").alias("cents"))
    )
    pair_plan = TS._theil_sen_slopes(daily)._jdf.queryExecution().executedPlan().toString()
    _assert_no_python(pair_plan)
    assert "CartesianProduct" not in pair_plan, pair_plan
    assert "BroadcastNestedLoopJoin" in pair_plan, pair_plan

    plan = plan_of(spark, "q_ts_theil_sen")
    _assert_no_python(plan)
    assert "CartesianProduct" not in plan, plan
    assert "ExistingRDD" in plan, plan  # materialized slopes, computed once
    assert re.search(r"Filter \(pid#\d+ = \d+\)", plan), plan  # rank-k partition cut
    w = plan.index("Window")
    aggs = [m.start() for m in re.finditer("HashAggregate", plan)]
    assert any(a > w for a in aggs), plan


def test_rouge_l_pairs_spread_across_tasks(spark):
    """q_text_rouge_l_pairs: the CPU-bound LCS stage runs AFTER an
    explicit pair_id repartition (AQE's size-based coalescing must
    not fold the tiny-bytes/heavy-CPU rows back to one task), the
    partition count is DERIVED from the cluster (VERDICT r9 #2 —
    max(64, 2·defaultParallelism), not a hardcoded literal), and
    the kernel itself is pure catalyst — no Python."""
    plan = plan_of(spark, "q_text_rouge_l_pairs")
    _assert_no_python(plan)
    assert "hashpartitioning(pair_id" in plan, plan
    derived = max(64, 2 * spark.sparkContext.defaultParallelism)
    assert "REPARTITION_BY_NUM" in plan or str(derived) in plan.split(
        "hashpartitioning(pair_id"
    )[1][:80], plan


def test_goertzel_single_fold_no_window_over_facts(spark):
    """q_ts_goertzel_weekly: one day aggregate, one 1-row series
    fold — no joins beyond the grid densify, no windows except the
    day-grid sequencing, no Python."""
    plan = plan_of(spark, "q_ts_goertzel_weekly")
    _assert_no_python(plan)
