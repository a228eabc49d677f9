"""The driver's correctness harness records rows for ~the first 50
``queries()`` entries in iteration order.  These tests pin the contract:
every SURVEY.md §2.2/§2.3/§2.4 query id must fall inside that window.
"""

from batchprocessor_spark.plans.registry import CONTRACT_ORDER, load_all

# SURVEY §2 contract ids by section (49 total; slot 50 is the headline
# extension q_join_multiway).
SEC_2_2 = {
    "q_scan_project", "q_filter_pred",
    "q_join_inner_broadcast", "q_join_inner_sortmerge", "q_join_left",
    "q_join_full", "q_join_semi", "q_join_anti", "q_join_cross",
    "q_join_theta_range", "q_join_asof",
    "q_agg_basic", "q_agg_distinct", "q_agg_approx", "q_agg_rollup",
    "q_agg_cube", "q_agg_gsets",
    "q_win_rank", "q_win_analytic", "q_win_frame",
    "q_sort_limit", "q_topk_per_group",
    "q_set_union_all", "q_set_union", "q_set_intersect", "q_set_except",
    "q_fn_string", "q_fn_date", "q_fn_math", "q_fn_array", "q_fn_json",
    "q_dedup_exact",
}
SEC_2_3 = {
    "q_stream_microbatch_ingest", "q_stream_time_flush", "q_win_tumbling",
    "q_win_sliding", "q_win_session", "q_stream_watermark_late",
    "q_stream_dedup_state", "q_stream_rate_limit", "q_stream_retry_dlq",
    "q_stream_graceful_stop",
}
SEC_2_4 = {
    "q_llm_dedup_minhash", "q_llm_simsearch_topk", "q_llm_text_stats",
    "q_llm_multimodal_cols", "q_llm_quality_filter", "q_udf_scalar",
    "q_udf_grouped",
}
CONTRACT = SEC_2_2 | SEC_2_3 | SEC_2_4


def test_contract_inventory_is_complete():
    assert len(SEC_2_2) == 32
    assert len(SEC_2_3) == 10
    assert len(SEC_2_4) == 7
    assert CONTRACT <= set(CONTRACT_ORDER)


def test_first_50_registry_entries_cover_every_contract_id():
    names = list(load_all())
    window = set(names[:50])
    missing = CONTRACT - window
    assert not missing, f"contract ids outside driver window: {sorted(missing)}"


def test_registry_order_starts_with_contract_order():
    names = list(load_all())
    assert tuple(names[: len(CONTRACT_ORDER)]) == CONTRACT_ORDER


# The EXACT driver window, frozen as literals (VERDICT r2 item 8): the
# driver's CORRECTNESS_r{N}.json rows stay comparable across rounds only
# if slots 1-50 never change. New queries must register AFTER slot 50;
# editing this tuple is an explicit, reviewed decision, not a side
# effect of touching CONTRACT_ORDER.
FROZEN_FIRST_50 = (
    "q_scan_project", "q_filter_pred", "q_join_inner_broadcast",
    "q_join_inner_sortmerge", "q_join_left", "q_join_full", "q_join_semi",
    "q_join_anti", "q_join_cross", "q_join_theta_range", "q_join_asof",
    "q_agg_basic", "q_agg_distinct", "q_agg_approx", "q_agg_rollup",
    "q_agg_cube", "q_agg_gsets", "q_win_rank", "q_win_analytic",
    "q_win_frame", "q_sort_limit", "q_topk_per_group", "q_set_union_all",
    "q_set_union", "q_set_intersect", "q_set_except", "q_fn_string",
    "q_fn_date", "q_fn_math", "q_fn_array", "q_fn_json", "q_dedup_exact",
    "q_llm_dedup_minhash", "q_llm_simsearch_topk", "q_llm_text_stats",
    "q_llm_multimodal_cols", "q_llm_quality_filter", "q_udf_scalar",
    "q_udf_grouped", "q_win_tumbling", "q_win_sliding", "q_win_session",
    "q_stream_microbatch_ingest", "q_stream_time_flush",
    "q_stream_watermark_late", "q_stream_dedup_state",
    "q_stream_rate_limit", "q_stream_retry_dlq", "q_stream_graceful_stop",
    "q_join_multiway",
)


def test_first_50_slots_frozen():
    assert tuple(load_all())[:50] == FROZEN_FIRST_50


def test_no_query_lost_by_reordering():
    from batchprocessor_spark.plans.registry import REGISTRY

    ordered = load_all()
    assert set(ordered) == set(REGISTRY)
    assert len(ordered) == len(REGISTRY)
