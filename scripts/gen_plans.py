#!/usr/bin/env python
"""Generate PLANS.md: `explain("formatted")` output for the headline
queries at sf0.1 — the physical-plan evidence behind the scale claims
(pushdown, pruning, broadcast choice, group-limits, codegen spans).
Run: PYTHONPATH=. python scripts/gen_plans.py > PLANS.md
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

from batchprocessor_spark.plans.registry import load_all
from batchprocessor_spark.session import get_spark
from scripts.fixture_layout import ensure_multifile

HEADLINE = [
    "q_agg_basic",
    "q_filter_pred",
    "q_scan_project",
    "q_join_inner_broadcast",
    "q_join_inner_sortmerge",
    "q_join_asof",
    "q_join_multiway",
    "q_topk_per_group",
    "q_sort_limit",
    "q_llm_dedup_minhash",
    "q_llm_simsearch_topk",
    "q_llm_simsearch_neardup_lsh",
    "q_llm_pack_sequences",
    "q_llm_tfidf_topterms",
    "q_sample_stratified",
    "q_udf_scalar",
    "q_subq_correlated",
    # Round-3 second-session operators with distinctive plan shapes:
    "q_join_interval_overlap",
    "q_ts_downsample_m4",
    "q_llm_lm_perplexity",
    "q_sim_spatial_grid_join",
    "q_win_rolling_median",
    "q_subq_lateral",
    # Round-4 third-session operators with distinctive plan shapes:
    "q_agg_bitmap_distinct",
    "q_sketch_countmin",
    "q_llm_tfcos_pairs",
    "q_win_ignore_nulls",
    "q_ml_decision_stump",
    # Round-5 operators with distinctive plan shapes:
    "q_ts_resample_ohlc",
    "q_events_markov_transitions",
    "q_ab_welch_ttest",
    "q_text_collocation_lift",
    "q_agg_decile_summary",
    "q_graph_modularity",
    # Round-5 session-3 heavy operators (the ones VERDICT r5 flagged as
    # newest-without-committed-plan-evidence):
    "q_llm_dedup_minhash_banded",
    "q_llm_simsearch_ivf",
    "q_llm_multimodal_wav",
    "q_ts_dtw",
    "q_ml_assoc_rules",
    # Round-7 operators with distinctive plan shapes:
    "q_llm_winnowing",
    "q_llm_winnowing_pairs",
    "q_events_rolling_active_users",
    "q_merge_snapshot_diff",
    "q_funnel_time_window",
    "q_ts_holt",
    # Round-8 operators with distinctive plan shapes:
    "q_llm_simsearch_pq",
    "q_llm_multimodal_dhash",
    "q_emb_random_projection",
    "q_text_lexical_richness",
    "q_llm_gopher_rules",
    "q_dedup_sorted_neighborhood",
    "q_ml_isotonic",
    "q_ab_sprt",
    "q_emb_isotropy",
    "q_text_script_mix",
    "q_graph_bipartite_projection",
    "q_ts_holt_winters",
    "q_ml_kaplan_meier",
    "q_dedup_fellegi_sunter",
    "q_ab_bootstrap_ci",
    "q_llm_lang_confusion",
    "q_events_lifecycle",
    "q_ts_page_hinkley",
    "q_subq_quantified",
    "q_layout_sorted_skipping",
    "q_graph_hits",
    "q_llm_dedup_span_removal",
    "q_dq_cross_table_rules",
    "q_ts_croston",
    # Round-9 second-session operators with distinctive plan shapes:
    "q_ml_kruskal_wallis",
    "q_ml_tukey_hsd",
    "q_ts_theta_forecast",
    "q_text_source_divergence",
    "q_dedup_phonetic_block",
    "q_graph_clustering_coeff",
    "q_agg_theil_between",
    "q_ts_ljung_box",
    "q_llm_multimodal_ahash",
    "q_llm_keyword_rake",
    "q_text_burrows_delta",
    "q_graph_closeness_bfs",
    "q_ab_effect_size",
    "q_ml_f1_threshold",
    "q_events_decay_score",
    "q_ts_permutation_entropy",
    "q_graph_ppr",
    "q_ml_learning_curve",
    "q_sample_group_holdout",
    "q_agg_cramers_v",
    "q_text_coverage_curve",
    "q_ts_stl_strength",
    "q_llm_ann_recall_audit",
    "q_ml_nelson_aalen",
    "q_ts_theil_sen",
    "q_text_rouge_l_pairs",
    "q_ts_goertzel_weekly",
]


# Builders that cache an intermediate and return a materialize() of
# the (small) verified output — the executed plan of the RETURNED
# frame is just "Scan ExistingRDD", which documents nothing. For
# those, dump the PRE-checkpoint composition instead: the exact plan
# the builder executes, assembled from the same helpers the builder
# calls (and gated live in tests/test_plans.py).
def _twin_minhash(band_rows: int, num_bands: int):
    def twin(spark, sf_dir):
        from batchprocessor_spark.operators.dedup import (
            _verify_candidates,
            minhash_candidates,
            shingle_sets,
        )
        from batchprocessor_spark.sources.catalog import load_table

        sets = shingle_sets(
            load_table(spark, sf_dir, "documents"), hashed=True
        ).cache()
        return _verify_candidates(
            sets, minhash_candidates(sets, band_rows, num_bands)
        )

    return twin


def _twin_winnowing_pairs(spark, sf_dir):
    from batchprocessor_spark.functions.text import (
        winnowing_distinct_fingerprints,
        winnowing_pair_matches,
    )
    from batchprocessor_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return winnowing_pair_matches(winnowing_distinct_fingerprints(docs).cache())


def _twin_pq(spark, sf_dir):
    # Plan shape is codebook-value-independent: a synthetic codebook
    # gives the same executed shape as the trained one without the
    # collect rounds (the live gate in tests/test_plans.py uses the
    # identical composition).
    from batchprocessor_spark.operators.similarity import (
        _PQ_K,
        _PQ_M,
        _PQ_SUBD,
        _pq_adc_rank,
        _pq_cents_df,
        _pq_subvectors,
    )

    sub = _pq_subvectors(spark, sf_dir).cache()
    cdf = _pq_cents_df(
        spark,
        [
            (s, c, [s + c + j for j in range(_PQ_SUBD)])
            for s in range(_PQ_M)
            for c in range(_PQ_K)
        ],
    )
    return _pq_adc_rank(sub, cdf)


def _pre_checkpoint_twins():
    from batchprocessor_spark.operators import dedup

    return {
        "q_llm_simsearch_pq": _twin_pq,
        "q_llm_dedup_minhash": _twin_minhash(1, dedup._NUM_HASHES),
        "q_llm_dedup_minhash_banded": _twin_minhash(
            dedup._BAND_ROWS, dedup._NUM_BANDS
        ),
        "q_llm_winnowing_pairs": _twin_winnowing_pairs,
    }


def main() -> None:
    # Production-shaped lane (VERDICT r7 #3): plans are dumped against
    # the directory-per-table fixture mirror under the 128m default,
    # so committed scan/exchange shapes match what a cluster runs.
    sf_dir = ensure_multifile(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    registry = load_all()
    spark = get_spark("plan-dump", cpus=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    print("# PLANS — formatted physical plans (headline queries, sf0.1)")
    print()
    print("Generated by scripts/gen_plans.py. What to look for: "
          "`PushedFilters`/`ReadSchema` on scans (pushdown + pruning), "
          "`BroadcastHashJoin` for dim joins, `WindowGroupLimit` for "
          "top-k, `TakeOrderedAndProject` for sort+limit, no join "
          "operator at all in the as-of query, and `(N)` codegen "
          "stage markers.")
    twins = _pre_checkpoint_twins()
    for name in HEADLINE:
        twin = twins.get(name)
        df = (twin or registry[name].builder)(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        print(f"\n## {name}\n")
        if twin is not None:
            print(
                "(pre-materialization composition: the registered "
                "builder returns this exact plan through the "
                "cluster-safe `session.materialize()` barrier — the "
                "cached relation is scoped cache → materialize → "
                "unpersist, see the builder docstring)\n"
            )
        print("```")
        print(buf.getvalue().rstrip())
        print("```")
        if twin is not None:
            spark.catalog.clearCache()  # twin caches are plan-only
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
