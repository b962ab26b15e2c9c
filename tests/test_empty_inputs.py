"""Empty-slice behavior: operators must not crash — and must agree with
the oracle — when every input table has zero rows (a new source with no
documents yet, a fully-filtered partition, a quiet backfill hour).

`tools/empty_probe.py` sweeps ALL registered queries (run it when adding
an operator family); this test pins a representative per-family subset
plus every query that historically broke on empty input, so the suite
stays fast while the regressions stay locked:

- lineitem_integrity_audit: Spark SUM over empty is NULL vs COUNT's 0
- rollup/cube/grouping_sets: Spark's Expand emits zero rows on empty
  input where the SQL standard emits the () grand-total row
- stream_ann_topk: empty query stream wrote no parquet -> schema
  inference crash on the sink read
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.empty_probe import TABLES, build_empty_dir

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

# every query that ever crashed or diverged on empty input...
_REGRESSIONS = [
    # round-12: the stated flat-conservation identity must be NULL on
    # the empty graph (Spark computes NULL == NULL)
    "trade_louvain_two_level",
    "lineitem_integrity_audit",
    "rollup_region_nation_customers",
    "cube_status_priority",
    "grouping_sets_revenue",
    "stream_ann_topk",
]
# ...plus one representative per operator family
_FAMILIES = [
    "ioc_flagship",
    "pricing_summary",
    "top_orders",
    "region_nation_revenue",
    "customer_running_spend",
    "events_hourly",
    "events_sessionize",
    "doc_token_stats",
    "dedup_exact_groups",
    "minhash_band_pairs",
    "dedup_components",
    "knn_cosine_topk",
    "kmeans_lloyd_step",
    "pagerank_nations",
    "curation_pipeline",
    "eval_contamination",
    "deterministic_sample",
    "weighted_priority_sample",
    "dsir_importance_sample",
    "corpus_shard_shuffle",
    "semdedup_prune",
    "media_byte_profile",
    "doc_chunking",
    "bpe_merge_step",
    "cdc_snapshot_fold",
    "asof_click_before_purchase",
    # round-5 additions
    "dedup_keep_best_salted",
    "bpe_n_merges",
    "ivf_trained_topk",
    "ann_recall_audit",
    # round-6 additions: ivfpq_stored_topk CRASHED on empty input before
    # the empty-routing guard (IndexError on the collected probe cid) —
    # the stored-serve path and the restated sketch audits stay pinned
    "ivfpq_stored_topk",
    "stored_model_confusion",
    "approx_value_percentiles",
    "approx_distinct_parts",
    "ivfpq_upsert_topk",
    # round-8: compaction serves from the merged segment — same
    # empty-routing guard path as stored/upsert
    "ivfpq_compacted_topk",
    "countmin_token_audit",
    "bigram_lm_doc_scores",
    "bm25_more_like_this",
    "mixture_epoch_plan",
    # round-6 batch 2: prefix-filter join, filtered ANN (empty index →
    # empty routed cell), OHLC bars, KN scorer (empty model: every
    # context unseen), streaming sketch (no batches → empty fold)
    "ppjoin_doc_pairs",
    "ivf_filtered_topk",
    "events_ohlc_bars",
    "kneser_ney_doc_scores",
    "stream_countmin_merge",
    # round-6 batch 3
    "stream_ohlc_bars",
    "pareto_frontier_parts",
    "event_value_trend_ols",
    "hybrid_rrf_retrieval",
    # round-6 batch 4
    "cluster_safe_split",
    "events_twap",
    "viterbi_segment_stats",
    "event_value_mad_outliers",
    "classifier_margin_reliability",
    # round-6 batch 5
    "media_dhash_groups",
    "media_dhash_neardup_pairs",
    "boilerplate_segment_scrub",
    # round-7: sequence/interval/chi2/EWMA on empty events; KMV with no
    # tokens (empty sketch), empty JL pair set, DCG with no candidates,
    # layouts over zero files, Bloom over an empty dim, zero anchors
    "event_transition_matrix",
    "events_ewma_half_life",
    "user_active_intervals",
    "event_dow_residuals",
    "kmv_distinct_audit",
    "stream_kmv_merge",
    "jl_projection_audit",
    "retrieval_dcg_audit",
    "zorder_layout_audit",
    "bloom_semijoin_audit",
    "substring_anchor_scores",
    "audio_rms_profile",
    # round-7 batch 2
    "ioc_ip_prefix_rollup",
    "ioc_host_dga_scores",
    "token_cooccurrence_pmi",
    "rfm_customer_segments",
    # round-7 batch 3
    "event_value_quantile_normalized",
    "asof_next_purchase_tolerance",
    "stream_bloom_build",
    "scd2_temporal_join",
    "linear_attribution_credits",
    "orders_profile_drift",
    "event_type_stationary_dist",
    "revenue_gini_concentration",
    "k_anonymity_audit",
    "video_scene_cuts",
    "trade_kcore_membership",
    "l_diversity_audit",
    # round-7 batch 6: graph metrics on an empty edge set (assortativity
    # keeps its 1-row NULL-r shape), t-closeness/ACF over empty events
    "hits_hubs_authorities",
    "trade_degree_assortativity",
    "t_closeness_audit",
    "event_hourly_autocorrelation",
    # round-7 batch 7: per-row regex counts on empty/odd text; fertility
    # rollup over zero docs; RAKE over an empty token stream; typosquat
    # band join with an empty host census
    "doc_readability_scores",
    "lang_token_fertility",
    "rake_keyword_scores",
    "ioc_typosquat_candidates",
    # round-7 batch 8: digit census over zero orders; debounce lag over
    # empty/NULL-key events; greedy coverage with an empty incidence
    "benford_price_audit",
    "events_debounced_counts",
    "greedy_coverage_docs",
    # round-7 batch 9: CUSUM/KM/LTTB windows over empty or NULL-heavy
    # event series (KM legitimately emits zero event rows when every
    # user is censored)
    "events_cusum_alarms",
    "user_survival_curve",
    "events_lttb_downsample",
    # round-7 batch 10: HLL registers over empty/NULL/multi-byte token
    # universes (bitlen rank + shiftleft harmonic mean both engines)
    "hll_register_audit",
    "stream_hll_merge",
    # round-7 batch 11: LTV triangle over empty/NULL purchase sets
    "cohort_ltv_triangle",
    # round-7 batch 11b (deferred to the r8 window): basket pairs over an
    # empty order set; funnel windows over empty/NULL event streams
    "market_basket_lift",
    "funnel_three_step_strict",
    # session paths over empty/NULL streams (deferred with 11b)
    "session_path_counts",
    "trade_edge_churn",
    "sliding_24h_distinct_users",
    # round-13 families: blocked linkage over zero customers, t-digest
    # merge over zero events, KS/EMD censuses with no distribution,
    # Shapley over an empty probe/corpus split, Louvain loop on the
    # empty trade graph (probe-verified 42/42 in r13, pinned per
    # CLAUDE.md step 7)
    "customer_record_linkage",
    "tdigest_merge_audit",
    "events_ks_emd_drift",
    "knn_shapley_valuation",
    "trade_louvain_converged_level",
    # round-14 test-ladder additions: BH step-up over an EMPTY battery
    # (m = 0, k = 0, zero rows) and ANOVA with no groups (probe-verified
    # this round, pinned per CLAUDE.md step 7)
    "events_bh_fdr_battery",
    "event_value_anova",
    "event_value_kruskal_wallis",
    "stream_bh_fdr_battery",
    "event_cmh_weekend_purchase",
    "stream_cmh_weekend_purchase",
    "event_value_jonckheere",
    "image_patch_stats",
    "trade_closeness_centrality",
    "ql_dirichlet_retrieval",
    "neyman_stratified_sample",
    "purchase_rate_wilson",
    "stream_jonckheere",
    # round-14: CC + survivorship over the EMPTY match graph
    "linkage_golden_records",
    "incremental_linkage_maintenance",
]


@pytest.fixture(scope="module")
def empty_dir():
    return build_empty_dir()


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.17g}"
    return "NULL" if v is None else str(v)


@pytest.mark.parametrize("name", _REGRESSIONS + _FAMILIES)
def test_query_survives_and_matches_oracle_on_empty(spark, empty_dir, name):
    sdf = QUERIES[name](spark, empty_dir)
    srows = sorted(tuple(_norm(v) for v in r) for r in sdf.collect())
    if name not in ORACLES:
        return  # rows-only query: surviving without a crash is the contract
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{empty_dir}/{t}.parquet'"
            )
        drows = sorted(
            tuple(_norm(v) for v in row)
            for row in con.execute(ORACLES[name]).fetchall()
        )
    finally:
        con.close()
    assert srows == drows, f"{name}: spark={srows[:3]} oracle={drows[:3]}"
