"""NULL-slice behavior: operators must agree with the oracle when ~3%
of rows carry NULL payloads (missing text/lang/embedding/measure — the
normal state of a web-scale feed).

`tools/null_probe.py` sweeps ALL registered queries; this test pins the
ten that historically crashed or diverged, so the suite stays fast while
the regressions stay locked:

- enrichment / multimodal mapInPandas stages: None crossed the Python
  boundary (None.encode, bytes(None), len(None))
- first_last_order_price: DuckDB arg_min ignores NULL values, Spark
  min_by returned them
- knn/vector_norms/int8_quantize: oracle's unnest drops NULL embeddings,
  Spark's array fold kept NULL rows
- doc_repetition_scores: greatest() skipping a NULL size manufactured a
  phantom [0, -1] sequence (two fake trigrams)
- doc_bpe_token_estimate / minhash_signatures / frame_dedup_profile:
  NULL-text rows kept on one side only
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.null_probe import TABLES, build_null_dir

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

_REGRESSIONS = [
    # round-12: graph-serve node directory must count exploded vec_ids
    # (NULL-embedding rows are not nodes) or n_visited drifts by one
    "nn_graph_serve_topk",
    "enrichment_scraped_iocs",
    "media_byte_profile",
    "frame_dedup_profile",
    "first_last_order_price",
    "knn_cosine_topk",
    "vector_norms",
    "embedding_int8_quantize",
    "doc_repetition_scores",
    "doc_bpe_token_estimate",
    "minhash_signatures",
    # round-5 additions: salted keeper (null text), recall audit
    # (null embeddings drop a query's vectors on both sides)
    "dedup_keep_best_salted",
    "ann_recall_audit",
    # exact percentiles: NULL value must be filtered, not ranked
    "event_value_percentiles",
    # aging merge: NULL source must not count toward n_sources
    "stream_ioc_aging",
    # round-6 additions: the sketch bound-audits must filter/ignore NULL
    # values exactly as their exact sides do; the stored-model scorer
    # must survive null text rows
    "approx_value_percentiles",
    "approx_distinct_parts",
    "stored_model_confusion",
    # round-6 batch 2: NULL text drops out of the shingle/token/sketch
    # paths identically on both engines; NULL ts/value rows are excluded
    # from OHLC bars (the window NULL-ordering rule)
    "ppjoin_doc_pairs",
    "events_ohlc_bars",
    "kneser_ney_doc_scores",
    "stream_countmin_merge",
    # round-6 batch 3: NULL ts/value/size/price rows drop identically
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
    # round-6 batch 5: NULL media rows drop identically
    "media_dhash_groups",
    "media_dhash_neardup_pairs",
    "boilerplate_segment_scrub",
    # round-7: NULL ts/user/type/value/text/source rows must be filtered
    # on BOTH sides (window NULL-ordering rule) — pinned for the new
    # sequence/interval/sketch/layout operators
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
    # round-7 batch 6: NULL ts/type rows filtered identically upstream of
    # the QI census and the hourly spine; graph edges carry no NULL keys
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
    # round-9: the delta-join split must be TOTAL — a NULL o_orderdate
    # satisfied neither `>= cut` nor its negation and vanished from
    # every delta leg while the full recompute kept it (null_probe
    # caught the live bug; fixed with coalesce(pred, false))
    "incremental_join_maintenance",
    # round-9: NULL ts rows filtered identically upstream of the
    # changepoint spine / session stream; NULL value rows excluded from
    # the quantile summaries on both sides
    "events_changepoint_tree",
    "quantile_summary_merge",
    "stream_session_append",
    # round-11: a group whose every surviving price is NULL has
    # MIN/MAX NULL on both sides — the consistency receipt must use
    # null-safe equality or it emits NULL where the oracle states TRUE
    # (null_probe caught the live bug)
    "minmax_delete_repair",
    # round-13 families: NULL name/balance fields through the agreement
    # vectors, NULL values excluded from the t-digest / KS-EMD censuses
    # on both sides, NULL-embedding rows through the Shapley ranking,
    # Louvain over NULL-keyed trade edges (probe-verified 42/42 in r13,
    # pinned per CLAUDE.md step 7)
    "customer_record_linkage",
    "tdigest_merge_audit",
    "events_ks_emd_drift",
    "knn_shapley_valuation",
    "trade_louvain_converged_level",
    # round-14 test-ladder additions: NULL ts/type/value rows must be
    # excluded from the moment censuses identically on both sides
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
    # round-14: NULL-keyed/NULL-field records through blocking + CC
    "linkage_golden_records",
    "incremental_linkage_maintenance",
]


@pytest.fixture(scope="module")
def null_dir():
    return build_null_dir()


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.17g}"
    return "NULL" if v is None else str(v)


@pytest.mark.parametrize("name", _REGRESSIONS)
def test_query_matches_oracle_with_null_rows(spark, null_dir, name):
    sdf = QUERIES[name](spark, null_dir)
    cols = sorted(sdf.columns)
    srows = sorted(
        tuple(_norm(r[c]) for c in cols) for r in sdf.collect()
    )
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{null_dir}/{t}.parquet'"
            )
        res = con.execute(ORACLES[name])
        dcols = [d[0] for d in res.description]
        drows = sorted(
            tuple(_norm(row[dcols.index(c)]) for c in cols)
            for row in res.fetchall()
        )
    finally:
        con.close()
    assert srows == drows, f"{name}: spark={srows[:3]} oracle={drows[:3]}"
