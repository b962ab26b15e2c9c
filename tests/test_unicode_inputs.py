"""Unicode-text behavior: the ASCII fixtures never exercise Java-regex
vs RE2 or JVM vs utf8proc string semantics, so `tools/unicode_probe.py`
rewrites ~3% of documents/part text to unicode-rich payloads (NBSP and
em-space whitespace, casefold specials ß/Σ/İ, combining marks,
whitespace-free CJK, emoji+ZWJ, RTL) and diffs every query against its
oracle.  This test pins the regressions it found:

- content fingerprints used Unicode lower(), which DIVERGES between
  engines (Java: final-sigma 'ς', dotted 'i̇'; utf8proc: neither) —
  now an ASCII-only translate casefold (dedup._FP_SQL)
- doc_repetition_scores' trigram sequence(0, size-3) was a DESCENDING
  [0, -1, ...] for docs under 3 tokens (whitespace-free CJK text is ONE
  token), crashing under ANSI array indexing — now an explicit empty
  list
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.unicode_probe import TABLES, build_unicode_dir

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

_REGRESSIONS = [
    "doc_fingerprint",
    "dedup_exact_groups",
    "dedup_keep_first",
    "dedup_keep_best",
    "doc_repetition_scores",
    # sampled breadth: tokenization, shingling, regex, classifier
    "doc_token_stats",
    "doc_bpe_token_estimate",
    "minhash_signatures",
    "doc_pii_scrub",
    "lang_classifier_confusion",
    "curation_pipeline",
    # round-5 additions: salted keeper folds ASCII-only like the window
    # variant; n-merge BPE must treat multi-byte symbols atomically
    "dedup_keep_best_salted",
    "bpe_n_merges",
    # round-6 addition: stored-model round-trip tokenizes with the same
    # ASCII casefold as the in-lineage classifier
    "stored_model_confusion",
    # round-6 batch 2: shingle prefixes keep multi-byte text intact
    # (no fold — conservative non-merge); the KN tokenizer and the
    # streaming sketch fold ASCII-only like every other tokenizer
    "ppjoin_doc_pairs",
    "kneser_ney_doc_scores",
    "stream_countmin_merge",
    "hybrid_rrf_retrieval",
    # round-6 batch 4: multi-byte words segment as opaque byte pieces
    "cluster_safe_split",
    "viterbi_segment_stats",
    "classifier_margin_reliability",
    # round-6 batch 5: non-ASCII docs excluded identically both sides
    "media_dhash_neardup_pairs",
    "boilerplate_segment_scrub",
    # round-7: char-based length/substring semantics must agree for the
    # anchor windows; md5 of multi-byte tokens must hash identically in
    # the KMV sketch
    "substring_anchor_scores",
    "kmv_distinct_audit",
    "stream_kmv_merge",
    "audio_rms_profile",
    # round-7 batch 2: unicode hosts/tokens hash + case-fold identically
    "ioc_host_dga_scores",
    "token_cooccurrence_pmi",
    "video_scene_cuts",
    # round-7 batch 7: vowel-group/sentence regexes stay ASCII-classed on
    # multi-byte text; fertility length() counts codepoints identically;
    # RAKE tokens and levenshtein hosts compare codepoint-wise
    "doc_readability_scores",
    "lang_token_fertility",
    "rake_keyword_scores",
    "ioc_typosquat_candidates",
    # round-7 batch 8: bigram coverage keys on multi-byte tokens
    "greedy_coverage_docs",
    # round-7 batch 10: md5 of multi-byte tokens drives identical registers
    "hll_register_audit",
    "stream_hll_merge",
    # deferred 11b: multi-byte event types survive path assembly
    "session_path_counts",
    # round-13 families: multi-byte customer names through the linkage
    # agreement vectors (md5 blocking + exact-match bits must agree
    # byte-wise across engines); multi-byte event types as KS/EMD and
    # t-digest group keys (probe-verified in r13, pinned per CLAUDE.md
    # step 7)
    "customer_record_linkage",
    "events_ks_emd_drift",
    "tdigest_merge_audit",
    # round-14: multi-byte event types as battery/ANOVA group keys
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
    # round-14: multi-byte names through the length-based survivorship
    "linkage_golden_records",
    "incremental_linkage_maintenance",
]


@pytest.fixture(scope="module")
def unicode_dir():
    return build_unicode_dir()


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.17g}"
    return "NULL" if v is None else str(v)


@pytest.mark.parametrize("name", _REGRESSIONS)
def test_query_matches_oracle_on_unicode_text(spark, unicode_dir, name):
    sdf = QUERIES[name](spark, unicode_dir)
    cols = sorted(sdf.columns)
    srows = sorted(tuple(_norm(r[c]) for c in cols) for r in sdf.collect())
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{unicode_dir}/{t}.parquet'"
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
