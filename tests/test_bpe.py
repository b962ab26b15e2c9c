"""BPE tokenizer-training operator tests: merge semantics pinned on
hand-built vocabularies (the oracle checks the corpus result; these pin
the update rule itself, like test_graph does for PageRank)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.operators.bpe import (
    _to_seq,
    merge_top_pair,
    pair_counts,
)


def _seqs(spark, words):
    df = spark.createDataFrame(words, ["w", "f"])
    return df.select(_to_seq(F.col("w")).alias("seq"), "f")


def test_pair_counts_weighted_by_word_freq(spark):
    # 'ab'x3 + 'abc'x2 → (a,b)=5, (b,c)=2
    got = {
        (r.left_sym, r.right_sym): r.pair_count
        for r in pair_counts(_seqs(spark, [("ab", 3), ("abc", 2)])).collect()
    }
    assert got == {("a", "b"): 5, ("b", "c"): 2}


def test_merge_is_left_to_right_non_overlapping(spark):
    # 'aaaa': pairs (a,a)x3 → merge (a,a) left-to-right gives 'aa','aa'
    # (two symbols), NOT three overlapping merges
    merged, mp = merge_top_pair(_seqs(spark, [("aaaa", 1)]))
    assert mp.collect()[0].merged_pair == "a+a"
    got = {(r.left_sym, r.right_sym): r.pair_count for r in pair_counts(merged).collect()}
    assert got == {("aa", "aa"): 1}


def test_second_merge_builds_on_first(spark):
    # 'abab'x2: round 1 merges (a,b) → 'ab','ab'; round 2 merges
    # (ab,ab) → single symbol 'abab', no pairs remain
    merged1, mp1 = merge_top_pair(_seqs(spark, [("abab", 2)]))
    merged2, mp2 = merge_top_pair(merged1)
    assert mp1.collect()[0].merged_pair == "a+b"
    assert mp2.collect()[0].merged_pair == "ab+ab"
    assert pair_counts(merged2).count() == 0
