"""Segment-level dedup unit tests: the window arithmetic pinned on
hand-built docs (the oracle checks the corpus census; these pin the
segmentation rule itself)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.operators.dedup import _SEG_W, _segments


def _segs_of(spark, text):
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(_segments(F.col("text")).alias("s")).collect()[0].s


def test_segments_are_nonoverlapping_fixed_width(spark):
    words = [f"w{i}" for i in range(_SEG_W + 1)]  # 9 words -> 8 + 1
    segs = _segs_of(spark, " ".join(words))
    assert segs == [" ".join(words[:_SEG_W]), words[_SEG_W]]


def test_segments_exact_multiple_has_no_empty_tail(spark):
    words = [f"w{i}" for i in range(2 * _SEG_W)]
    segs = _segs_of(spark, " ".join(words))
    assert segs == [" ".join(words[:_SEG_W]), " ".join(words[_SEG_W:])]


def test_segments_empty_and_short_docs_do_not_crash(spark):
    assert _segs_of(spark, "") == [""]
    assert _segs_of(spark, "solo") == ["solo"]
