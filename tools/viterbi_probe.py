#!/usr/bin/env python3
"""Viterbi segmentation scaling probe: run the DP on 1x/5x/10x
id-shifted unions of the sf0.1 `documents` fixture.

The law to pin: the DP state is (distinct words x positions) and its
edges (distinct words x len x 4 pieces) — both bounded by the corpus
VOCABULARY.  Cloning the corpus k x multiplies tokens but leaves the
vocabulary identical, so the only k-sensitive stage is the initial
word-frequency census; the relax rounds' wall should stay flat.
Evidence for SCALE.md's tokenizer section.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.operators.text_queries import viterbi_segment
from cybersecurity_ioc_etl_spark.session import get_spark
from cybersecurity_ioc_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("viterbi-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d0 = load_table(spark, SF_DIR, "documents", fan_out=True).filter(
        F.col("text").isNotNull()
    )
    shift = (d0.agg(F.max("doc_id")).collect()[0][0] or 0) + 1

    for k in (1, 5, 10):
        d = d0
        for i in range(1, k):
            d = d.unionByName(d0.withColumn("doc_id", F.col("doc_id") + i * shift))
        viterbi_segment(d).collect()  # warm
        best = 9e9
        for _ in range(2):
            t0 = time.perf_counter()
            rows = viterbi_segment(d).collect()
            best = min(best, time.perf_counter() - t0)
        nd = d.count()
        print(f"k={k}: docs={nd:,} wall={best:.2f}s top_words={len(rows)}")
    spark.stop()


if __name__ == "__main__":
    main()
