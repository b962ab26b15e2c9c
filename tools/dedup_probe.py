#!/usr/bin/env python3
"""Near-dup scaling probe: run the SimHash banded candidate-pair plan
(signature → 4-band pigeonhole bucket-join → exact Hamming check) on
1x/5x/10x synthetic scale-ups of the sf0.1 `documents` fixture
(id-shifted unions — same text distribution, k-times the corpus).

The point to measure: candidate generation is a bucket equi-join, so
pair work grows with the number of COLLIDING pairs, not n² — wall time
should grow roughly with output size, never quadratically in documents.
Evidence for BASELINE.md's dedup scaling section.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.operators.dedup import (
    _HAMMING_T,
    simhash_agg,
    simhash_banded_candidates,
)
from cybersecurity_ioc_etl_spark.session import get_spark
from cybersecurity_ioc_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.1"


def pairs(docs):
    sig = simhash_agg(docs, "doc_id", "text")
    cand = simhash_banded_candidates(sig)
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.filter(hamming <= _HAMMING_T)


def main() -> None:
    spark = get_spark("dedup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d0 = load_table(spark, SF_DIR, "documents", fan_out=True)
    shift = (d0.agg(F.max("doc_id")).collect()[0][0] or 0) + 1

    for k in (1, 5, 10):
        d = d0
        for i in range(1, k):
            d = d.unionByName(d0.withColumn("doc_id", F.col("doc_id") + i * shift))
        pairs(d).count()  # warm the plan shape
        best, rows = 9e9, 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = pairs(d).count()
            best = min(best, time.perf_counter() - t0)
        nd = d.count()
        print(
            f"k={k}: docs={nd:,} wall={best:.2f}s pairs={rows:,} "
            f"docs/s={nd/best/1e3:.0f}K"
        )
    spark.stop()


if __name__ == "__main__":
    main()
