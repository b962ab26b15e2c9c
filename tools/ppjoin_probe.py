#!/usr/bin/env python3
"""PPJoin scaling probe: run the prefix-filtered exact set-similarity
join on 1x/3x/6x id-shifted unions of the sf0.1 `documents` fixture.

What to measure: candidates come only from shared PREFIX shingles, so
work grows with colliding-pair count, never docs².  Note the honest
wrinkle: id-shifted cloning makes every document an exact duplicate of
its k-1 copies, so TRUE pairs themselves grow ~k² — the receipt is that
wall tracks the emitted candidate/pair volume (the algorithm's actual
output), not the n² document-pair space, mirroring dedup_probe's
banded-LSH receipt.  Evidence for SCALE.md's set-similarity row.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.operators.dedup import ppjoin_pairs
from cybersecurity_ioc_etl_spark.session import get_spark
from cybersecurity_ioc_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("ppjoin-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d0 = load_table(spark, SF_DIR, "documents", fan_out=True).filter(
        F.col("text").isNotNull()
    )
    shift = (d0.agg(F.max("doc_id")).collect()[0][0] or 0) + 1

    prev = None
    for k in (1, 3, 6):
        d = d0
        for i in range(1, k):
            d = d.unionByName(d0.withColumn("doc_id", F.col("doc_id") + i * shift))
        ppjoin_pairs(d).count()  # warm the plan shape
        best, rows = 9e9, 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = ppjoin_pairs(d).count()
            best = min(best, time.perf_counter() - t0)
        nd = d.count()
        ratio = "" if prev is None else (
            f" wall x{best / prev[0]:.1f} pairs x{rows / prev[1]:.1f}"
            f" docs2 x{(nd / prev[2]) ** 2:.0f}"
        )
        print(f"k={k}: docs={nd:,} wall={best:.2f}s pairs={rows:,}{ratio}")
        prev = (best, rows, nd)
    spark.stop()


if __name__ == "__main__":
    main()
