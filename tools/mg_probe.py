#!/usr/bin/env python3
"""Misra-Gries heavy-hitters scaling probe: build the canonical MG
summary (capacity m=16) on 1x/5x/10x id-shifted unions of the sf0.1
`documents` corpus and audit the error law at each scale.

The laws to measure (Agarwal et al. 2013):
- the summary stays ≤ m rows at EVERY corpus size — state is constant,
  which is the whole point of the sketch;
- the error bound d (the (m+1)-th largest count) grows ~linearly with
  the token stream N (d ≤ N/(m+1)) — cloning the corpus k× scales both
  N and d by k, so the RELATIVE error of every reported heavy hitter
  is scale-invariant;
- wall grows ~linearly in k (one map-side-combined token count + a
  rank-(m+1) probe), never with the summary.

Evidence for SCALE.md's sketch section.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.operators.text_queries import (
    _MG_M,
    mg_partial,
    mg_tokens,
)
from cybersecurity_ioc_etl_spark.session import get_spark
from cybersecurity_ioc_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("mg-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d0 = load_table(spark, SF_DIR, "documents").filter(
        F.col("text").isNotNull()
    )
    shift = (d0.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
    for k in (1, 5, 10):
        d = d0
        for i in range(1, k):
            d = d.unionByName(
                d0.withColumn("doc_id", F.col("doc_id") + i * shift)
            )
        d = d.localCheckpoint(eager=True)
        toks = mg_tokens(d)
        summ = mg_partial(toks)
        summ.count()  # warm
        best = 9e9
        for _ in range(2):
            t0 = time.perf_counter()
            rows = summ.collect()
            best = min(best, time.perf_counter() - t0)
        n_tokens = toks.count()
        dval = rows[0]["d"] if rows else 0
        print(
            f"k={k}: tokens={n_tokens:,} summary_rows={len(rows)}"
            f" (m={_MG_M}) d={dval:,}"
            f" d_over_bound={dval * (_MG_M + 1) / max(1, n_tokens):.2f}"
            f" wall={best:.2f}s"
        )
        d.unpersist(True)
    spark.stop()


if __name__ == "__main__":
    main()
