#!/usr/bin/env python3
"""ANN scaling probe: run the hyperplane-bucketed many-query top-k plan
(`ann_bucketed_topk`) on 1x/5x/10x synthetic scale-ups of the sf0.1
`embeddings` fixture (id-shifted unions — same vector distribution,
k-times the corpus; the 4-vector query batch stays fixed).

The point to measure: candidate generation is a bucket equi-join, so
per-query pair work is the matching-bucket population (~corpus/2^bits),
not the corpus — and wall time should track CANDIDATES, never the
brute-force corpus x queries product.  Evidence for SCALE.md's ANN
section, mirroring tools/dedup_probe.py for near-dup.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.operators.similarity import (
    ann_bucketed_candidates,
    ann_bucketed_topk_frame,
)
from cybersecurity_ioc_etl_spark.session import get_spark
from cybersecurity_ioc_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.1"
N_QUERIES = 4


def main() -> None:
    spark = get_spark("ann-probe")
    spark.sparkContext.setLogLevel("ERROR")
    e0 = load_table(spark, SF_DIR, "embeddings", fan_out=True).select(
        "vec_id", "embedding"
    )
    shift = (e0.agg(F.max("vec_id")).collect()[0][0] or 0) + 1

    for k in (1, 5, 10):
        e = e0
        for i in range(1, k):
            e = e.unionByName(e0.withColumn("vec_id", F.col("vec_id") + i * shift))
        n_vec = e.count()
        # candidate volume = rows surviving the bucket equi-join (the
        # work the exact-scoring stage actually pays)
        n_cand = ann_bucketed_candidates(e, N_QUERIES).count()
        topk = ann_bucketed_topk_frame(e, N_QUERIES, 10)
        topk.count()  # warm the plan shape
        best = 9e9
        for _ in range(2):
            t0 = time.perf_counter()
            topk.count()
            best = min(best, time.perf_counter() - t0)
        brute = (n_vec - N_QUERIES) * N_QUERIES
        print(
            f"k={k}: vectors={n_vec:,} candidates={n_cand:,} "
            f"(brute={brute:,}, ratio={n_cand / brute:.2f}) "
            f"wall={best:.2f}s vec/s={n_vec / best / 1e3:.0f}K"
        )
    spark.stop()


if __name__ == "__main__":
    main()
